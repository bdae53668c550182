"""Display-set assembly: the segment state machine (SURVEY.md §2.3).

Replicates ParseBluRaySup's single pass + post passes
(/root/reference/src/PgsToSrt/BluRaySup/BluRaySupParserImageSharp.cs:259-531)
including its aliasing/ordering quirks:

  * PDS/ODS/WDS are ignored until the first PCS opens a composition.
  * ``palette_update`` on the open PCS makes the next PDS *replace* the last
    palette info for its id (:292-296) and suppresses ODS capture (:309).
  * EpochStart clears both stores (:336-341).
  * ``force_first`` makes the next ODS a first fragment after PCS/END
    (:225, 323, 331, 365).
  * CompletePcs stores the *live* fragment list per object id (:183), so
    later continuations/reassembly are visible to completed compositions.
  * Per-segment index errors are swallowed (:380-383).
  * End-time backfill (:333-334, 391-396), empty-composition drop (:398),
    in-place fragment reassembly (:399-422).

Matroska packet mode (:26-72) carries ``last_palettes``/``bitmap_objects``
across packets and overrides times from container timestamps.
"""

from __future__ import annotations

from .model import (
    SEG_END,
    SEG_ODS,
    SEG_PCS,
    SEG_PDS,
    SEG_WDS,
    CompositionState,
    OdsData,
    PaletteInfo,
    PcsData,
    SupSegment,
)
from .segments import (
    contains_end_segment,
    parse_ods,
    parse_pcs,
    parse_pds,
    split_segments_mkv,
    split_segments_sup,
)

__all__ = ["assemble_display_sets", "assemble_sup", "assemble_mkv_packets"]


def _complete_pcs(
    pcs: PcsData,
    bitmap_objects: dict[int, list[OdsData]],
    palettes: dict[int, list[PaletteInfo]],
) -> bool:
    """CompletePcs (BluRaySupParserImageSharp.cs:164-189).

    Valid iff the palette id resolves and >=1 object id has bitmap data
    (zero-object compositions are trivially valid).  Attaches a *copy* of
    the palette list but *references* to the live fragment lists.
    """
    if pcs.pcs_objects is None:
        return False
    if len(pcs.pcs_objects) == 0:
        return True
    if pcs.palette_id not in palettes:
        return False
    pcs.palette_infos = list(palettes[pcs.palette_id])
    pcs.bitmap_objects = []
    found = False
    for obj in pcs.pcs_objects:
        if obj.object_id in bitmap_objects:
            pcs.bitmap_objects.append(bitmap_objects[obj.object_id])
            found = True
    return found


def assemble_display_sets(
    segments: list[SupSegment],
    last_palettes: dict[int, list[PaletteInfo]],
    bitmap_objects: dict[int, list[OdsData]],
) -> list[PcsData]:
    """One pass over segments -> completed display sets, pre-merge.

    Mirrors the dispatch loop (BluRaySupParserImageSharp.cs:259-422) up to
    and including fragment reassembly; the duplicate merge (A6) is applied
    separately by merge.apply_duplicate_merge so callers can stage it.
    Mutates ``last_palettes``/``bitmap_objects`` for cross-packet carry
    (:523-528).
    """
    palettes: dict[int, list[PaletteInfo]] = {}
    force_first = True
    out: list[PcsData] = []
    open_pcs: PcsData | None = None

    for seg in segments:
        try:
            if seg.type == SEG_PDS:  # case 20 (:286-303)
                if open_pcs is not None:
                    pid, _ver, info = parse_pds(seg)
                    if info is not None:
                        if pid not in palettes:
                            palettes[pid] = []
                        elif open_pcs.palette_update:
                            palettes[pid].pop()
                        palettes[pid].append(info)
            elif seg.type == SEG_ODS:  # case 21 (:304-327)
                if open_pcs is not None:
                    ods = parse_ods(seg, force_first)
                    if not open_pcs.palette_update:
                        if ods.is_first:
                            bitmap_objects[ods.object_id] = [ods]
                        elif ods.object_id in bitmap_objects:
                            bitmap_objects[ods.object_id].append(ods)
                    force_first = False
            elif seg.type == SEG_PCS:  # case 22 (:328-343)
                if open_pcs is not None and _complete_pcs(
                    open_pcs, bitmap_objects, palettes if palettes else last_palettes
                ):
                    out.append(open_pcs)
                force_first = True
                picture = parse_pcs(seg)
                if picture.start > 0 and out and out[-1].end == 0:
                    out[-1].end = picture.start  # :333-334
                open_pcs = picture
                if open_pcs.state == CompositionState.EPOCH_START:
                    bitmap_objects.clear()
                    palettes.clear()
            elif seg.type == SEG_WDS:  # case 23: log-only (:344-363)
                pass
            elif seg.type == SEG_END:  # case 128 (:364-374)
                force_first = True
                if open_pcs is not None:
                    if _complete_pcs(
                        open_pcs, bitmap_objects, palettes if palettes else last_palettes
                    ):
                        out.append(open_pcs)
                    open_pcs = None
        except IndexError:
            # per-segment isolation (:380-383); callers may count these
            pass

    # EOF flush (:389-390)
    if open_pcs is not None and _complete_pcs(
        open_pcs, bitmap_objects, palettes if palettes else last_palettes
    ):
        out.append(open_pcs)

    # end-time backfill from the next composition (:391-396)
    for i in range(1, len(out)):
        if out[i - 1].end == 0:
            out[i - 1].end = out[i].start

    # drop zero-object compositions (:398)
    out = [p for p in out if p.pcs_objects is not None and len(p.pcs_objects) > 0]

    # fragment reassembly, in place on the shared lists (:399-422)
    for pcs in out:
        for frag_list in pcs.bitmap_objects:
            if len(frag_list) > 1:
                frag_list[0].data = b"".join(f.data for f in frag_list)
                del frag_list[1:]

    # cross-packet palette carry (:523-528)
    if palettes:
        last_palettes.clear()
        last_palettes.update(palettes)
    return out


def assemble_sup(data: bytes) -> list[PcsData]:
    """Standalone .sup byte stream -> display sets (pre-merge).

    ParseBluRaySup(fileName, ...) entry (BluRaySupParserImageSharp.cs:18-24).
    """
    return assemble_display_sets(split_segments_sup(data), {}, {})


def assemble_mkv_packets(
    packets: list[tuple[int, int, bytes]],
) -> list[PcsData]:
    """Matroska-style packet sequence -> display sets (pre-merge).

    ``packets`` = [(start_ms, end_ms, segment_bytes)] with 3-byte headers.
    Mirrors ParseBluRaySupFromMatroska (BluRaySupParserImageSharp.cs:26-72):
    packets accumulate until one contains an END segment; container times
    override PTS as (start_ms - 1) * 90; the overlap fix clips the previous
    end to current start - 1; trailing zero-duration sets are patched from
    the next packet start and reverted when the gap exceeds 1,000,000 ticks.
    """
    out: list[PcsData] = []
    last_palettes: dict[int, list[PaletteInfo]] = {}
    bitmap_objects: dict[int, list[OdsData]] = {}
    pending = bytearray()

    for pkt_idx, (start_ms, _end_ms, data) in enumerate(packets):
        if len(data) > 2:
            pending.extend(data)
            if contains_end_segment(data):
                if out and out[-1].start == out[-1].end:
                    out[-1].end = int((start_ms - 1) * 90.0)  # :44-45
                for pcs in assemble_display_sets(
                    split_segments_mkv(bytes(pending)), last_palettes, bitmap_objects
                ):
                    pcs.start = int((packets[pkt_idx][0] - 1) * 90.0)  # :49
                    pcs.end = int((packets[pkt_idx][1] - 1) * 90.0)  # :50
                    out.append(pcs)
                    # overlap fix indexes the packet list by *cue count*,
                    # exactly as the reference does (:52-53)
                    if len(out) > 1 and len(out) - 1 < len(packets):
                        prev_pkt = packets[len(out) - 2]
                        cur_pkt = packets[len(out) - 1]
                        if prev_pkt[1] > cur_pkt[0]:
                            out[-2].end = out[-1].start - 1
                pending = bytearray()
        elif out:  # short packet: tail patch (:59-68)
            last = out[-1]
            if last.start == last.end:
                last.end = int((start_ms - 1) * 90.0)
                if last.end - last.start > 1_000_000:
                    last.end = last.start
    return out
