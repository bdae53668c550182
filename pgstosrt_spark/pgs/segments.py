"""Segment splitting and per-type field projection (SURVEY.md §2.2).

Semantics follow /root/reference/src/PgsToSrt/BluRaySup/
BluRaySupParserImageSharp.cs (cited per function).  The walk is per-segment
(never per-pixel/per-byte Python in a hot loop); payload bytes are sliced
lazily from one backing buffer.
"""

from __future__ import annotations

from .model import (
    CompositionState,
    OdsData,
    PaletteInfo,
    PcsData,
    PcsObject,
    SupSegment,
)

__all__ = [
    "split_segments_sup",
    "split_segments_mkv",
    "contains_end_segment",
    "parse_pcs",
    "parse_pds",
    "parse_ods",
    "composition_state",
]


def _be16(b: bytes, i: int) -> int:
    # BigEndianInt16 (BluRaySupParserImageSharp.cs:592-595): whole-buffer
    # length check (not slice bounds) — a <2-byte buffer reads as 0.
    if len(b) < 2:
        return 0
    return b[i + 1] | (b[i] << 8)


def _be32(b: bytes, i: int) -> int:
    # BigEndianInt32 (BluRaySupParserImageSharp.cs:597-600)
    if len(b) < 4:
        return 0
    return b[i + 3] + (b[i + 2] << 8) + (b[i + 1] << 16) + (b[i] << 24)


def split_segments_sup(data: bytes) -> list[SupSegment]:
    """Walk 13-byte SUP headers: "PG" magic, BE32 PTS, type, BE16 size.

    ParseSegmentHeader (BluRaySupParserImageSharp.cs:87-98) + the read loop
    (:274-282): a non-"PG" header yields type=0/size=0/pts=0 (skipped later
    by the dispatch switch); a truncated payload ends the walk (:282, 377).
    """
    out: list[SupSegment] = []
    pos = 0
    n = len(data)
    while pos + 13 <= n:
        if data[pos] == 0x50 and data[pos + 1] == 0x47:  # "PG"
            pts = _be32(data, pos + 2)
            typ = data[pos + 10]
            size = _be16(data, pos + 11)
        else:
            pts, typ, size = 0, 0, 0
        payload_end = pos + 13 + size
        if payload_end > n:
            break  # short read -> stop (ms.Read(...) >= size else break, :282)
        out.append(SupSegment(typ, size, pts, data[pos + 13 : payload_end]))
        pos = payload_end
    return out


def split_segments_mkv(data: bytes) -> list[SupSegment]:
    """Walk 3-byte Matroska-packet headers: type byte + BE16 size, no PTS.

    ParseSegmentHeaderFromMatroska (BluRaySupParserImageSharp.cs:100-107).
    """
    out: list[SupSegment] = []
    pos = 0
    n = len(data)
    while pos + 3 <= n:
        typ = data[pos]
        size = _be16(data, pos + 1)
        payload_end = pos + 3 + size
        if payload_end > n:
            break
        out.append(SupSegment(typ, size, 0, data[pos + 3 : payload_end]))
        pos = payload_end
    return out


def contains_end_segment(data: bytes) -> bool:
    """True iff the packet contains a segment of type 0x80 (END).

    ContainsBluRayStartSegment (BluRaySupParserImageSharp.cs:74-85) — the
    name says "start" but it probes for END, walking 3-byte headers.
    """
    i = 0
    while i + 3 <= len(data):
        if data[i] == 0x80:
            return True
        i += _be16(data, i + 1) + 3
    return False


def composition_state(b: int) -> CompositionState:
    # GetCompositionState (BluRaySupParserImageSharp.cs:575-590)
    return {
        0x00: CompositionState.NORMAL,
        0x40: CompositionState.ACQU_POINT,
        0x80: CompositionState.EPOCH_START,
        0xC0: CompositionState.EPOCH_CONTINUE,
    }.get(b, CompositionState.INVALID)


def parse_pcs(seg: SupSegment) -> PcsData:
    """Project the composition header + per-object entries.

    ParsePicture + ParsePcs (BluRaySupParserImageSharp.cs:109-162):
    short (<11 byte) buffer -> Invalid with pcs_objects=None; objects are
    8-byte-stride records starting at offset 11.
    """
    b = seg.payload
    if len(b) < 11:
        return PcsData(
            comp_num=0,
            state=CompositionState.INVALID,
            palette_update=False,
            start=seg.pts,
            end=0,
            width=0,
            height=0,
            fps_type=0,
            palette_id=0,
            pcs_objects=None,
        )
    pcs = PcsData(
        comp_num=_be16(b, 5),
        state=composition_state(b[7]),
        palette_update=b[8] == 0x80,
        start=seg.pts,
        end=0,
        width=_be16(b, 0),
        height=_be16(b, 2),
        fps_type=b[4],
        palette_id=b[9],
        pcs_objects=None,
    )
    if pcs.state == CompositionState.INVALID:
        return pcs  # pcs_objects stays None (:142-145)
    num = b[10]
    pcs.pcs_objects = []
    off = 0
    for _ in range(num):
        # ParsePcs (:109-118); may raise IndexError on truncated buffers —
        # caught per segment by the caller like the reference (:380-383).
        pcs.pcs_objects.append(
            PcsObject(
                object_id=_be16(b, 11 + off),
                window_id=b[13 + off],
                forced=(b[14 + off] & 0x40) == 0x40,
                x=_be16(b, 15 + off),
                y=_be16(b, 17 + off),
            )
        )
        off += 8
    return pcs


def parse_pds(seg: SupSegment) -> tuple[int, int, PaletteInfo | None]:
    """-> (palette_id, version, PaletteInfo | None if empty).

    ParsePds (BluRaySupParserImageSharp.cs:191-215): size = (segment.Size -
    2) // 5 entries of 5 raw bytes each; <=0 entries -> no palette.
    """
    b = seg.payload
    palette_id = b[0]
    version = b[1]
    n = (seg.size - 2) // 5
    if n <= 0:
        return palette_id, version, None
    return palette_id, version, PaletteInfo(size=n, buffer=bytes(b[2 : 2 + n * 5]))


def parse_ods(seg: SupSegment, force_first: bool) -> OdsData:
    """Project one ODS fragment.

    ParseOds (BluRaySupParserImageSharp.cs:217-257): first fragment
    (flag 0x80, or forced after PCS/END) carries width/height at offsets
    7/9 and payload from 11; continuations carry payload from 4.
    """
    b = seg.payload
    object_id = _be16(b, 0)
    version = b[2]
    flags = b[3]
    is_first = ((flags & 0x80) == 0x80) or force_first
    if is_first:
        return OdsData(
            object_id=object_id,
            object_version=version,
            is_first=True,
            width=_be16(b, 7),
            height=_be16(b, 9),
            data=bytes(b[11 : 11 + (seg.size - 11)]),
        )
    return OdsData(
        object_id=object_id,
        object_version=version,
        is_first=False,
        width=0,
        height=0,
        data=bytes(b[4 : 4 + (seg.size - 4)]),
    )
