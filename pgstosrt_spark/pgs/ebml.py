"""Minimal Matroska (EBML) demux for PGS subtitle tracks (SURVEY.md §2.1 S2).

Replicates the slice of libse's ``MatroskaFile`` the reference consumes
(/root/reference/src/PgsToSrt/PgsParser.cs:30-50, MkvUtilities.cs:98-115):
track listing (number, codec id, language, forced flag) and per-packet
payload extraction with container timestamps, which feed
``assemble_mkv_packets`` exactly like the reference's
ParseBluRaySupFromMatroska consumes matroska.GetSubtitle().

Scope (documented, fixture-verified):
  * EBML vints (ids keep the marker bit, sizes strip it; unknown size =
    extends to the end of the parent);
  * Segment > Info.TimestampScale (default 1,000,000 ns => block
    timestamps are milliseconds);
  * Segment > Tracks > TrackEntry {TrackNumber, CodecID, Language,
    FlagForced};
  * Segment > Cluster {Timestamp, SimpleBlock, BlockGroup{Block,
    BlockDuration}}, including Xiph / fixed-size / EBML lacing (one
    packet per laced frame, frames sharing the block timestamp — PGS
    subtitle tracks are un-laced in practice but libse's MatroskaFile
    parses laced ones, so a malformed-but-real file must too);
  * unknown-size Clusters (live/streamed muxes) terminated at the next
    top-level Cluster header; other unknown-size elements raise;
  * block end time = start + BlockDuration when present, else start
    (the zero-duration tail patch in assemble_mkv_packets then applies,
    BluRaySupParserImageSharp.cs:59-68).

The inverse writer lives in fixtures/encoder.py (build_mkv) so the
demux is round-trip-tested without external media.
"""

from __future__ import annotations

from dataclasses import dataclass

from .model import DecodeError

__all__ = ["EBML_MAGIC", "MkvTrack", "mkv_tracks", "mkv_pgs_packets", "PGS_CODEC_ID"]

EBML_MAGIC = b"\x1a\x45\xdf\xa3"
PGS_CODEC_ID = "S_HDMV/PGS"

_ID_SEGMENT = 0x18538067
_ID_INFO = 0x1549A966
_ID_TIMESTAMP_SCALE = 0x2AD7B1
_ID_TRACKS = 0x1654AE6B
_ID_TRACK_ENTRY = 0xAE
_ID_TRACK_NUMBER = 0xD7
_ID_CODEC_ID = 0x86
_ID_LANGUAGE = 0x22B59C
_ID_FLAG_FORCED = 0x55AA
_ID_CLUSTER = 0x1F43B675
_ID_CLUSTER_TS = 0xE7
_ID_SIMPLE_BLOCK = 0xA3
_ID_BLOCK_GROUP = 0xA0
_ID_BLOCK = 0xA1
_ID_BLOCK_DURATION = 0x9B

_UNKNOWN = -1


@dataclass(frozen=True)
class MkvTrack:
    number: int
    codec_id: str
    language: str
    forced: bool


def _read_vint(data: bytes, pos: int, keep_marker: bool) -> tuple[int, int]:
    """-> (value, next_pos).  EBML ids keep the length-marker bit; sizes
    strip it.  All-ones value bits in a size mean 'unknown' (_UNKNOWN)."""
    if pos >= len(data):
        raise DecodeError("EBML: vint past end of buffer")
    b0 = data[pos]
    if b0 == 0:
        raise DecodeError("EBML: invalid vint first byte 0x00")
    length = 8 - b0.bit_length() + 1
    if pos + length > len(data):
        raise DecodeError("EBML: vint truncated")
    raw = int.from_bytes(data[pos : pos + length], "big")
    if keep_marker:
        return raw, pos + length
    value = raw - (1 << (7 * length))  # strip the marker bit
    if value == (1 << (7 * length)) - 1:
        return _UNKNOWN, pos + length
    return value, pos + length


_CLUSTER_ID_BYTES = b"\x1f\x43\xb6\x75"


def _cluster_end(data: bytes, pos: int, end: int) -> int:
    """End of an unknown-size Cluster: the next top-level Cluster header
    (standard Matroska resync — unknown-size clusters, common in
    live/streamed muxes, are terminated only by the next sibling).  A
    candidate match inside block payload bytes is rejected unless a valid
    size vint follows it; no further Cluster header means the cluster runs
    to the parent end."""
    search = pos
    while True:
        hit = data.find(_CLUSTER_ID_BYTES, search, end)
        if hit < 0:
            return end
        try:
            size, after = _read_vint(data, hit + 4, keep_marker=False)
        except DecodeError:
            search = hit + 1
            continue
        if size == _UNKNOWN or after + size <= end:
            return hit
        search = hit + 1


def _walk(data: bytes, pos: int, end: int):
    """Yield (element_id, payload_start, payload_end) for one master level.

    Unknown-size elements: Segment extends to the parent end (the normal
    file layout); Cluster terminates at the next top-level Cluster header
    (else every later cluster would be swallowed as unrecognized children
    of the first — silently truncating the subtitle stream); anything
    else unknown-size is malformed for this scope and raises, matching the
    module's fail-loud policy."""
    while pos < end:
        el_id, pos = _read_vint(data, pos, keep_marker=True)
        size, pos = _read_vint(data, pos, keep_marker=False)
        if size == _UNKNOWN:
            if el_id == _ID_SEGMENT:
                payload_end = end
            elif el_id == _ID_CLUSTER:
                payload_end = _cluster_end(data, pos, end)
            else:
                raise DecodeError(
                    f"EBML: unknown-size element 0x{el_id:x} unsupported"
                )
        else:
            payload_end = pos + size
        if payload_end > end:
            raise DecodeError("EBML: element overruns its parent")
        yield el_id, pos, payload_end
        pos = payload_end


def _uint(data: bytes, start: int, end: int) -> int:
    return int.from_bytes(data[start:end], "big") if end > start else 0


def _segment_bounds(data: bytes) -> tuple[int, int]:
    if data[:4] != EBML_MAGIC:
        raise DecodeError("EBML: missing magic")
    for el_id, s, e in _walk(data, 0, len(data)):
        if el_id == _ID_SEGMENT:
            return s, e
    raise DecodeError("EBML: no Segment element")


def mkv_tracks(data: bytes) -> list[MkvTrack]:
    """Track metadata in track order (MkvUtilities.cs:98-115 pre-filter
    view — apply operators.tracks.pgs_tracks / tracks_by_language for the
    reference's selection semantics)."""
    seg_s, seg_e = _segment_bounds(data)
    tracks: list[MkvTrack] = []
    for el_id, s, e in _walk(data, seg_s, seg_e):
        if el_id != _ID_TRACKS:
            continue
        for t_id, ts, te in _walk(data, s, e):
            if t_id != _ID_TRACK_ENTRY:
                continue
            number, codec, lang, forced = 0, "", "eng", False
            for f_id, fs, fe in _walk(data, ts, te):
                if f_id == _ID_TRACK_NUMBER:
                    number = _uint(data, fs, fe)
                elif f_id == _ID_CODEC_ID:
                    codec = data[fs:fe].decode("ascii", "replace")
                elif f_id == _ID_LANGUAGE:
                    lang = data[fs:fe].decode("ascii", "replace")
                elif f_id == _ID_FLAG_FORCED:
                    forced = _uint(data, fs, fe) != 0
            tracks.append(MkvTrack(number, codec, lang, forced))
    return sorted(tracks, key=lambda t: t.number)


def _read_svint(data: bytes, pos: int) -> tuple[int, int]:
    """Signed vint (EBML-lace size delta): unsigned vint minus
    2^(7*len-1)-1."""
    if pos >= len(data):
        raise DecodeError("EBML: svint past end of buffer")
    length = 8 - data[pos].bit_length() + 1
    value, pos = _read_vint(data, pos, keep_marker=False)
    return value - ((1 << (7 * length - 1)) - 1), pos


def _lace_sizes(data: bytes, pos: int, e: int, flags: int) -> tuple[list[int], int]:
    """Frame sizes for a laced block (Matroska §lacing; libse MatroskaFile
    handles all three encodings).  -> (sizes, data_start)."""
    if pos >= e:
        raise DecodeError("EBML: laced block missing frame count")
    n = data[pos] + 1
    pos += 1
    mode = (flags >> 1) & 0x3
    sizes: list[int] = []
    if mode == 0x2:  # fixed-size lacing: remainder divides evenly
        total = e - pos
        if n == 0 or total % n:
            raise DecodeError("EBML: fixed lacing does not divide evenly")
        sizes = [total // n] * n
    elif mode == 0x1:  # Xiph: 255-saturated byte sums for first n-1 frames
        for _ in range(n - 1):
            size = 0
            while True:
                if pos >= e:
                    raise DecodeError("EBML: Xiph lace sizes truncated")
                b = data[pos]
                pos += 1
                size += b
                if b != 0xFF:
                    break
            sizes.append(size)
        sizes.append(e - pos - sum(sizes))
    else:  # 0x3 EBML: first size a plain vint, then signed-vint deltas;
        # only the first n-1 sizes are stored (none for a 1-frame lace)
        if n > 1:
            size, pos = _read_vint(data, pos, keep_marker=False)
            if size == _UNKNOWN:
                raise DecodeError("EBML: unknown-size lace frame")
            sizes.append(size)
            for _ in range(n - 2):
                delta, pos = _read_svint(data, pos)
                size += delta
                sizes.append(size)
        sizes.append(e - pos - sum(sizes))
    if any(s < 0 for s in sizes) or sum(sizes) != e - pos:
        raise DecodeError("EBML: lace sizes inconsistent with block length")
    return sizes, pos


def _parse_block(data: bytes, s: int, e: int) -> tuple[int, int, list[bytes]]:
    """Block/SimpleBlock payload -> (track_number, rel_ts, frames).

    Un-laced blocks yield one frame; Xiph / fixed-size / EBML lacing yield
    one frame per lace entry (PGS subtitle tracks are un-laced in practice,
    but a malformed-but-real file should parse, not error — VERDICT r2 §
    missing 3).  All frames of a lace share the block timestamp: lace
    default-duration spacing is an audio concern with no meaning for
    subtitle segments."""
    track, pos = _read_vint(data, s, keep_marker=False)
    if pos + 3 > e:
        raise DecodeError("EBML: block header truncated")
    rel = int.from_bytes(data[pos : pos + 2], "big", signed=True)
    flags = data[pos + 2]
    pos += 3
    if not (flags >> 1) & 0x3:
        return track, rel, [data[pos:e]]
    sizes, pos = _lace_sizes(data, pos, e, flags)
    frames = []
    for size in sizes:
        frames.append(data[pos : pos + size])
        pos += size
    return track, rel, frames


def mkv_pgs_packets(
    data: bytes, track_number: int | None = None
) -> list[tuple[int, int, bytes]]:
    """-> [(start_ms, end_ms, segment_bytes)] for the selected track, in
    cluster order — the exact input shape of assemble_mkv_packets.

    ``track_number`` None selects the first PGS track (the reference
    requires an explicit track or language; this default mirrors its
    single-track convenience path)."""
    if track_number is None:
        pgs = [t for t in mkv_tracks(data) if t.codec_id == PGS_CODEC_ID]
        if not pgs:
            raise DecodeError("EBML: no PGS track")
        track_number = pgs[0].number
    seg_s, seg_e = _segment_bounds(data)
    scale = 1_000_000  # ns per tick -> default: timestamps are ms
    packets: list[tuple[int, int, bytes]] = []
    for el_id, s, e in _walk(data, seg_s, seg_e):
        if el_id == _ID_INFO:
            for f_id, fs, fe in _walk(data, s, e):
                if f_id == _ID_TIMESTAMP_SCALE:
                    scale = _uint(data, fs, fe) or 1_000_000
        elif el_id == _ID_CLUSTER:
            cluster_ts = 0
            for c_id, cs, ce in _walk(data, s, e):
                if c_id == _ID_CLUSTER_TS:
                    cluster_ts = _uint(data, cs, ce)
                elif c_id == _ID_SIMPLE_BLOCK:
                    trk, rel, frames = _parse_block(data, cs, ce)
                    if trk == track_number:
                        start = (cluster_ts + rel) * scale // 1_000_000
                        packets.extend((start, start, frame) for frame in frames)
                elif c_id == _ID_BLOCK_GROUP:
                    frame_info = None
                    duration = 0
                    for g_id, gs, ge in _walk(data, cs, ce):
                        if g_id == _ID_BLOCK:
                            frame_info = _parse_block(data, gs, ge)
                        elif g_id == _ID_BLOCK_DURATION:
                            duration = _uint(data, gs, ge)
                    if frame_info is not None and frame_info[0] == track_number:
                        _trk, rel, frames = frame_info
                        start = (cluster_ts + rel) * scale // 1_000_000
                        end = start + duration * scale // 1_000_000
                        packets.extend((start, end, frame) for frame in frames)
    return packets
