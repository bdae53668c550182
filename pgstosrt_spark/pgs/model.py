"""Data model for the PGS decode core.

Mirrors the reference object model (PcsData / PcsObject / OdsData /
PaletteInfo, /root/reference/src/PgsToSrt/BluRaySup/
BluRaySupParserImageSharp.cs:602-751) as plain Python dataclasses.  Mutable
where the reference mutates (times are patched by backfill/merge; fragment
lists are shared and collapsed in place — the aliasing is semantically
load-bearing, see assemble.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import IntEnum


class CompositionState(IntEnum):
    # BluRaySupParserImageSharp.cs:731-738
    NORMAL = 0
    ACQU_POINT = 1
    EPOCH_START = 2
    EPOCH_CONTINUE = 3
    INVALID = 4


# Segment type bytes (dispatch switch, BluRaySupParserImageSharp.cs:284-375)
SEG_PDS = 0x14  # 20  palette definition
SEG_ODS = 0x15  # 21  object definition (bitmap fragment)
SEG_PCS = 0x16  # 22  presentation composition
SEG_WDS = 0x17  # 23  window definition (log-only in the reference)
SEG_END = 0x80  # 128 end of display set


@dataclass
class SupSegment:
    """13-byte SUP header fields (BluRaySupParserImageSharp.cs:602-609)."""

    type: int
    size: int
    pts: int  # 90 kHz ticks; 0 in Matroska mode (3-byte headers carry none)
    payload: bytes


@dataclass
class PcsObject:
    """BluRaySupParserImageSharp.cs:611-620."""

    object_id: int
    window_id: int
    forced: bool
    x: int
    y: int


@dataclass
class PaletteInfo:
    """Raw 5-byte-stride palette buffer (entry_id, Y, Cr, Cb, A).

    BluRaySupParserImageSharp.cs:747-751; entry layout proven by the reads
    in DecodePalette (:630-640).
    """

    size: int
    buffer: bytes


@dataclass
class OdsData:
    """One ODS fragment (BluRaySupParserImageSharp.cs:716-729).

    ``data`` is mutable: fragment reassembly concatenates all fragments of
    an object into fragment[0] in place (:399-422).
    """

    object_id: int
    object_version: int
    is_first: bool
    width: int
    height: int
    data: bytes


@dataclass
class PcsData:
    """One display set / composition (BluRaySupParserImageSharp.cs:664-703).

    ``bitmap_objects`` holds *references* to the parser's per-object-id
    fragment lists (CompletePcs stores the live list, :183), so later
    continuation fragments and the in-place reassembly are visible to every
    composition sharing the object — replicating the reference aliasing.
    """

    comp_num: int
    state: CompositionState
    palette_update: bool
    start: int  # 90 kHz PTS ticks
    end: int
    width: int
    height: int
    fps_type: int
    palette_id: int
    pcs_objects: list[PcsObject] | None = None
    bitmap_objects: list[list[OdsData]] = field(default_factory=list)
    palette_infos: list[PaletteInfo] = field(default_factory=list)

    @property
    def start_ms(self) -> float:
        # PcsData.StartTimeCode => new TimeCode(StartTime / 90.0)  (:700-702)
        return self.start / 90.0

    @property
    def end_ms(self) -> float:
        return self.end / 90.0


@dataclass
class Cue:
    """One recognized subtitle paragraph (PgsOcr.cs:88-94)."""

    seq: int  # 1-based capture order after sort (PgsOcr.cs:110)
    start: int  # 90 kHz ticks
    end: int
    text: str


class DecodeError(Exception):
    """Raised where the reference would throw (e.g. RLE buffer overrun).

    The reference swallows per-segment IndexOutOfRangeException during parse
    (BluRaySupParserImageSharp.cs:380-383) and drops OCR items that throw
    (PgsOcr.cs:103-106); our kernels convert this into metrics instead of
    silence, but keep the same success-path output.
    """
