"""SRT time formatting and cue text rendering (SURVEY.md §2.5 O4-O5).

PTS (90 kHz ticks) -> milliseconds via /90.0 (PgsOcr.cs:91-92); rendered as
``HH:MM:SS,mmm`` like libse's SubRip writer.  Total milliseconds are
rounded half-even (C# Math.Round) before decomposition — fixtures use
tick values that are exact multiples of 90, so rounding never straddles.
"""

from __future__ import annotations

__all__ = ["pts_to_ms", "format_timecode", "cue_text", "render_srt"]


def pts_to_ms(pts: int) -> float:
    return pts / 90.0


def _round_half_even(x: float) -> int:
    return round(x)  # Python round == C# Math.Round default (banker's)


def format_timecode(ms: float) -> str:
    total = _round_half_even(ms)
    if total < 0:
        total = 0
    h, rem = divmod(total, 3_600_000)
    m, rem = divmod(rem, 60_000)
    s, milli = divmod(rem, 1_000)
    return f"{h:02d}:{m:02d}:{s:02d},{milli:03d}"


def cue_text(start_pts: int, end_pts: int, text: str) -> str:
    """The engine's canonical cue span text (FIXTURES.md §2):
    ``{start} --> {end}\\n{ocr_text}``."""
    return (
        f"{format_timecode(pts_to_ms(start_pts))} --> "
        f"{format_timecode(pts_to_ms(end_pts))}\n{text}"
    )


def render_srt(cues: list[tuple[int, int, str]]) -> str:
    """Numbered SRT blocks (libse SubRip format, PgsOcr.cs:59-63).

    ``cues`` = [(start_pts, end_pts, text)] already in display order.
    """
    blocks = []
    for n, (start, end, text) in enumerate(cues, start=1):
        blocks.append(
            f"{n}\r\n{format_timecode(pts_to_ms(start))} --> "
            f"{format_timecode(pts_to_ms(end))}\r\n{text}\r\n"
        )
    return "\r\n".join(blocks) + ("\r\n" if blocks else "")
