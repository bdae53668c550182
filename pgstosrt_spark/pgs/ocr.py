"""OCR backends (SURVEY.md §2.5).

The reference OCRs each rasterized composition with Tesseract
(/root/reference/src/PgsToSrt/PgsOcr.cs:116-123, PageSegMode.Auto, text
trimmed).  Tesseract is nondeterministic across builds, so the engine's
default backend is a deterministic glyph-atlas template matcher — the exact
inverse of the fixture encoder's font — giving byte-for-byte reproducible
text for fixtures and benchmarks.  A real-Tesseract backend plugs in behind
the same interface when ``pytesseract`` is available (not in this image).
"""

from __future__ import annotations

from typing import Protocol

import numpy as np

from .glyphs import packed_atlas

__all__ = ["OcrBackend", "GlyphAtlasOcr", "TesseractOcr", "default_backend"]

# decoder-side layout constants (see pgs/glyphs.py): adjacent glyph
# *contents* are separated by <= 5 blank columns; a space leaves >= 9.
_SPACE_GAP = 7


class OcrBackend(Protocol):
    def recognize(self, rgba: np.ndarray) -> str: ...


class GlyphAtlasOcr:
    """Registration-free template match against the 5x7 atlas.

    Works on any canvas produced by the decode path (the +25 px pad and
    multi-object offsets shift content; matching is on cropped cells).
    """

    def recognize(self, rgba: np.ndarray) -> str:
        mask = (rgba[:, :, 3] > 0).astype(np.uint8)
        if not mask.any():
            return ""  # blank canvas -> empty text (then Trim, PgsOcr.cs:122)
        row_any = mask.any(axis=1)
        rows = np.flatnonzero(row_any)
        lines: list[str] = []
        # split on blank-row gaps >= 2: glyphs like ':' and '!' contain a
        # single internal blank row; encoder lines are >= 3 rows apart
        breaks = np.flatnonzero(np.diff(rows) > 2)
        starts = np.concatenate(([0], breaks + 1))
        ends = np.concatenate((breaks, [len(rows) - 1]))
        for s, e in zip(starts, ends):
            band = mask[rows[s] : rows[e] + 1]
            lines.append(self._recognize_line(band))
        return "\n".join(lines).strip()

    @staticmethod
    def _recognize_line(band: np.ndarray) -> str:
        # ONE vectorized pass packs every column of the line into an
        # integer (bit r = pixel at row r); per-glyph work is then pure
        # tiny-int Python against the packed atlas — numpy-per-cell calls
        # (crop/any/flatnonzero) were ~40% of kernel time
        h = band.shape[0]
        colvals = (
            band.astype(np.int64) << np.arange(h, dtype=np.int64)[:, None]
        ).sum(axis=0)
        cols = np.flatnonzero(colvals)
        if cols.size == 0:
            return ""
        breaks = np.flatnonzero(np.diff(cols) > 1)
        starts = np.concatenate(([0], breaks + 1))
        ends = np.concatenate((breaks, [len(cols) - 1]))
        vals = colvals.tolist()
        glyphs = packed_atlas()
        out: list[str] = []
        prev_end_col: int | None = None
        for s, e in zip(starts.tolist(), ends.tolist()):
            c0, c1 = int(cols[s]), int(cols[e])
            if prev_end_col is not None and c0 - prev_end_col - 1 >= _SPACE_GAP:
                out.append(" ")
            cell = vals[c0 : c1 + 1]
            orv = 0
            for v in cell:
                orv |= v
            r0 = (orv & -orv).bit_length() - 1
            out.append(glyphs.get(tuple(v >> r0 for v in cell), "?"))
            prev_end_col = c1
        return "".join(out)


class TesseractOcr:
    """Real-OCR backend via pytesseract (optional; import-gated).

    Mirrors engine.Process(pix, PageSegMode.Auto) + Trim (PgsOcr.cs:120-122).
    One engine per Python worker process — process isolation replaces the
    reference's engine-per-item workaround for thread-unsafe Tesseract
    (PgsOcr.cs:84).
    """

    def __init__(self, lang: str = "eng") -> None:
        try:
            import pytesseract  # noqa: F401
        except ImportError as exc:  # pragma: no cover - not in this image
            raise NotImplementedError(
                "pytesseract is not installed in this environment; use "
                "GlyphAtlasOcr (deterministic) instead"
            ) from exc
        self._lang = lang

    def recognize(self, rgba: np.ndarray) -> str:  # pragma: no cover
        import pytesseract
        from PIL import Image

        text = pytesseract.image_to_string(
            Image.fromarray(rgba, mode="RGBA"), lang=self._lang
        )
        return (text or "").strip()


def default_backend() -> OcrBackend:
    return GlyphAtlasOcr()
