"""PGS RLE bitmap decode (SURVEY.md §2.4 D2-D4).

Replicates SupDecoder.DecodeImage (/root/reference/src/PgsToSrt/BluRaySup/
BluRaySupParserExtensions.cs:43-141):

  opcode grammar (c = first byte):
    c != 0                  -> 1 literal pixel of colour c
    0x00, 0x00              -> end of line (cursor snaps to next row start)
    0x00, b (b < 0x40)      -> run of colour 0, length b
    0x00, 0x40|hi, lo       -> run of colour 0, length ((b-64)<<8)+lo
    0x00, 0x80|len, c       -> run of colour c, length b-128
    0x00, 0xC0|hi, lo, c    -> run of colour c, length ((b-192)<<8)+lo

  * pixels whose palette alpha is 0 are **not written** — the canvas stays
    fully transparent RGBA(0,0,0,0) there (PutPixel :149-155);
  * end-of-line cursor math: p = p//width*width; if col < width: p += width
    (:72-77) — replicated exactly, including overfilled-row behaviour;
  * degenerate inputs (no data, w/h <= 0, empty buffer) -> 1x1 transparent
    (:48-53);
  * the decoded bitmap is blitted into a (w+50)x(h+50) canvas at (25,25)
    (:136-140) as an OCR-quality border.

The opcode walk is per-run (never per-pixel); pixel writes are numpy slice
assignments + one LUT gather.
"""

from __future__ import annotations

import numpy as np

from .model import DecodeError, OdsData, PaletteInfo, PcsObject
from .palette import decode_palette

__all__ = ["decode_rle_runs", "decode_image", "pad_image"]


def decode_rle_runs(
    buf: bytes, width: int, height: int, alpha_lut: np.ndarray | None = None
) -> np.ndarray:
    """RLE opcodes -> flat (height*width,) int16 colour-index image.

    Index -1 marks never-written pixels.  When ``alpha_lut`` (256 uint8) is
    given, writes of colours with alpha==0 are skipped while the cursor
    still advances — exactly PutPixel (:149-155), so overlapping writes
    keep earlier opaque pixels.  Raises DecodeError where the reference
    would throw IndexOutOfRangeException (buffer overrun).
    """
    total = width * height
    p = 0  # pixel cursor (num1)
    col = 0  # column counter (num2)
    i = 0  # byte cursor (num3)
    n = len(buf)
    # run accumulation: the opcode walk is inherently sequential (EOL cursor
    # math), but pixel writes are not — collect (start, len, colour) per run
    # and scatter once, vectorized, afterwards.  Per-run numpy slice writes
    # were ~60% of RLE decode time.
    starts: list[int] = []
    lens: list[int] = []
    cols: list[int] = []
    alpha_ok = None if alpha_lut is None else (alpha_lut > 0).tolist()

    def write(run: int, colour: int) -> int:
        nonlocal p
        if run <= 0:
            return 0
        if p + run > total:
            raise DecodeError(
                f"RLE overrun: cursor {p}+{run} > {total} ({width}x{height})"
            )
        if alpha_ok is None or alpha_ok[colour]:
            starts.append(p)
            lens.append(run)
            cols.append(colour)
        p += run
        return run

    while i < n:
        c = buf[i]
        i += 1
        if c == 0 and i < n:
            b = buf[i]
            i += 1
            if b == 0:
                # end of line (:72-77)
                p = p // width * width
                if col < width:
                    p += width
                col = 0
            elif (b & 0xC0) == 0x40:
                if i < n:
                    run = ((b - 0x40) << 8) + buf[i]
                    i += 1
                    col += run
                    write(run, 0)
            elif (b & 0xC0) == 0x80:
                if i < n:
                    run = b - 0x80
                    colour = buf[i]
                    i += 1
                    col += run
                    write(run, colour)
            elif (b & 0xC0) == 0xC0:
                if i + 1 < n:
                    run = ((b - 0xC0) << 8) + buf[i]
                    colour = buf[i + 1]
                    i += 2
                    col += run
                    write(run, colour)
            else:  # b < 0x40: short run of colour 0 (:121-127)
                col += b
                write(b, 0)
        else:
            # literal pixel (or trailing lone 0x00 at end of buffer, which
            # the reference also writes as colour 0) (:129-133)
            col += 1
            write(1, c)

    img = np.full(total, -1, dtype=np.int16)
    if not starts:
        return img
    s = np.asarray(starts, dtype=np.int64)
    ln = np.asarray(lens, dtype=np.int64)
    cl = np.asarray(cols, dtype=np.int16)
    if len(s) == 1 or bool(np.all(s[1:] >= (s + ln)[:-1])):
        # ordered, non-overlapping runs (the normal case): one scatter
        off = np.cumsum(ln) - ln
        pos = np.repeat(s - off, ln) + np.arange(int(ln.sum()), dtype=np.int64)
        img[pos] = np.repeat(cl, ln)
    else:
        # overlapping writes (overfilled row + EOL snap-back): replay in
        # stream order so later opaque runs win, exactly like the reference
        for st, l, c0 in zip(starts, lens, cols):
            img[st : st + l] = c0
    return img


def pad_image(rgba: np.ndarray, border: int = 25) -> np.ndarray:
    """Transparent border pad (BluRaySupParserExtensions.cs:136-140)."""
    return np.pad(rgba, ((border, border), (border, border), (0, 0)))


def decode_image(
    pcs_obj: PcsObject | None,
    fragments: list[OdsData],
    palettes: list[PaletteInfo],
    pad: bool = True,
) -> np.ndarray:
    """One composition object -> (h+50, w+50, 4) uint8 RGBA.

    DecodeImage (BluRaySupParserExtensions.cs:43-141); fragments must be
    pre-reassembled (fragment[0] holds the full buffer).
    """
    if pcs_obj is None or not fragments:
        return np.zeros((1, 1, 4), dtype=np.uint8)
    width, height = fragments[0].width, fragments[0].height
    if width <= 0 or height <= 0 or len(fragments[0].data) == 0:
        return np.zeros((1, 1, 4), dtype=np.uint8)

    lut = decode_palette(palettes)
    idx = decode_rle_runs(fragments[0].data, width, height, alpha_lut=lut[:, 3])

    rgba = np.zeros((height * width, 4), dtype=np.uint8)
    written = idx >= 0
    rgba[written] = lut[idx[written].astype(np.int32)]
    rgba = rgba.reshape(height, width, 4)
    return pad_image(rgba) if pad else rgba
