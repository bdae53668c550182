"""Composition rasterization (SURVEY.md §2.4 D5).

GetRgba32 (/root/reference/src/PgsToSrt/BluRaySup/
BluRaySupParserExtensions.cs:12-34): single-object compositions decode
directly (with the +25 px pad); multi-object compositions compute the union
rectangle of (PCS origin, ODS size) per object and blit each decoded object
at origin - union.origin.

Reference quirk, replicated by default: the multi-object blit passes
opacity **0** to DrawImage (``b.DrawImage(singleBmp, point, 0)``, :30), an
ImageSharp no-op — so multi-object compositions rasterize to a fully
transparent canvas of the union size (and OCR to empty text).  Pass
``multi_object_opacity_fix=True`` for the intended alpha-over blit.
"""

from __future__ import annotations

import numpy as np

from .model import PcsData
from .rle import decode_image

__all__ = ["rasterize"]


def rasterize(pcs: PcsData, multi_object_opacity_fix: bool = False) -> np.ndarray:
    """PcsData -> (H, W, 4) uint8 RGBA, matching GetRgba32."""
    if pcs.pcs_objects is None or len(pcs.pcs_objects) == 0:
        return np.zeros((1, 1, 4), dtype=np.uint8)
    if len(pcs.pcs_objects) == 1:
        return decode_image(
            pcs.pcs_objects[0],
            pcs.bitmap_objects[0] if pcs.bitmap_objects else [],
            pcs.palette_infos,
        )

    # union rect over (origin, ODS size) (:17-22); BitmapObjects is indexed
    # parallel to PcsObjects exactly as the reference does — if an object id
    # was missing at CompletePcs the lists misalign there too.
    x0 = y0 = None
    x1 = y1 = None
    for i, obj in enumerate(pcs.pcs_objects):
        frag = pcs.bitmap_objects[i][0]
        left, top = obj.x, obj.y
        right, bottom = obj.x + frag.width, obj.y + frag.height
        if x0 is None:
            x0, y0, x1, y1 = left, top, right, bottom
        else:
            x0, y0 = min(x0, left), min(y0, top)
            x1, y1 = max(x1, right), max(y1, bottom)
    canvas = np.zeros((max(y1 - y0, 1), max(x1 - x0, 1), 4), dtype=np.uint8)
    if not multi_object_opacity_fix:
        return canvas  # opacity-0 blit: nothing drawn (:30)

    # fixed mode: alpha-over blit of the *unpadded* decodes, then pad the
    # union canvas (the reference's no-op path gives no layout to follow)
    for i, obj in enumerate(pcs.pcs_objects):
        img = decode_image(obj, pcs.bitmap_objects[i], pcs.palette_infos, pad=False)
        ox, oy = obj.x - x0, obj.y - y0
        h = min(img.shape[0], canvas.shape[0] - oy)
        w = min(img.shape[1], canvas.shape[1] - ox)
        if h <= 0 or w <= 0:
            continue
        src = img[:h, :w]
        dst = canvas[oy : oy + h, ox : ox + w]
        mask = src[:, :, 3] > 0
        dst[mask] = src[mask]
    from .rle import pad_image

    return pad_image(canvas)
