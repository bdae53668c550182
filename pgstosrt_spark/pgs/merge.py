"""Consecutive duplicate-frame merge (SURVEY.md §2.3 A6).

Replicates the backwards chain scan + grouped collapse of
/root/reference/src/PgsToSrt/BluRaySup/BluRaySupParserImageSharp.cs:424-558:

  * scan from the end; adjacent pairs qualify when |prev.end - cur.start|
    < 10 ticks, identical canvas size, same object/fragment counts, and
    byte-identical fragment buffers; qualifying pairs chain under one
    ``delete number``, any disqualification bumps the number;
  * groups are processed in number order; each group keeps its middle
    element arr[round(n/2)] (arr sorted by index desc; round-half-even like
    C# Math.Round) with start = earliest start, end = latest end, removing
    the rest — removal in desc index order, so earlier (lower-index) groups
    are unaffected;
  * QualifiesForMerge (:533-558): nothing merges when force_merge_all is
    set or fewer than 3 chains exist in the whole stream; chains of
    exactly 2 merge only if short (<400 ms either side), palette-churny
    (>2 infos), visually large (non-transparent extent >110 px high or
    >300 px wide), or pixel-identical after rasterization — the only place
    decode happens during parse, kept as lazy as the reference;
  * global switches skip_merge / force_merge_all (:15-16, 424, 538).
"""

from __future__ import annotations

from .compose import rasterize
from .imageops import images_equal, non_transparent_height, non_transparent_width
from .model import PcsData

__all__ = ["apply_duplicate_merge"]


def _chain_pairs(pcs_list: list[PcsData]) -> list[tuple[int, int]]:
    """Backwards scan -> [(delete_no, index)] (:426-502)."""
    out: list[tuple[int, int]] = []
    seen: set[tuple[int, int]] = set()
    delete_no = 0
    for i in range(len(pcs_list) - 1, 0, -1):
        cur = pcs_list[i]
        prev = pcs_list[i - 1]
        if (
            abs(prev.end - cur.start) < 10
            and prev.width == cur.width
            and prev.height == cur.height
        ):
            if (
                cur.bitmap_objects
                and cur.bitmap_objects[0]
                and len(prev.bitmap_objects) == len(cur.bitmap_objects)
                and len(prev.bitmap_objects[0]) == len(cur.bitmap_objects[0])
            ):
                equal = True
                for a_frags, b_frags in zip(cur.bitmap_objects, prev.bitmap_objects):
                    if len(a_frags) != len(b_frags):
                        equal = False
                        break
                    for a, b in zip(a_frags, b_frags):
                        if a.data != b.data:
                            equal = False
                            break
                    if not equal:
                        break
                if equal:
                    for idx in (i - 1, i):
                        if (delete_no, idx) not in seen:
                            seen.add((delete_no, idx))
                            out.append((delete_no, idx))
                    continue
                delete_no += 1
                continue  # same sizes, data differs (:492-496)
            continue  # adjacent + same size but no comparable bitmaps (:496)
        delete_no += 1
    return out


def _qualifies(
    arr_desc: list[int],
    pcs_list: list[PcsData],
    merge_count: int,
    force_merge_all: bool,
) -> bool:
    """QualifiesForMerge (:533-558)."""
    if force_merge_all or merge_count < 3:
        return False
    if len(arr_desc) != 2:
        return True
    p1 = pcs_list[arr_desc[0]]
    p2 = pcs_list[arr_desc[1]]
    d1 = p1.end_ms - p1.start_ms
    d2 = p2.end_ms - p2.start_ms
    if d1 < 400.0 or d2 < 400.0 or len(p1.palette_infos) > 2 or len(p2.palette_infos) > 2:
        return True
    bmp1 = rasterize(p1)
    if non_transparent_height(bmp1) > 110 or non_transparent_width(bmp1) > 300:
        return True
    return images_equal(bmp1, rasterize(p2))


def apply_duplicate_merge(
    pcs_list: list[PcsData],
    skip_merge: bool = False,
    force_merge_all: bool = False,
) -> list[PcsData]:
    """Mutates and returns pcs_list with duplicate chains collapsed."""
    if skip_merge and not force_merge_all:  # gate (:424)
        return pcs_list
    pairs = _chain_pairs(pcs_list)
    groups: dict[int, list[int]] = {}
    for number, idx in pairs:
        groups.setdefault(number, []).append(idx)
    merge_count = len(groups)
    for number in sorted(groups):  # OrderBy(p => p.Key) (:505)
        arr_desc = sorted(groups[number], reverse=True)  # OrderByDescending
        mid = arr_desc[round(len(arr_desc) / 2)]  # C# banker's round (:508)
        if _qualifies(arr_desc, pcs_list, merge_count, force_merge_all):
            pcs_list[mid].start = pcs_list[arr_desc[-1]].start  # earliest
            pcs_list[mid].end = pcs_list[arr_desc[0]].end  # latest
            for idx in arr_desc:
                if idx != mid:
                    pcs_list.pop(idx)
    return pcs_list
