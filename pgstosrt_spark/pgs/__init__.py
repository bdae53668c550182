"""Pure-Python/numpy PGS decode core (no Spark imports).

Implements, 1:1 with the reference semantics surveyed in SURVEY.md §2:

  segments.py — segment header walk + per-type field projection (P1-P6)
  assemble.py — display-set state machine, completion join, fragment
                reassembly, end-time backfill, empty drop (A1-A5, A7)
  merge.py    — consecutive duplicate-frame merge + heuristics (A6, D6, D7)
  palette.py  — PDS palette -> 256x4 RGBA LUT, BT.709 YCbCr (D1)
  rle.py      — PGS RLE bitmap decode + pad (D2-D4)
  compose.py  — multi-object composition (D5)
  glyphs.py   — deterministic 5x7 glyph atlas (shared by encoder + OCR)
  ocr.py      — OCR backends: glyph-atlas template match (deterministic,
                used for tests/bench) and optional external engines
  srt.py      — 90 kHz PTS -> SRT timecode text (O4-O5)
  decode.py   — end-to-end stream decode -> cue list (the oracle)
"""
