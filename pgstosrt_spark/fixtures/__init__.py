"""Deterministic fixture synthesis (no external data).

encoder.py — a PGS *writer*: text -> glyph bitmap -> palette -> RLE ->
             PCS/WDS/PDS/ODS/END segment emission, inverting the decode
             path surveyed in SURVEY.md §2.
corpus.py  — builds interleaved ``documents`` tables (FIXTURES.md §1) at
             arbitrary scale from seeded text, for tests and benchmarks.
"""
