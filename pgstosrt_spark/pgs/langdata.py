"""OCR language-data discovery (SURVEY.md §2.1 S6).

Replicates TesseractData (/root/reference/src/PgsToSrt/TesseractData.cs):

  * ``available_languages`` (:48-61): scan a data dir for
    ``*.traineddata``, language = lower-cased stem.
  * ``resolve_language`` (:18-45): wanted language validated against the
    available set (case-insensitive, returns None when missing — the
    reference logs the available list and aborts the track); no wanted
    language -> ALL available joined with '+' (:63-66); empty dir -> None.

Driver-side job-submit validation (the Spark analog of CLI option
checking, SURVEY.md §2.1) — the resolved string is what a Tesseract
backend would receive, broadcast to executors by closure capture.
"""

from __future__ import annotations

import os

__all__ = ["available_languages", "resolve_language"]


def available_languages(data_path: str) -> list[str]:
    """Lower-cased language codes for every ``*.traineddata`` in
    ``data_path``, sorted for determinism (the reference inherits
    filesystem order; sorting keeps the '+'-joined default stable across
    platforms)."""
    try:
        names = os.listdir(data_path)
    except FileNotFoundError:
        return []
    return sorted(
        os.path.splitext(f)[0].lower()
        for f in names
        if f.endswith(".traineddata")
    )


def resolve_language(data_path: str, wanted: str | None = None) -> str | None:
    """The Tesseract language string for a run, or None when unresolvable
    (missing wanted language / no data files) — mirroring
    GetTesseractLanguage's tri-state result."""
    languages = available_languages(data_path)
    if wanted is not None:
        return wanted if wanted.lower() in languages else None
    if languages:
        return "+".join(languages)
    return None
