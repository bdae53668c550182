"""File sinks (SURVEY.md §2.1 S5 — the reference's SRT writer contract).

The reference writes one numbered SubRip file per selected track, UTF-8
WITHOUT a byte-order mark (PgsOcr.cs:59-63: ``new UTF8Encoding(false)``),
output filename derived from the source + track (MkvUtilities.cs:20-48).
Our engine's canonical output stays the spans table (same shape as input);
this sink is the last-mile materialization for users who want the
reference's on-disk artifact: one ``<doc_id>.<media_ref>.srt`` per media
span, bytes identical to ``pgs.srt.render_srt``.

Distributed write: a mapInPandas writer kernel — each task writes its own
partition's files and emits one (path, n_bytes) receipt row per file, so
the sink is driver-light and the receipt table is the lineage record.
``out_dir`` must be a filesystem every executor can reach (local path in
local mode, NFS/fuse mount on a cluster); object stores want the
Iceberg/table sink instead — per-file POSIX writes are the reference's
contract, not the 100 TB path.
"""

from __future__ import annotations

import os
import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

__all__ = ["write_srt_files", "safe_srt_name"]

_UNSAFE = re.compile(r"[^A-Za-z0-9._-]+")


def safe_srt_name(doc_id: str, media_ref: str) -> str:
    """``<doc_id>.<media_ref>.srt`` with path-hostile characters collapsed
    to ``_`` (the reference dedups colliding output names with numeric
    suffixes, MkvUtilities.cs:20-48; (doc_id, media_ref) is unique here so
    sanitization alone cannot collide distinct spans unless ids differ
    only in unsafe characters — the writer fails loudly in that case)."""
    return f"{_UNSAFE.sub('_', doc_id)}.{_UNSAFE.sub('_', media_ref)}.srt"


def write_srt_files(rendered: DataFrame, out_dir: str) -> DataFrame:
    """Write one UTF-8 (no BOM) ``.srt`` file per (doc_id, media_ref) row
    of ``pipeline.render_srt_documents`` output; returns the receipt
    DataFrame (doc_id, media_ref, path, n_bytes) — an action on it (count,
    write) performs the file writes."""

    def writer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        os.makedirs(out_dir, exist_ok=True)
        for pdf in batches:
            paths, sizes = [], []
            for doc_id, media_ref, srt in zip(
                pdf["doc_id"].tolist(), pdf["media_ref"].tolist(), pdf["srt"].tolist()
            ):
                name = safe_srt_name(str(doc_id), str(media_ref))
                path = os.path.join(out_dir, name)
                if os.path.exists(path):
                    raise FileExistsError(
                        f"srt name collision after sanitization: {name}"
                    )
                data = srt.encode("utf-8")  # no BOM (PgsOcr.cs:59-63)
                with open(path, "wb") as f:
                    f.write(data)
                paths.append(path)
                sizes.append(len(data))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_ref": pdf["media_ref"],
                    "path": paths,
                    "n_bytes": sizes,
                }
            )

    return rendered.mapInPandas(
        writer, schema="doc_id string, media_ref string, path string, n_bytes long"
    )
