"""Replicates the driver's correctness gate locally: every queries() entry
with an oracle_sql() twin must match DuckDB exactly (row count, columns,
values) at sf0.01.  Exact equality — the engine is engineered for
cross-engine determinism (decimal sums, per-row rounding, pinned UTC).
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings".split()
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


ORACLES = sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLES)
def test_query_matches_oracle(spark, duck, name):
    q = entrymod.queries()[name]
    got = _canon(q(spark, SF_DIR).toPandas())
    want = _canon(duck.execute(entrymod.oracle_sql()[name]).df())
    assert list(got.columns) == list(want.columns), f"{name}: column mismatch"
    assert len(got) == len(want), f"{name}: row count {len(got)} != {len(want)}"
    for c in got.columns:
        a, b = got[c].to_numpy(), want[c].to_numpy()
        if np.issubdtype(a.dtype, np.floating):
            mism = ~((a == b) | (np.isnan(a) & np.isnan(b)))
        elif np.issubdtype(a.dtype, np.datetime64):
            mism = ~((a == b) | (np.isnat(a) & np.isnat(b)))
        else:
            mism = a != b
        assert not mism.any(), (
            f"{name}.{c}: {int(mism.sum())} mismatches; "
            f"first: {a[mism][:3]} vs {b[mism][:3]}"
        )


def test_all_queries_have_oracle_or_are_documented():
    qs = set(entrymod.queries().keys())
    oracles = set(entrymod.oracle_sql().keys())
    assert oracles <= qs
    rows_only = qs - oracles
    # every rows-only query must be one of the documented non-SQL ops
    documented = {
        "extract_metrics",
        "srt_render",
        "simhash_fingerprint",
        "ann_ivf_topk",
        "ann_lsh_topk",
    }
    assert rows_only == documented


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.limit(5000).collect()
    assert len(rows) > 0
    assert {"doc_id", "pos", "kind", "text", "media_ref", "offset"} <= set(df.columns)
