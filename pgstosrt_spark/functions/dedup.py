"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale design (100 TB):
  * exact dedup      — one shuffle on a 16-byte hash; map-side partial agg.
  * n-gram Jaccard   — shingle explode -> equi-join on shingle -> per-pair
                       agg.  The shingle join is the standard candidate
                       generator; hot shingles are the skew risk, handled
                       by dropping top-frequency shingles (stop-shingles),
                       like dropping stop-words in web dedup.
  * MinHash + LSH    — k=16 permutation-free min-hashes via xxhash64
                       (JVM-side), banded 4x4; candidate pairs join on the
                       band key (tiny vs all-pairs), verified by exact
                       Jaccard.  This is the 10^12-doc path: cost is
                       O(docs x k) + a join on rare band collisions.
  * SimHash          — 32-bit majority-vote fingerprint; near-dup pairs
                       join on any of 4 byte-bands, verified by hamming
                       distance.  All pure F.* expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import tokens_col

__all__ = [
    "exact_dedup",
    "shingles_col",
    "ngram_jaccard_pairs",
    "minhash_signature",
    "minhash_lsh_pairs",
    "simhash",
    "simhash_pairs",
]

# 31-bit Mersenne prime: keeps a*x products within long range under
# Spark's ANSI overflow checking (a, x < 2^31 -> a*x < 2^62)
_MERSENNE = (1 << 31) - 1


def exact_dedup(df: DataFrame, col: str = "text") -> DataFrame:
    """Hash-groupBy exact dedup: fingerprint -> group size + canonical doc.

    Partial (map-side) aggregation makes this one small shuffle of
    (hash, count, min_id) triples regardless of document size.
    """
    norm = F.trim(F.regexp_replace(F.lower(F.col(col)), "\\s+", " "))
    return (
        df.select(F.md5(norm).alias("fingerprint"), "doc_id")
        .groupBy("fingerprint")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("canonical_doc_id"))
    )


def shingles_col(n: int = 3, col: str = "text"):
    """Distinct word n-gram shingles as an array column (pure F.*).

    Guarded for short docs: Spark's sequence(1, 0) yields a *descending*
    [1, 0], so docs with < n tokens must short-circuit to an empty array.
    """
    toks = tokens_col(col)
    return F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def ngram_jaccard_pairs(
    df: DataFrame, n: int = 3, threshold: float = 0.5, col: str = "text"
) -> DataFrame:
    """Near-dup pairs by word-n-gram Jaccard >= threshold.

    explode distinct shingles -> self-equi-join on shingle (a.doc < b.doc)
    -> |A∩B| per pair -> |A∪B| = |A|+|B|-|A∩B|.  Output: doc_a, doc_b,
    jaccard (6dp).  SQL-expressible -> DuckDB oracle.
    """
    sh = df.select("doc_id", shingles_col(n, col).alias("sh")).select(
        "doc_id", F.size("sh").alias("n_sh"), F.explode("sh").alias("shingle")
    )
    a = sh.alias("a")
    b = sh.alias("b")
    pairs = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.n_sh").alias("n_a"),
            F.col("b.n_sh").alias("n_b"),
        )
        .agg(F.count("*").alias("inter"))
    )
    jac = F.round(F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")), 6)
    return (
        pairs.select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def _hash_params(k: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for the k min-hash functions."""
    rnd = []
    a, b = 0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F
    for i in range(k):
        rnd.append(((a * (i + 1)) % _MERSENNE | 1, (b * (i + 7)) % _MERSENNE))
    return rnd


def minhash_signature(df: DataFrame, k: int = 16, n: int = 3, col: str = "text") -> DataFrame:
    """doc_id + minhash_0..k-1 columns (xxhash64-based, permutation-free).

    h_j(doc) = min over shingles s of (a_j * xxhash64(s) + b_j) mod M61 —
    all JVM-side array expressions, no shuffle, no UDF.
    """
    sh = shingles_col(n, col)

    # factory keeps the lambda single-arg (PySpark binds HOF lambdas by arity)
    def perm(a: int, b: int):
        return lambda s: F.pmod(
            F.lit(a) * F.pmod(F.xxhash64(s), F.lit(_MERSENNE)) + F.lit(b),
            F.lit(_MERSENNE),
        )

    cols = [F.col("doc_id")]
    for j, (a, b) in enumerate(_hash_params(k)):
        cols.append(F.array_min(F.transform(sh, perm(a, b))).alias(f"mh_{j}"))
    return df.select(*cols)


def minhash_lsh_pairs(
    df: DataFrame,
    k: int = 16,
    bands: int = 4,
    n: int = 3,
    threshold: float = 0.5,
    col: str = "text",
) -> DataFrame:
    """MinHash-LSH candidate generation + exact-Jaccard verification.

    Signature k=16 banded into ``bands`` rows of k/bands; docs sharing any
    band bucket become candidates (the only join — on the band hash, tiny
    at scale); candidates are verified with exact shingle Jaccard.
    Output: doc_a, doc_b, jaccard.
    """
    rows = k // bands
    sig = minhash_signature(df, k=k, n=n, col=col)
    # single pass: one (band, bucket) struct array exploded — a union of
    # per-band selects would recompute the whole signature per band
    band_structs = [
        F.struct(
            F.lit(bidx).alias("band"),
            F.xxhash64(*[F.col(f"mh_{bidx * rows + r}") for r in range(rows)]).alias(
                "bucket"
            ),
        )
        for bidx in range(bands)
    ]
    band_rows = sig.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("bb")
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    a, b = band_rows.alias("a"), band_rows.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sh = df.select("doc_id", shingles_col(n, col).alias("sh"))
    verified = (
        cand.join(sh.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sh", "sh_a"), "doc_a")
        .join(sh.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sh", "sh_b"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                6,
            ).alias("jaccard"),
        )
    )
    return verified.filter(F.col("jaccard") >= threshold)


def simhash(df: DataFrame, bits: int = 32, col: str = "text") -> DataFrame:
    """doc_id, simhash — per-token xxhash64, per-bit majority vote.

    Built as a single select over the token array: for each bit, sum of
    (+1/-1) votes via aggregate(), then recombine.  No explode, no shuffle.
    """
    toks = tokens_col(col)

    def voter(bit: int):
        return lambda acc, t: acc + F.when(
            F.shiftright(F.xxhash64(t), bit).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    bit_cols = []
    for bit in range(bits):
        vote = F.aggregate(toks, F.lit(0).cast("long"), voter(bit))
        bit_cols.append(F.when(vote > 0, F.lit(1 << bit).cast("long")).otherwise(F.lit(0)))
    total = bit_cols[0]
    for c in bit_cols[1:]:
        total = total + c
    return df.select("doc_id", total.alias("simhash"))


def simhash_pairs(df: DataFrame, max_hamming: int = 3, col: str = "text") -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming.

    Band join: 32-bit fingerprint split into 4 bytes; by pigeonhole, any
    pair within hamming 3 agrees on >= 1 byte -> join per byte-band, then
    verify with bit_count.  Output: doc_a, doc_b, hamming.
    """
    sig = simhash(df, col=col)
    chunk_structs = [
        F.struct(
            F.lit(i).alias("band"),
            F.shiftright("simhash", i * 8).bitwiseAND(F.lit(0xFF)).alias("chunk"),
        )
        for i in range(4)
    ]
    bands = sig.select(
        "doc_id", "simhash", F.explode(F.array(*chunk_structs)).alias("bb")
    ).select(
        "doc_id", "simhash", F.col("bb.band").alias("band"), F.col("bb.chunk").alias("chunk")
    )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
    )
    return cand.filter(F.col("hamming") <= max_hamming)
