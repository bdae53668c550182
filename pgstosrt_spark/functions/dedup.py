"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale design (100 TB):
  * exact dedup      — one shuffle on a 16-byte hash; map-side partial agg.
  * n-gram Jaccard   — shingle explode -> equi-join on shingle -> per-pair
                       agg.  This is the *exact* baseline (and the DuckDB
                       oracle's definition); its shingle self-join is
                       quadratic in hot-shingle frequency, which is exactly
                       why the MinHash+LSH variant below is the 10^12-doc
                       path — at scale, run LSH and reserve exact Jaccard
                       for verifying the candidate pairs.
  * MinHash + LSH    — k=16 permutation-free min-hashes via xxhash64
                       (JVM-side), banded with (bands, rows) DERIVED from
                       the threshold (catch probability >= 0.95 at
                       j=threshold); candidate pairs join on the band key
                       (tiny vs all-pairs), then the verify stage
                       semi-joins the corpus down to candidate doc_ids
                       before recomputing shingles.  This is the 10^12-doc
                       path: cost is O(docs x k) + a join on band
                       collisions + shingles for candidates only.
  * SimHash          — 64-bit majority-vote fingerprint (32-bit collides
                       by birthday at 10^12 docs); near-dup pairs join on
                       any of 8 byte-bands (pigeonhole-exact for hamming
                       <= 7), verified by hamming distance.  All pure F.*
                       expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import tokens_col

__all__ = [
    "exact_dedup",
    "shingles_col",
    "ngram_jaccard_pairs",
    "minhash_signature",
    "lsh_banding",
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
    """-> (doc_id, n_sh, sig: array<long>[k]) — permutation-free MinHash.

    h_j(doc) = min over shingles s of (a_j * xxhash64(s) + b_j) mod M31,
    computed as ONE fold over the shingle array: each shingle is hashed
    once, expanded to k affine candidates, and merged with zip_with/least.
    The shingle array is materialized in its own projection and referenced
    twice (size + fold), which stops Catalyst's CollapseProject from
    re-inlining the shingle computation k times — the naive per-column
    formulation costs k full tokenizations per row.
    """
    params = _hash_params(k)
    init = F.array(*[F.lit(_MERSENNE).cast("long")] * k)

    def merge(acc, x):
        cand = F.array(
            *[
                F.pmod(F.lit(a) * x + F.lit(b), F.lit(_MERSENNE))
                for a, b in params
            ]
        )
        return F.zip_with(acc, cand, lambda m, c: F.least(m, c))

    base = df.select("doc_id", shingles_col(n, col).alias("_sh"))
    hashed = F.transform("_sh", lambda s: F.pmod(F.xxhash64(s), F.lit(_MERSENNE)))
    return base.select(
        "doc_id",
        F.size("_sh").alias("n_sh"),
        F.aggregate(hashed, init, merge).alias("sig"),
    )


def lsh_banding(k: int, threshold: float, target: float = 0.95) -> tuple[int, int]:
    """Choose (bands, rows) for a k-hash signature from the Jaccard
    threshold: the candidate-catch probability at similarity j under b
    bands of r rows is 1 - (1 - j^r)^b.  Scanning r from largest divisor
    of k down picks the MOST SELECTIVE banding whose catch at j=threshold
    still meets ``target`` — fixed banding ignores the threshold entirely
    (4x4 at j=0.2 catches ~0.6% of true pairs).  Falls back to (k, 1)
    (max recall, least selective) when even single-row bands miss the
    target; raise k for low thresholds if selectivity matters.
    """
    for r in range(k, 0, -1):
        if k % r:
            continue
        b = k // r
        if 1.0 - (1.0 - threshold**r) ** b >= target:
            return b, r
    return k, 1


def minhash_lsh_pairs(
    df: DataFrame,
    k: int = 16,
    bands: int | None = None,
    n: int = 3,
    threshold: float = 0.5,
    col: str = "text",
) -> DataFrame:
    """MinHash-LSH candidate generation + exact-Jaccard verification.

    Banding defaults to ``lsh_banding(k, threshold)`` — catch probability
    >= 0.95 at j=threshold — unless ``bands`` overrides it.  Docs sharing
    any band bucket become candidates (the only join — on the band hash,
    tiny at scale); the corpus is then SEMI-JOINED down to candidate
    doc_ids before shingles are recomputed for exact-Jaccard verification,
    so the second tokenization pass touches candidates only (at 10^12 docs
    re-shingling the whole corpus would double the cost of the operator).
    Output: doc_a, doc_b, jaccard.
    """
    if bands is None:
        bands, rows = lsh_banding(k, threshold)
    else:
        rows = k // bands
    # docs with zero shingles all share the init signature — exclude them
    # instead of letting them bucket-join with each other
    sig = minhash_signature(df, k=k, n=n, col=col).filter(F.col("n_sh") > 0)
    # single pass: band buckets as one posexplode over slices of the
    # signature array — per-band selects would recompute the signature
    band_rows = sig.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.hash(F.slice("sig", b * rows + F.lit(1), F.lit(rows))),
            )
        ).alias("band", "bucket"),
    )
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
    cand_ids = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .union(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    sh = df.join(cand_ids, "doc_id", "left_semi").select(
        "doc_id", shingles_col(n, col).alias("sh")
    )
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


def simhash(df: DataFrame, bits: int = 64, col: str = "text") -> DataFrame:
    """doc_id, simhash — per-token xxhash64, per-bit majority vote.

    64-bit by default: at 10^12 documents a 32-bit fingerprint collides by
    birthday (~2^16 docs per bucket), flooding the band join with false
    candidates; 64-bit is the standard width.

    ONE fold over the token array: each token hashed once and expanded to a
    +1/-1 vote vector merged with zip_with; the vote vector folds to the
    fingerprint by binary doubling (no per-bit shiftleft, no k-fold
    re-tokenization).  For bits > 32 the fold packs two 32-bit halves and
    recombines bitwise — a single acc*2 chain through bit 63 would overflow
    LongType under ANSI arithmetic.  No explode, no shuffle, no UDF.
    """
    init = F.array(*[F.lit(0).cast("long")] * bits)

    def merge(acc, h):
        votes = F.array(
            *[
                F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1)
                .otherwise(-1)
                .cast("long")
                for b in range(bits)
            ]
        )
        return F.zip_with(acc, votes, lambda a, v: a + v)

    base = df.select("doc_id", tokens_col(col).alias("_t"))
    hashed = F.transform("_t", lambda t: F.xxhash64(t))
    votes = F.aggregate(hashed, init, merge)

    def pack(vslice):
        # bit b of the fingerprint = votes[b] > 0; recombine MSB-first so
        # that acc*2 + bit reproduces sum(bit_b << b)
        return F.aggregate(
            F.reverse(vslice),
            F.lit(0).cast("long"),
            lambda acc, v: acc * 2 + F.when(v > 0, 1).otherwise(0),
        )

    if bits <= 32:
        sig = pack(votes)
    else:
        lo = pack(F.slice(votes, 1, 32))
        hi = pack(F.slice(votes, 33, bits - 32))
        sig = F.shiftleft(hi, 32).bitwiseOR(lo)
    return base.select("doc_id", sig.alias("simhash"))


def simhash_pairs(
    df: DataFrame, max_hamming: int = 3, bits: int = 64, col: str = "text"
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming.

    Band join: the fingerprint split into bits/8 bytes; by pigeonhole a
    pair within hamming (bits/8 - 1) — i.e. <= 7 at 64-bit — agrees on
    >= 1 byte -> join per byte-band, then verify with bit_count.
    Output: doc_a, doc_b, hamming.
    """
    n_bands = bits // 8
    sig = simhash(df, bits=bits, col=col)
    chunk_structs = [
        F.struct(
            F.lit(i).alias("band"),
            F.shiftright("simhash", i * 8).bitwiseAND(F.lit(0xFF)).alias("chunk"),
        )
        for i in range(n_bands)
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
