"""Deduplication operators for training-data pipelines.

Four tiers, cheapest first:

1. **Exact** — hash-groupBy on a canonical fingerprint. One shuffle,
   map-side combined.
2. **N-gram Jaccard** — word-shingle sets; candidate pairs restricted
   to shingle-sharing docs (inverted-index join), exact Jaccard on the
   candidates only.
3. **MinHash + LSH** — fixed-size signatures, banded into buckets;
   bucket-equijoin yields candidates with tunable recall at
   O(bands × docs) shuffle instead of O(docs²).
4. **SimHash** — 64-bit near-dup signature via per-token hash bit
   voting; Hamming-adjacent buckets for candidates.

Everything is DataFrame ops + one vectorized Arrow UDF (simhash bit
vote); no per-row Python. At 100 TB the LSH path is the scale path:
its shuffle volume is #docs × #bands rows of (band_hash), and the
pair-verify join only touches colliding buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from .text import fingerprint, normalize_for_fingerprint

# --- 1. exact dedup ----------------------------------------------------------


def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Groups of docs sharing a canonical fingerprint (size > 1):
    (fp, n_docs, doc_ids sorted). Keep-first policy = min(id)."""
    return (
        df.select(F.col(id_col).alias("doc_id"), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("keep_id"),
        )
        .where(F.col("n_docs") > 1)
    )


# --- 2. shingles + exact jaccard on candidates -------------------------------


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of the canonical text."""
    words = F.split(normalize_for_fingerprint(text), " ")
    k = F.size(words) - (n - 1)
    grams = F.when(
        k >= 1,
        F.transform(
            F.sequence(F.lit(1), k),
            lambda i: F.concat_ws(" ", F.slice(words, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams)


def jaccard_candidates(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, threshold: float = 0.5
) -> DataFrame:
    """Near-dup pairs by exact n-gram Jaccard, candidate-pruned via an
    inverted shingle index: only doc pairs sharing ≥1 shingle are
    compared, and |A∩B| is counted by the index join itself — no
    per-pair set intersection. Returns (id_a, id_b, jaccard) with
    id_a < id_b and jaccard ≥ threshold."""
    shingled = df.select(
        F.col(id_col).alias("doc_id"),
        word_shingles(F.col(text_col), n).alias("sh"),
    ).where(F.size("sh") > 0)
    sizes = shingled.select("doc_id", F.size("sh").alias("n_sh"))
    index = shingled.select("doc_id", F.explode("sh").alias("shingle"))
    a = index.alias("a")
    b = index.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (F.col("n_inter")
             / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


# --- 3. MinHash + LSH ---------------------------------------------------------


def minhash_signature(text: Column, num_hashes: int = 64, shingle_n: int = 3) -> Column:
    """MinHash signature: for hash function i, min over shingles of
    xxhash64(shingle, i). Pure expressions — the per-i minimum is an
    array transform + array_min, all JVM-side."""
    sh = word_shingles(text, shingle_n)
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(F.transform(sh, lambda g: F.xxhash64(g, i))),
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """Near-dup candidate pairs from banded MinHash.

    Docs agreeing on all rows of any band collide. Shuffle cost:
    #docs × #bands small rows; join cost limited to colliding buckets.
    Returns distinct (id_a, id_b), id_a < id_b.
    """
    rows_per_band = num_hashes // bands
    sig = df.select(
        F.col(id_col).alias("doc_id"),
        minhash_signature(F.col(text_col), num_hashes, shingle_n).alias("sig"),
    ).where(F.size("sig") > 0)
    banded = sig.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                            lambda v: v.cast("string"),
                        ),
                    )
                ),
            )
        ).alias("band", "bucket"),
    )
    x = banded.alias("x")
    y = banded.alias("y")
    return (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("id_a"), F.col("y.doc_id").alias("id_b"))
        .distinct()
    )


def minhash_near_duplicates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.7,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
) -> DataFrame:
    """LSH candidates verified by exact Jaccard on shingle sets:
    (id_a, id_b, jaccard ≥ threshold)."""
    cands = lsh_candidate_pairs(df, id_col, text_col, num_hashes, bands, shingle_n)
    shingled = df.select(
        F.col(id_col).alias("doc_id"),
        word_shingles(F.col(text_col), shingle_n).alias("sh"),
    )
    a = shingled.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = shingled.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    verified = (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b"))
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
    return verified


# --- 4. SimHash ---------------------------------------------------------------


@pandas_udf(T.LongType())
def _simhash_from_tokens(tokens: pd.Series) -> pd.Series:
    """64-bit SimHash from token lists: per-token xxhash-free numpy
    hashing (stable across runs: hash = md5-low64 of token) with ±1 bit
    voting, vectorized per batch."""
    import hashlib

    out = np.zeros(len(tokens), dtype=np.int64)
    for i, toks in enumerate(tokens):
        if toks is None or len(toks) == 0:
            out[i] = 0
            continue
        hs = np.fromiter(
            (
                int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "little")
                for t in toks
            ),
            dtype=np.uint64,
            count=len(toks),
        )
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int32)
        votes = (2 * bits - 1).sum(axis=0)
        sig = np.uint64(0)
        for b in np.flatnonzero(votes > 0):
            sig |= np.uint64(1) << np.uint64(b)
        out[i] = np.int64(sig)
    return pd.Series(out)


def simhash(text: Column) -> Column:
    tokens = F.split(normalize_for_fingerprint(text), " ")
    return _simhash_from_tokens(tokens)


def simhash_near_duplicates(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs with Hamming(simhash) ≤ max_hamming, candidate-
    bucketed on 16-bit signature quarters (a pair within Hamming 3 must
    agree on ≥1 of 4 quarters — pigeonhole), then verified exactly."""
    sig = df.select(F.col(id_col).alias("doc_id"), simhash(F.col(text_col)).alias("sig"))
    quarters = sig.select(
        "doc_id",
        "sig",
        F.posexplode(
            F.array(*[
                F.shiftrightunsigned("sig", q * 16).bitwiseAND(F.lit(0xFFFF))
                for q in range(4)
            ])
        ).alias("q", "qval"),
    )
    x = quarters.alias("x")
    y = quarters.alias("y")
    cands = (
        x.join(
            y,
            (F.col("x.q") == F.col("y.q"))
            & (F.col("x.qval") == F.col("y.qval"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("id_a"),
            F.col("y.doc_id").alias("id_b"),
            F.col("x.sig").alias("sig_a"),
            F.col("y.sig").alias("sig_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return cands.select("id_a", "id_b", hamming.alias("hamming")).where(
        F.col("hamming") <= max_hamming
    )
