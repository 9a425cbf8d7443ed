"""Frequent-item (heavy-hitter) detection at corpus scale.

Two-pass candidate/verify design — the pattern that makes exact heavy
hitters affordable at 100 TB:

1. **Candidate pass** (``mg_partition_candidates``): one scan, zero
   shuffle. Each partition folds its Arrow batches into a bounded
   Misra-Gries summary (``cap`` counters) and emits only the surviving
   tokens. MG summaries are mergeable with additive error (Agarwal,
   Cormode, Huang, Phillips, Wei, Yi — "Mergeable Summaries", PODS
   2012, public literature): folding a batch in and trimming to
   ``cap`` counters by subtracting the (cap+1)-th largest count
   removes ≥ (cap+1)·cut mass per trim, so the cumulative undercount
   D of any token obeys D ≤ n_p/(cap+1) for a partition of n_p
   tokens. Hence every token with partition share > 1/(cap+1)
   survives; since a global token with count > N/k must exceed share
   1/k in ≥1 partition (weighted pigeonhole), ``cap ≥ k`` makes the
   union of per-partition survivors a guaranteed SUPERSET of the
   global heavy hitters.

2. **Verify pass** (``heavy_hitters``): exact counts of candidates
   only — a broadcast semi-join keeps the groupBy's shuffle bounded by
   |candidates| × partitions instead of |distinct tokens| ×
   partitions — then the exact integer threshold ``cnt·k > N``.
   Because pass 1 is a superset and pass 2 is exact, the output is
   EXACTLY the set a full groupBy would produce (deterministic,
   SQL-oracle-matchable), at a fraction of the shuffle.

Reference analog: the reference's mode/histogram statistics
(``/root/reference/biosample_enricher/schema_statistics.py``) compute
value frequencies eagerly per field; this module is the
bounded-memory, bounded-shuffle form of the same question.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def mg_partition_candidates(
    tokens: DataFrame, token_col: str = "token", cap: int = 4096
) -> DataFrame:
    """Per-partition Misra-Gries survivors (see module docstring for
    the superset guarantee). Vectorized: per-batch ``value_counts``
    folded into a running Series; the per-item classic MG loop never
    runs. Returns a single-column ``token`` frame of at most ``cap``
    tokens per input partition — ZERO shuffle. Tokens may repeat
    across partitions; dedup happens for free wherever the frame is
    consumed (the broadcast hash relation in ``heavy_hitters`` hashes
    keys uniquely), so no ``.distinct()`` shuffle is spent here.

    The output schema MIRRORS the input token column's dtype (r6,
    ADVICE follow-up): the first fix cast the fact side to string at
    the join, but pandas ``astype(str)`` and Spark's cast render
    booleans/doubles differently ('True' vs 'true', '1e+20' vs
    '1.0E20'), silently emptying the candidate match for those dtypes.
    Keeping the native dtype end-to-end removes every coercion."""
    dtype = tokens.schema[token_col].dataType

    def per_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts: pd.Series | None = None
        for pdf in batches:
            vc = pdf[token_col].dropna().value_counts()
            if vc.empty:
                continue
            counts = vc if counts is None else counts.add(vc, fill_value=0)
            if len(counts) > cap:
                # trim: subtract the (cap+1)-th largest from all, drop
                # non-positive. Mass removed ≥ (cap+1)·cut (the top
                # cap+1 counters each lose cut), giving Σcut ≤
                # n_p/(cap+1) — the mergeable-summaries bound.
                cut = counts.nlargest(cap + 1).iloc[-1]
                counts = counts - cut
                counts = counts[counts > 0]
        if counts is not None and len(counts):
            yield pd.DataFrame({"token": counts.index})

    schema = T.StructType([T.StructField("token", dtype)])
    return tokens.mapInPandas(per_partition, schema)


def heavy_hitters(
    tokens: DataFrame,
    token_col: str = "token",
    k: int = 50,
    cap: int = 4096,
    broadcast_candidates: bool = True,
) -> DataFrame:
    """Exact global heavy hitters: tokens with ``count·k > N`` over a
    single-column token frame, via the two-pass MG candidate/verify
    plan (module docstring). ``cap ≥ k`` is required for the
    candidate-superset guarantee. Returns
    ``(token, cnt, n_total, share)`` — ``share`` is one exact integer
    division, so verdicts and values are bit-identical to any ANSI-SQL
    oracle's plain ``GROUP BY ... HAVING cnt*k > N``.

    **Broadcast bound**: the candidate relation is at most
    ``cap × input_partitions`` tokens (duplicates across partitions
    collapse in the broadcast hash relation), so the forced broadcast
    is safe while that product stays driver/executor-sized — e.g.
    cap 4096 × 10⁴ partitions ≈ 4×10⁷ keys is the practical ceiling.
    On a 100 TB corpus with ~10⁵ input partitions either raise the
    per-partition trim (smaller cap) or pass
    ``broadcast_candidates=False`` to fall back to a shuffled semi
    join — same result, bounded memory."""
    if cap < k:
        raise ValueError(f"cap ({cap}) must be >= k ({k}) for the superset bound")
    toks = tokens.select(F.col(token_col).alias("token")).where(
        F.col("token").isNotNull()
    )
    # the candidate frame mirrors the fact column's dtype (see
    # mg_partition_candidates), so the semi-join compares equal types
    # natively — no bigint↔string (ADVICE r5) or string-rendering
    # coercion anywhere, and output keeps the input dtype
    cand = mg_partition_candidates(toks, "token", cap)
    if broadcast_candidates:
        cand = F.broadcast(cand)
    else:
        cand = cand.distinct()
    n_total = toks.agg(F.count(F.lit(1)).alias("n_total"))
    exact = (
        toks.join(cand, "token", "left_semi")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        exact.crossJoin(F.broadcast(n_total))
        .where(F.col("cnt") * F.lit(int(k)) > F.col("n_total"))
        .select(
            "token",
            "cnt",
            "n_total",
            (F.col("cnt") / F.col("n_total")).alias("share"),
        )
    )


def _cms_bucket(j, key, width: int):
    """Portable Count-Min row hash: first 8 hex chars of
    ``md5(j ':' key)`` parsed as a 32-bit integer, mod ``width`` —
    the mix_corpus/p11 md5-threshold idiom, reproducible bit-for-bit
    in any engine with md5 (the ANSI-SQL oracle uses the identical
    string)."""
    return (
        F.conv(
            F.substring(F.md5(F.concat_ws(":", j, key)), 1, 8), 16, 10
        ).cast("bigint")
        % F.lit(int(width))
    )


def countmin_sketch(
    items: DataFrame, key_col: str = "token", depth: int = 3, width: int = 64
) -> DataFrame:
    """Build a Count-Min sketch over an item stream: each item is
    counted into ``depth`` hashed buckets; returns the
    ``(j, bucket, bucket_n)`` cell frame (≤ depth·width rows).

    This is the frequency-sketch family member beside a2's HLL
    (distinct) and a24's Misra-Gries (heavy hitters): the aggregate
    state is FIXED-SIZE — ``depth × width`` counters — independent of
    key cardinality, and cells are mergeable by plain addition
    (sketch(A ∪ B) = sketch(A) + sketch(B) cell-wise, pinned in
    tests/test_r5h_ops.py). At 10^12 events the groupBy's map-side
    combine collapses every partition to ≤ depth·width partial rows,
    so the shuffle carries ≤ depth·width·partitions tiny rows and the
    reducer state is constant — count(DISTINCT)-free frequency
    estimates for ANY later-arriving query key (Cormode & Muthukrishnan
    2005, public literature).

    Reference analog: the eager value-frequency maps of
    schema_statistics.py, replaced by a bounded-memory mergeable
    summary."""
    exploded = items.where(F.col(key_col).isNotNull()).select(
        F.col(key_col).alias("k"),
        F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("j"),
    )
    return (
        exploded.select("j", _cms_bucket(F.col("j"), F.col("k"), width).alias("bucket"))
        .groupBy("j", "bucket")
        .agg(F.count(F.lit(1)).alias("bucket_n"))
    )


def countmin_estimates(
    items: DataFrame,
    keys: DataFrame,
    key_col: str = "token",
    depth: int = 3,
    width: int = 64,
) -> DataFrame:
    """Point-estimate frequencies for ``keys`` from a Count-Min sketch
    of ``items``: est(k) = min over the sketch's ``depth`` rows of the
    cell ``k`` hashes to. Structural guarantee est ≥ true count (every
    cell containing k's increments at least), expected overcount
    ≤ e·N/width per the CM bound. The sketch cell frame (≤ depth·width
    rows) is broadcast, so estimating any number of keys costs one
    scan of ``keys`` and zero extra shuffle.

    Empty cells count as 0 (left join + coalesce): a queried key the
    stream never saw whose cells are all collision-free estimates 0,
    exactly as the counter-array formulation does — an inner join
    would silently DROP the empty cell from the min and overestimate
    absent keys (pinned in tests/test_r5h_ops.py).

    NULL keys are EXCLUDED from the output (as they are from the
    sketch): ``concat_ws`` silently drops a null operand, so a NULL
    key would otherwise hash as the bare row-index string and return
    a spurious collision-mass estimate while the documented
    ``CAST(j)||':'||CAST(key)`` oracle idiom yields NULL — a silent
    cross-engine hash divergence (pinned in tests/test_r5h_ops.py)."""
    sketch = countmin_sketch(items, key_col, depth, width)
    kj = keys.where(F.col(key_col).isNotNull()).select(
        F.col(key_col).alias("k"),
        F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("j"),
    ).select("k", "j", _cms_bucket(F.col("j"), F.col("k"), width).alias("bucket"))
    return (
        kj.join(F.broadcast(sketch), ["j", "bucket"], "left")
        .groupBy("k")
        .agg(F.min(F.coalesce("bucket_n", F.lit(0))).alias("est_n"))
        .select(F.col("k").alias(key_col), "est_n")
    )
