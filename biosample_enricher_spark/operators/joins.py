"""Skew-mitigating join strategies.

``salted_join`` is the classic remedy for a hot join key: a plain
``fact JOIN dim ON k`` hash-partitions both sides on ``k``, so every
fact row carrying the hot key lands on ONE reducer — the straggler
that dominates the stage at 100 TB (the same skew v3_key_skew_profile
exists to detect, and the join-side sibling of the salted two-stage
aggregation in constraints/core.py:103-125). Salting spreads the hot
key across ``n_salts`` reducers: the (unique-keyed) dim side is
replicated once per salt value, each fact row routes to ONE
deterministic salt shard, and the join key becomes ``(k, salt)`` —
same matches, ``n_salts``-way parallel hot key.

Cost model: the dim side is duplicated ``n_salts`` times (shuffle
weight ``n_salts × |dim|``) in exchange for bounding any single
reducer at ``≈ |hot| / n_salts``. Worth it exactly when the dim side
is too big to broadcast (broadcast makes skew moot — no shuffle at
all) yet far smaller than the fact side. AQE's skew-join splitting
(``spark.sql.adaptive.skewJoin``) solves the same problem at runtime;
this operator is the explicit, planner-independent form, and the two
compose (AQE sees the salted key's near-uniform histogram).

Correctness argument: for an equi-join on a key on which ``dim`` is
unique, every fact row matches at most one dim row; the replicated
dim carries that row under every salt, and the fact row meets it in
its own shard — the multiset of joined rows is identical to the
unsalted join (pinned by tests/test_joins.py equality tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt_"


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_on: list[str],
    n_salts: int = 8,
    how: str = "inner",
    force_shuffle: bool = True,
) -> DataFrame:
    """Equi-join ``fact`` to ``dim`` on ``key`` with an ``n_salts``-way
    salted key.

    ``dim`` MUST be unique on ``key`` (replicating a non-unique dim
    would still be correct — every copy pairs inside one shard only —
    but the skew rationale assumes a dim). ``salt_on`` names fact
    columns that vary per row (e.g. a line number); the salt is
    ``pmod(xxhash64(salt_on...), n_salts)`` — deterministic, so plans
    stay reproducible under retries (a ``rand()`` salt would also be
    correct for inner joins but breaks task-retry determinism).

    ``force_shuffle`` adds a ``shuffle_merge`` hint on the dim side so
    the salted path is exercised even when the test-scale dim would
    auto-broadcast (at the target scale the dim exceeds the broadcast
    threshold and the hint is a no-op in spirit).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if n_salts < 1:
        # pmod(x, 0) is a mid-job arithmetic error under ANSI and a
        # silent NULL salt (empty inner join) without it — fail early.
        raise ValueError(f"n_salts must be >= 1, got {n_salts}")
    for side, df in (("fact", fact), ("dim", dim)):
        if SALT_COL in df.columns:
            raise ValueError(
                f"{side} side already carries reserved column {SALT_COL!r}"
            )
    f_salted = fact.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*[F.col(c) for c in salt_on]), F.lit(n_salts))
    )
    d_rep = dim.withColumn(
        SALT_COL,
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<long>")),
    )
    if force_shuffle:
        d_rep = d_rep.hint("shuffle_merge")
    joined = f_salted.join(d_rep, on=[key, SALT_COL], how=how)
    return joined.drop(SALT_COL)
