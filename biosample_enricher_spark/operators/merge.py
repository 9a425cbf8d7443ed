"""Batch MERGE (upsert/delete apply) — the warehouse mutation primitive.

``merge_upsert`` applies a keyed change set to a base snapshot and
returns the next snapshot: MERGE INTO semantics (Delta/Iceberg MERGE,
SQL:2003 MERGE) built from first principles on joins —
``WHEN MATCHED AND op='delete' THEN DELETE / WHEN MATCHED THEN UPDATE
/ WHEN NOT MATCHED AND op<>'delete' THEN INSERT`` collapses to:

    result = (base ANTI-JOIN changes.keys) ∪ changes[op='upsert']

because an upsert row replaces the matched base row entirely (full-row
semantics — partial-column updates are the caller's job to assemble),
a delete row just removes it, and an unmatched upsert inserts. One
hash anti-join (the change set is typically ≪ base, so AQE broadcasts
it) plus a union — linear, no window, no skew term beyond the key
histogram of the CHANGES side only.

Reference analog: the enrichment-merge semantics of the reference's
best-of-providers update flow (adapters.py:327-338) — set-based
replace-or-insert, never row-at-a-time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OPS = ("upsert", "delete")


def merge_upsert(
    base: DataFrame,
    changes: DataFrame,
    keys: list[str],
    op_col: str = "op",
) -> DataFrame:
    """Apply ``changes`` (base's columns + ``op_col`` in
    {'upsert','delete'}) to ``base`` and return the merged snapshot
    with base's schema.

    Keys must be unique in ``changes`` (one verdict per key per
    batch — the caller compacts multi-change batches first, e.g. by
    latest-wins W1 selection); base keys may be anything (every
    occurrence of a changed key is replaced/removed, so a non-unique
    base converges to change-set cardinality for touched keys).
    """
    if op_col not in changes.columns:
        raise ValueError(f"changes is missing op column {op_col!r}")
    base_cols = [c for c in changes.columns if c != op_col]
    if sorted(base_cols) != sorted(base.columns):
        raise ValueError(
            f"changes columns {sorted(base_cols)} != base {sorted(base.columns)}"
        )
    untouched = base.join(
        changes.select(*keys).distinct(), on=keys, how="left_anti"
    )
    # Fail fast on unknown op values (ADVICE r5): an unrecognized op
    # (e.g. a typo'd 'update') would be removed from base by the
    # anti-join but re-inserted by neither branch — silent DELETE
    # semantics for a malformed row. raise_error inside the upsert
    # filter keeps this a single distributed pass (no driver count);
    # ANSI-safe because the branch only evaluates on non-OPS rows.
    op = F.col(op_col)
    checked = F.when(op.isin(*OPS), op).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"merge_upsert: unknown {op_col} value "),
                F.coalesce(op, F.lit("NULL")),
                F.lit(f" (expected one of {OPS})"),
            )
        )
    )
    upserts = (
        changes.withColumn(op_col, checked)
        .where(F.col(op_col) == "upsert")
        .select(*base.columns)
    )
    return untouched.unionByName(upserts)
