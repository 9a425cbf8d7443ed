"""Staged funnel analysis: first stage-1 event, then first stage-2
event AFTER it, then first stage-3 event after THAT, per user — the
product-analytics conversion chain. The ordered-causality constraint
(each stage must follow the previous stage's timestamp) is what
separates this from three independent mins.

Plan shape: each stage is a selective scan filter + keyed aggregate,
chained by equi-joins on the user key — k−1 bounded shuffles of
per-user rows, never a per-user event collect or a row-by-row pattern
scan. Driver query ``fn1_funnel_stages`` oracles the 3-stage form
against DuckDB; causality traps (stage-2 events BEFORE stage 1 must
not count) are pinned in tests/test_suite_ops.py on planted data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_stages(
    events: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    stages: tuple[str, ...],
) -> DataFrame:
    """One row per user who reached stage 1: the first-event timestamp
    of every stage reached (``t_<stage>`` columns, null once the chain
    breaks) plus ``stage`` — how deep the user got (1..len(stages))."""
    if len(stages) < 2:
        raise ValueError("funnel needs at least 2 stages")
    if len(set(stages)) != len(stages):
        raise ValueError("stage names must be unique")
    clash = [c for c in events.columns if c in {f"t_{s}" for s in stages}]
    if clash:
        raise ValueError(
            f"events columns collide with stage outputs: {clash}"
        )
    cur = (
        events.where(F.col(type_col) == stages[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias(f"t_{stages[0]}"))
    )
    frames = [cur]
    for prev, name in zip(stages, stages[1:]):
        cur = (
            events.where(F.col(type_col) == name)
            .join(cur.select(user_col, f"t_{prev}"), user_col)
            .where(F.col(ts_col) > F.col(f"t_{prev}"))
            .groupBy(user_col)
            .agg(F.min(ts_col).alias(f"t_{name}"))
        )
        frames.append(cur)
    out = frames[0]
    for f in frames[1:]:
        out = out.join(f, user_col, "left")
    depth = F.lit(1)
    for name in stages[1:]:
        depth = depth + F.when(F.col(f"t_{name}").isNotNull(), 1).otherwise(0)
    return out.select(
        user_col, *[f"t_{s}" for s in stages], depth.cast("long").alias("stage")
    )
