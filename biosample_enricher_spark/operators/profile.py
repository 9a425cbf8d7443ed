"""Schema profiler: per-field-path coverage, type histogram, and
example values over an arbitrary (possibly nested) DataFrame.

Spark re-expression of the reference's Compass-like field statistics
(``/root/reference/biosample_enricher/schema_statistics.py:68-153``):
the reference walks every document recursively, accumulating per-path
``{docs_with_field, types Counter, examples, array_elem_types}``; here
the schema is static, so the path set is derived from ``df.schema`` and
all paths are profiled in ONE wide aggregation (plus one aggregation
per array-of-struct branch over its exploded elements). Runtime type
histograms collapse to {declared type, null} — heterogeneous typing is
impossible in a typed table, which is itself the first schema
guarantee the engine enforces.

Output (mirrors the reference's CSV columns,
``schema_statistics.py:125-153``)::

    field_path | coverage_pct | present_docs | total_docs | dtype | examples
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _leaf_paths(schema: T.StructType, prefix: str = "") -> list[tuple[str, T.DataType]]:
    out: list[tuple[str, T.DataType]] = []
    for field in schema.fields:
        path = f"{prefix}{field.name}"
        dt = field.dataType
        if isinstance(dt, T.StructType):
            out.extend(_leaf_paths(dt, prefix=f"{path}."))
        else:
            out.append((path, dt))
    return out


def _examples_expr(col: Column, k: int) -> Column:
    return F.slice(
        F.array_sort(F.collect_set(col.cast("string"))), 1, k
    )


def _profile_frame(
    df: DataFrame,
    paths: list[tuple[str, T.DataType]],
    total: Column,
    k: int,
    path_prefix: str = "",
) -> DataFrame:
    aggs: list[Column] = [F.count(F.lit(1)).alias("_total")]
    for i, (path, _) in enumerate(paths):
        c = F.col(path)
        aggs.append(F.count(c).alias(f"_present_{i}"))
        aggs.append(_examples_expr(c, k).alias(f"_examples_{i}"))
    wide = df.agg(*aggs)

    rows = []
    for i, (path, dt) in enumerate(paths):
        rows.append(
            F.struct(
                F.lit(path_prefix + path).alias("field_path"),
                F.lit(dt.simpleString()).alias("dtype"),
                F.col(f"_present_{i}").alias("present_docs"),
                F.col("_total").alias("total_docs"),
                F.col(f"_examples_{i}").alias("examples"),
            )
        )
    return wide.select(F.explode(F.array(*rows)).alias("r")).select(
        "r.field_path",
        F.round(F.col("r.present_docs") / F.col("r.total_docs") * 100, 4).alias(
            "coverage_pct"
        ),
        "r.present_docs",
        "r.total_docs",
        "r.dtype",
        # serialized to one JSON string: keeps the row hashable by
        # pandas-based result canonicalizers (sorting an array<string>
        # column raises "unhashable type: 'list'")
        F.to_json(F.col("r.examples")).alias("examples"),
    )


def schema_profile(df: DataFrame, max_examples: int = 3) -> DataFrame:
    """Profile every leaf path; array-of-struct branches are profiled
    over their exploded elements with ``path[].`` prefixes (the
    reference's array_elem_types analog,
    ``schema_statistics.py:99-103``)."""
    top_paths: list[tuple[str, T.DataType]] = []
    frames: list[DataFrame] = []

    for path, dt in _leaf_paths(df.schema):
        top_paths.append((path, dt))

    frames.append(
        _profile_frame(df, top_paths, F.count(F.lit(1)), max_examples)
    )

    # array-of-struct branches: one exploded profile per branch
    def array_branches(schema: T.StructType, prefix: str = ""):
        for field in schema.fields:
            path = f"{prefix}{field.name}"
            dt = field.dataType
            if isinstance(dt, T.ArrayType) and isinstance(dt.elementType, T.StructType):
                yield path, dt.elementType
            elif isinstance(dt, T.StructType):
                yield from array_branches(dt, prefix=f"{path}.")

    for path, elem_schema in array_branches(df.schema):
        elems = df.select(F.explode(path).alias("_e"))
        sub_paths = [
            (f"_e.{p}", dt) for p, dt in _leaf_paths(elem_schema)
        ]
        frame = _profile_frame(
            elems, sub_paths, F.count(F.lit(1)), max_examples
        )
        frame = frame.withColumn(
            "field_path",
            F.concat(
                F.lit(f"{path}[]."),
                F.expr("substring(field_path, 4)"),
            ),
        )
        frames.append(frame)

    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.orderBy("field_path")


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    fingerprint: Column,
) -> DataFrame:
    """Row-level diff of two versions of a keyed table: one row per
    key present in either version, with ``status`` in {'added',
    'removed', 'changed', 'unchanged'} — the snapshot-comparison audit
    behind "what did this pipeline run change" (the validation-suite
    sibling of v4_table_fingerprint: v4 answers *whether* two tables
    differ in one checksum row, this answers *where*).

    ``fingerprint`` is a Column evaluated against each side's rows
    (caller decides portability: exact-integer casts for floats, etc.
    — the same cents discipline as v1). A NULL fingerprint is a
    legitimate value: presence is tracked by explicit per-side marker
    columns, never inferred from fingerprint nullness, and two NULL
    fingerprints compare 'unchanged' / NULL-vs-non-NULL compares
    'changed' (null-safe ``eqNullSafe``). Keys must be unique per
    side (a versioned table's primary key); equality of fingerprints
    is equality of compared content.

    Scale shape: one full-outer sort-merge join hash-partitioned on
    the key — linear, no skew term beyond the key distribution itself
    (a hot key violates the uniqueness precondition). Both scans
    prune to key + fingerprint inputs only.
    """
    for side, df in (("old", old), ("new", new)):
        for c in ("_fp_old", "_fp_new", "_in_old", "_in_new"):
            if c in df.columns:
                raise ValueError(f"{side} side carries reserved column {c!r}")
    o = old.select(
        *keys, fingerprint.alias("_fp_old"), F.lit(True).alias("_in_old")
    )
    n = new.select(
        *keys, fingerprint.alias("_fp_new"), F.lit(True).alias("_in_new")
    )
    joined = o.join(n, on=keys, how="full_outer")
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(
            F.col("_fp_old").eqNullSafe(F.col("_fp_new")), F.lit("unchanged")
        )
        .otherwise(F.lit("changed"))
    )
    return joined.select(*keys, status.alias("status"))


def range_checksums(
    df: DataFrame,
    key_col: str,
    fingerprint: Column,
    range_width: int,
) -> DataFrame:
    """Per-key-range reconciliation summary: ``(range_id, n_rows,
    fp_sum)`` with ``range_id = key div range_width`` and ``fp_sum``
    the plain BIGINT sum of a 48-bit integer row fingerprint (first
    12 hex chars of md5 over ``fingerprint``) — an order-independent,
    mergeable, overflow-safe checksum (2^48 · rows ≪ 2^63 up to ~3·10^4
    rows per range; widen ranges → use fewer hex chars or a DECIMAL
    sum). The Merkle-tree idea flattened to one level: comparing two
    tables ships |keys|/range_width summary rows instead of |keys|
    rows, and only differing ranges escalate to v8's row-level diff."""
    fp48 = F.conv(F.substring(F.md5(fingerprint), 1, 12), 16, 10).cast("long")
    return (
        df.select(
            F.expr(f"{key_col} div {range_width}").alias("range_id"),
            fp48.alias("fp48"),
        )
        .groupBy("range_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("fp48").alias("fp_sum"),
        )
    )


def range_checksum_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str,
    fingerprint: Column,
    range_width: int,
) -> DataFrame:
    """Which key ranges differ between two table versions — the
    escalation ladder between v4_table_fingerprint (one checksum row:
    *whether* anything changed) and v8's snapshot_diff (row-level:
    *which keys* changed): this answers *where*, shipping only
    ``#keys / range_width`` summary rows per side. Full-outer join of
    the two range-summary frames; a range present on one side only,
    or with differing (n_rows, fp_sum), is emitted. The checksum sum
    is order-independent, so partial summaries merge map-side and the
    shuffle carries range summaries, never rows."""
    o = range_checksums(old, key_col, fingerprint, range_width)
    n = range_checksums(new, key_col, fingerprint, range_width)
    oo = o.select(
        "range_id",
        F.col("n_rows").alias("n_old"),
        F.col("fp_sum").alias("sum_old"),
    )
    nn = n.select(
        "range_id",
        F.col("n_rows").alias("n_new"),
        F.col("fp_sum").alias("sum_new"),
    )
    j = oo.join(nn, "range_id", "full_outer").select(
        "range_id",
        F.coalesce("n_old", F.lit(0)).alias("n_old"),
        F.coalesce("n_new", F.lit(0)).alias("n_new"),
        F.coalesce("sum_old", F.lit(0)).alias("sum_old"),
        F.coalesce("sum_new", F.lit(0)).alias("sum_new"),
    )
    return j.where(
        (F.col("n_old") != F.col("n_new")) | (F.col("sum_old") != F.col("sum_new"))
    )
