"""Sequence packing + snapshot-fingerprint operators (r5c).

``chunk_pack`` maps documents onto fixed-width training chunks by a
scalable two-level prefix sum; ``table_fingerprint`` reduces a table to
an order-independent checksum row for snapshot reconciliation. Both are
pure Column-expression plans (JVM-side, no Python in the hot path) and
both have exact DuckDB oracles in the driver registry
(``queries.py x9_chunk_pack / v4_table_fingerprint``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def _idiv(a: Column, b: int) -> Column:
    """Exact integral division of a non-negative long by a positive
    int via the SQL ``div`` operator (long in, long out) —
    ``F.floor(a / b)`` goes through DOUBLE division, which silently
    loses integer precision past 2^53; a DuckDB oracle written with
    the same float path would drift identically, hiding it from
    parity (its exact twin is the ``//`` operator)."""
    return F.call_function("div", a, F.lit(b).cast("long"))


def chunk_pack(
    df: DataFrame,
    id_col: str,
    group_col: str,
    tokens_col: str,
    chunk_size: int = 512,
    block: int = 128,
) -> DataFrame:
    """Assign each row to the fixed-width token chunks it occupies when
    rows are concatenated per ``group_col`` in ``id_col`` order.

    Returns ``(id_col, group_col, tokens_col, first_chunk, last_chunk,
    n_chunks)`` for rows with a positive token count (zero-token rows
    occupy no chunk).

    The textbook form is one running sum per group — which serializes
    each group into a single partition. This is the two-level form
    instead (same shape as the a26 sequence-gap audit): intra-block
    cumsums over ``(group, id div block)`` windows run fully
    parallel, and block offsets come from a window over the per-block
    totals frame, which joins back WITHOUT a forced broadcast hint —
    its cardinality is |id range| / block per group (≈|rows|/block
    for dense ids, but degenerating toward |rows| for sparse
    snowflake-style ids), so AQE picks broadcast when it is actually
    small rather than being ordered to at any size. Size ``block`` so
    the offsets frame stays manageable for the id density at hand.
    The result is independent of ``block`` and of input partitioning;
    all chunk arithmetic is exact integral division (``_idiv`` — no
    float surface at any magnitude).
    """
    d = df.select(id_col, group_col, tokens_col).where(F.col(tokens_col) > 0)
    blk = d.withColumn("_blk", _idiv(F.col(id_col), block))
    w_intra = (
        W.partitionBy(group_col, "_blk")
        .orderBy(id_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    intra = blk.withColumn(
        "_icum", F.sum(tokens_col).over(w_intra) - F.col(tokens_col)
    )
    blk_tot = blk.groupBy(group_col, "_blk").agg(
        F.sum(tokens_col).alias("_bt")
    )
    w_blk = (
        W.partitionBy(group_col)
        .orderBy("_blk")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    offs = blk_tot.withColumn(
        "_boff", F.coalesce(F.sum("_bt").over(w_blk), F.lit(0))
    ).select(group_col, "_blk", "_boff")
    start = F.col("_boff") + F.col("_icum")
    first = _idiv(start, chunk_size)
    last = _idiv(start + F.col(tokens_col) - 1, chunk_size)
    return intra.join(offs, [group_col, "_blk"]).select(
        id_col,
        group_col,
        tokens_col,
        first.cast("long").alias("first_chunk"),
        last.cast("long").alias("last_chunk"),
        (last - first + 1).cast("long").alias("n_chunks"),
    )


def zorder_key(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton/Z-order interleave of the low ``bits`` of two non-negative
    integer Columns into one sortable long — the space-filling-curve
    layout key behind Delta/Iceberg Z-ORDER, built from first
    principles as pure integer expressions (constant-amount shifts —
    JVM-side, codegen'd, exact in any engine).

    Sorting / range-partitioning a table by this key clusters rows
    that are close in BOTH dimensions into the same files, so parquet
    min/max row-group stats prune scans filtered on either column —
    the data-layout lever for 100-TB scans that no single-column sort
    gives. ``write_zordered`` applies it to a writer.

    ``bits`` is capped at 31: bit i of y lands at long position
    2·i+1, so bits=32 would place y's top bit on the SIGN bit and
    rows with y ≥ 2³¹ would sort NEGATIVE — before the entire rest
    of the curve, silently breaking the clustering contract. Wider
    coordinates must be bucketed (shifted) into ≤31 bits first."""
    if not (1 <= bits <= 31):
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(x.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(
                F.shiftright(y.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i + 1
            )
        )
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    n_files: int = 8,
    bits: int = 16,
) -> None:
    """Write ``df`` as parquet laid out along the Z-curve of
    ``(x_col, y_col)``: range-partition on the interleaved key (files
    own disjoint z-ranges) and sort within partitions (row groups own
    narrow z-ranges), so both columns' min/max footer stats become
    selective. The key column itself is not persisted (written under a
    reserved temp name so a user column can never be clobbered)."""
    zc = "_zorder_tmp_key"
    if zc in df.columns:
        raise ValueError(f"input already has a column named {zc!r}")
    (
        df.withColumn(zc, zorder_key(F.col(x_col), F.col(y_col), bits))
        .repartitionByRange(n_files, zc)
        .sortWithinPartitions(zc)
        .drop(zc)
        .write.mode("overwrite")
        .parquet(path)
    )


def table_fingerprint(df: DataFrame, canon: Column, name: str) -> DataFrame:
    """Order-independent table checksum: md5 of the canonical row form
    reduced by commutative aggregates (count + sum + bit_xor of two
    32-bit hash chunks) → one row ``(table_name, n_rows, sum_lo,
    xor_lo, xor_hi)``.

    Two snapshots compare for multiset equality without sorting either
    side. The xor columns are overflow-free at any scale; the sum
    column wraps int64 past ~4×10⁹ rows (Spark wraps silently, ANSI
    engines promote) — it adds multiset sensitivity (xor alone cancels
    rows with even multiplicity) and is the audit-scale tier. One
    map-side-combined aggregate; no shuffle beyond the final reduce.
    """
    h = F.md5(canon)
    c1 = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    c2 = F.conv(F.substring(h, 17, 8), 16, 10).cast("long")
    return (
        df.select(c1.alias("c1"), c2.alias("c2"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("c1").alias("sum_lo"),
            F.expr("bit_xor(c1)").alias("xor_lo"),
            F.expr("bit_xor(c2)").alias("xor_hi"),
        )
        .select(
            F.lit(name).alias("table_name"),
            "n_rows",
            "sum_lo",
            "xor_lo",
            "xor_hi",
        )
    )
