"""chunk_pack / table_fingerprint (operators/pack.py): chunk-straddle
arithmetic the short sf0.01 texts never exercise, block-size and
partitioning invariance of the two-level prefix sum, and the
fingerprint's order-independence vs single-row sensitivity."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from biosample_enricher_spark.operators.pack import chunk_pack, table_fingerprint


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")


def _naive_pack(rows, chunk_size):
    """Plain-Python reference: concatenate per source in doc_id order."""
    out = {}
    by_src = {}
    for doc_id, src, tok in sorted(rows):
        by_src.setdefault(src, []).append((doc_id, tok))
    for src, docs in by_src.items():
        off = 0
        for doc_id, tok in docs:
            if tok > 0:
                first = off // chunk_size
                last = (off + tok - 1) // chunk_size
                out[(doc_id, src)] = (tok, first, last, last - first + 1)
            off += max(tok, 0)
    return out


def test_chunk_pack_straddles_match_naive(spark):
    # 600-token doc straddles chunks 0-1; zero-token doc occupies none;
    # exact-boundary doc (512) fills chunk exactly; next doc starts a
    # fresh chunk.
    rows = [
        (1, "a", 600),
        (2, "a", 0),
        (3, "a", 424),  # 600..1023 → ends exactly at chunk 1 boundary
        (4, "a", 512),  # 1024..1535 → exactly chunk 2
        (5, "a", 1),  # 1536 → chunk 3
        (10, "b", 511),
        (11, "b", 2),  # 511..512 → straddles 0-1
    ]
    got = {
        (r.doc_id, r.source): (r.n_tokens, r.first_chunk, r.last_chunk, r.n_chunks)
        for r in chunk_pack(_docs(spark, rows), "doc_id", "source", "n_tokens").collect()
    }
    assert got == _naive_pack(rows, 512)
    assert got[(1, "a")][1:] == (0, 1, 2)
    assert got[(4, "a")][1:] == (2, 2, 1)
    assert got[(11, "b")][1:] == (0, 1, 2)
    assert (2, "a") not in got


@pytest.mark.parametrize("block", [1, 3, 128, 10**6])
def test_chunk_pack_block_size_invariant(spark, block):
    rng = random.Random(11)
    rows = [
        (i, f"s{i % 3}", rng.randrange(0, 900))
        for i in range(1, 120)
    ]
    base = {
        (r.doc_id, r.source): (r.first_chunk, r.last_chunk)
        for r in chunk_pack(
            _docs(spark, rows), "doc_id", "source", "n_tokens", block=128
        ).collect()
    }
    alt = {
        (r.doc_id, r.source): (r.first_chunk, r.last_chunk)
        for r in chunk_pack(
            _docs(spark, rows), "doc_id", "source", "n_tokens", block=block
        ).collect()
    }
    assert alt == base


def test_chunk_pack_partitioning_invariant(spark):
    rng = random.Random(13)
    rows = [(i, "s", rng.randrange(1, 700)) for i in range(1, 200)]
    a = chunk_pack(
        _docs(spark, rows).repartition(1), "doc_id", "source", "n_tokens"
    ).collect()
    b = chunk_pack(
        _docs(spark, rows).repartition(17), "doc_id", "source", "n_tokens"
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def _fp(spark, rows):
    df = spark.createDataFrame(rows, "id long, payload string")
    canon = F.concat_ws("|", F.col("id").cast("string"), F.col("payload"))
    return tuple(table_fingerprint(df, canon, "t").collect()[0])


def test_fingerprint_order_independent_and_row_sensitive(spark):
    rows = [(i, f"payload-{i}") for i in range(1, 50)]
    shuffled = list(rows)
    random.Random(5).shuffle(shuffled)
    assert _fp(spark, rows) == _fp(spark, shuffled)
    # one changed character flips the checksum
    mutated = [(i, p if i != 25 else p + "x") for i, p in rows]
    assert _fp(spark, mutated) != _fp(spark, rows)
    # a dropped row flips it too (count and sum tiers)
    assert _fp(spark, rows[:-1]) != _fp(spark, rows)


def test_fingerprint_detects_even_multiplicity_via_sum_tier(spark):
    # xor alone cancels a row duplicated twice; the sum/count tiers are
    # what catch it — pin that the combined row still differs.
    rows = [(i, "p") for i in range(1, 20)]
    doubled = rows + [(7, "p")]
    a, b = _fp(spark, rows), _fp(spark, doubled)
    assert a != b
    # and specifically the xor columns alone would NOT have caught a
    # quadruplicated row (documenting why sum/count ship alongside)
    quad = rows + [(7, "p")] * 4
    c = _fp(spark, quad)
    assert (c[3], c[4]) == (a[3], a[4])  # xor_lo, xor_hi identical
    assert c[:3] != a[:3]  # n_rows / sum_lo differ


def test_zorder_key_matches_python_interleave(spark):
    import random

    from biosample_enricher_spark.operators.pack import zorder_key

    rng = random.Random(23)
    rows = [(rng.randrange(0, 65536), rng.randrange(0, 65536)) for _ in range(500)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", zorder_key(F.col("x"), F.col("y")).alias("z")
        ).collect()
    }
    for x, y in rows:
        z = 0
        for i in range(16):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        assert got[(x, y)] == z


def test_write_zordered_files_own_disjoint_z_ranges(spark, tmp_path):
    """The layout contract: after write_zordered, every parquet file
    owns a z-range disjoint from every other file's (range
    partitioning), so min/max footer stats prune scans."""
    import glob

    import pyarrow.parquet as pq

    from biosample_enricher_spark.operators.pack import write_zordered, zorder_key

    df = (
        spark.range(4000)
        .selectExpr(
            "id",
            "CAST(id % 97 AS LONG) AS a",
            "CAST((id * 31) % 89 AS LONG) AS b",
        )
    )
    path = str(tmp_path / "zo")
    write_zordered(df, path, "a", "b", n_files=6)

    ranges = []
    for f in glob.glob(f"{path}/part-*.parquet"):
        t = pq.read_table(f, columns=["a", "b"])
        zs = [
            sum((((a >> i) & 1) << (2 * i)) | (((b >> i) & 1) << (2 * i + 1))
                for i in range(16))
            for a, b in zip(t.column("a").to_pylist(), t.column("b").to_pylist())
        ]
        if zs:
            ranges.append((min(zs), max(zs)))
    assert len(ranges) >= 3
    ranges.sort()
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2  # disjoint (boundary value may touch)
    # and the round trip loses nothing
    assert spark.read.parquet(path).count() == 4000
