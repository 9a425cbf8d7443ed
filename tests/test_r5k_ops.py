"""Pins for the r5k batch: entity groups (CC vs union-find),
cleaning-pipeline funnel, quantile-shift drift."""

from __future__ import annotations

from biosample_enricher_spark.queries import QUERIES

SF01 = "/root/testdata/sf0.01"


def test_er2_groups_match_python_union_find(spark):
    """Third independent implementation: the er1 pair list closed by
    a plain Python union-find must produce the same (name ->
    lexicomin-group, size) map as the engine's distributed CC (the
    DuckDB recursive-CTE oracle being the second)."""
    pairs = [
        (r.name_a, r.name_b)
        for r in QUERIES["er1_fuzzy_name_match"](spark, SF01).collect()
    ]
    parent: dict[str, str] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    roots: dict[str, list[str]] = {}
    for x in parent:
        roots.setdefault(find(x), []).append(x)
    exp = {}
    for members in roots.values():
        g = min(members)
        for m in members:
            exp[m] = (g, len(members))
    got = {
        r.name: (r.group_name, r.group_size)
        for r in QUERIES["er2_entity_groups"](spark, SF01).collect()
    }
    assert got == exp and len(got) > 10


def test_x15_funnel_every_stage_drops_and_is_monotone(spark):
    rows = {
        r.stage: r.n_docs
        for r in QUERIES["x15_clean_pipeline"](spark, SF01).collect()
    }
    assert set(rows) == {"raw", "present", "quality", "deduped", "sampled"}
    seq = [rows[s] for s in ("raw", "present", "quality", "deduped", "sampled")]
    assert seq == sorted(seq, reverse=True)
    # planted failures make stages 2-4 STRICT drops; sampling keeps ~80%
    assert rows["present"] < rows["raw"]
    assert rows["quality"] < rows["present"]
    assert rows["deduped"] < rows["quality"]
    assert 0.7 < rows["sampled"] / rows["deduped"] < 0.9


def test_quantile_shift_rank_definition_on_planted_ties(spark, tmp_path):
    """Order statistics at (n+1) div 2 and ceil(9n/10) on a planted
    multiset with heavy ties, checked against hand-computed values;
    the even half is the same data so deltas are exactly the plant."""
    rows = []
    # lang 'aa': even docs carry [10]*5 + [20]*4 + [30]  (n=10)
    vals = [10] * 5 + [20] * 4 + [30]
    for i, v in enumerate(vals):
        rows.append((2 * i, f"t{i}", "aa", "src", v))          # old half
        rows.append((2 * i + 1, f"t{i}", "aa", "src", v))      # new half
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = str(tmp_path / "qs")
    df.write.mode("overwrite").parquet(f"{out}/documents.parquet")
    got = QUERIES["drift_quantile_shift"](spark, out).collect()
    assert len(got) == 1
    r = got[0]
    # n=10: p50 rank 5 -> 10, p90 rank 9 -> 20 on the old side
    assert (r.p50_old, r.p90_old) == (10, 20)
    # new half: +40 on doc_id%5==0 -> new docs with doc_id in
    # {5,15,25,...}: doc_id=2i+1 -> i in {2,7,12,...} -> vals[2]=10,
    # vals[7]=20 shifted to 50,60 -> multiset [10,10,10,10,20,20,20,30,50,60]
    assert (r.p50_new, r.p90_new) == (20, 50)
    assert (r.d50, r.d90) == (10, 30)
