#!/usr/bin/env python
"""Dump formatted physical plans for the engine's flagship paths into
PLANS.md — the human-auditable companion to tests/test_plans.py (which
pins the same properties as assertions).

Each section is the output of ``.explain("formatted")`` for a
representative query, chosen to show the plan properties that matter
at 100 TB: pushed filters + pruned schemas at the scan, broadcast
strategies, map-side partial aggregation, user-partitioned windows,
and the absence of Python eval nodes in JVM-only paths.

Usage: python jobs/dump_plans.py   (writes PLANS.md at the repo root)
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = "/root/testdata/sf0.001"

SECTIONS = [
    (
        "s1_scan_filter_project — pushdown + pruning",
        "Filters reach the parquet scan (PushedFilters) and the read "
        "schema is pruned to the referenced columns.",
    ),
    (
        "a13_uniqueness_violations — single hash aggregation (r6)",
        "Spark's partial (map-side) aggregation pre-counts per "
        "physical partition, so the one Exchange carries only (key, "
        "partial) rows — reducer input is bounded by cardinality × "
        "map tasks, not data size, under any skew. The previous "
        "explicit (salt, key) two-stage added a second Exchange for "
        "the same bound (removed r6).",
    ),
    (
        "j8_range_join — broadcast interval join",
        "The 4-row band dimension broadcasts; the fact side is never "
        "shuffled for the join (BroadcastNestedLoopJoin).",
    ),
    (
        "w7_rolling_window — user-partitioned RANGE frame",
        "One hash exchange on user_id; no single-partition window.",
    ),
    (
        "w5_sessionize — lag + running sum, one shuffle",
        "Both windows share hashpartitioning(user_id); the aggregation "
        "reuses it.",
    ),
    (
        "a18_corr_sufficient_stats — single-pass mergeable sums",
        "One scan, map-side partial_sum for all five sums + count.",
    ),
    (
        "dedup_keep_first — window-free dedup materialization",
        "Fingerprint groupBy picks keepers (partial_min map-side), "
        "then a semi-join filters the corpus; NULL-text rows bypass "
        "via union.",
    ),
    (
        "p11_stratified_sample — sampling as a pure scan filter",
        "The md5-threshold predicate evaluates in the scan stage; no "
        "shuffle, no sampling operator state.",
    ),
    (
        "a23_outlier_zscore — one window shuffle for all sufficient stats",
        "count/sum/sum-of-squares ride ONE Window over ONE hash "
        "exchange on the group key; the |z|>3 verdict is the integer "
        "predicate (n·v−Σv)² > 9(n·Σv²−(Σv)²) folded into the Filter.",
    ),
    (
        "a24_heavy_hitters — two-pass MG candidate/verify",
        "Pass 1: one MapInPandas, zero shuffle (per-partition "
        "mergeable Misra-Gries survivors). Pass 2: broadcast LEFT "
        "SEMI filter before the exact count, so the groupBy shuffles "
        "only candidate tokens; the single BroadcastNestedLoopJoin "
        "is the 1-row n_total cross join.",
    ),
    (
        "dedup_ngram_jaccard — lossless prefix-filtered similarity join",
        "All joins are hash-based (no CartesianProduct / nested-loop "
        "pair enumeration): candidates come from the rarest-prefix "
        "self-join over a checkpointed prefix frame, intersections "
        "from one array_intersect per candidate pair over the "
        "checkpointed shingle arrays (r6 second pass; the operator is "
        "eager, so the registered query's plan is the checkpointed "
        "result — the internal computation plan is committed at "
        "plans/r06/dedup_ngram_jaccard_after.txt).",
    ),
    (
        "v1_order_reconciliation — pre-aggregate facts before the join",
        "lineitem collapses to one exact-cents row per order key "
        "(map-side partial agg) BELOW the orders join, so the join "
        "moves |orders| rows, not |lineitem|; the priority rollup is "
        "5 groups.",
    ),
    (
        "x6_decontamination — broadcast eval-gram containment join",
        "The deduplicated eval n-gram set (fixed-size while the "
        "corpus grows) broadcasts to the train-side gram stream; the "
        "corpus side never shuffles for the join — its only exchange "
        "is the per-doc rollup keyed by doc_id.",
    ),
    (
        "a29_topk_agg_mergeable — zero-shuffle truncation, bounded window",
        "Stage 1 truncates to k rows per (group, partition) INSIDE "
        "each partition (one MapInPandas, zero shuffle — the freq.py "
        "MG candidate-pass shape); the plan's only hash exchange "
        "carries the k-bounded survivor frame into its window. The "
        "first draft's groupBy+collect_list form LOOKED equivalent "
        "but its plan put the slice above the exchange — the whole "
        "input crossed the wire inside partial_collect_list buffers; "
        "the plan evidence caught the false claim.",
    ),
    (
        "zo1_zorder_scan — Z-order curve walk via TakeOrdered",
        "The Morton key is constant-shift integer expressions folded "
        "into the scan projection; first-200-of-the-curve is a "
        "TakeOrdered, never a global sort.",
    ),
    (
        "v6_bloom_referential — Bloom pre-filter tier for referential",
        "The one-row bit-array filter (built by a bit_or aggregate "
        "bounded by m/64 words, not catalog size) attaches to the "
        "fact side by broadcast; bloom-failing rows are definite "
        "violations with zero shuffle, and only bloom-passing rows "
        "enter the exact broadcast left-anti verify.",
    ),
    (
        "sp1_span_offsets — per-row HOF offset repair, zero shuffle",
        "Span lengths, exclusive prefix sums, and struct rebuild all "
        "run as higher-order Column expressions inside the scan "
        "stage; the only exchange in the plan is the presentation "
        "sort.",
    ),
    (
        "x9_chunk_pack — two-level prefix sum, no serial group window",
        "Intra-block cumsums run over (source, block) hash "
        "partitioning — fully parallel — and block offsets come from "
        "a window over the per-block totals frame, joined back with "
        "NO forced broadcast hint (its cardinality is id_range/block "
        "— unbounded at scale); AQE broadcasts it when measured "
        "small. All chunk arithmetic is integral div, never "
        "floor-of-double. The textbook per-source running sum would "
        "serialize each source into one partition.",
    ),
    (
        "j11_spatial_grid_join — grid cells make the spatial join an equi-join",
        "Side A explodes into its 3×3 cell neighborhood (one Generate "
        "of a constant 9-element offset array); the join is a HASH "
        "join on the (cx, cy) cell key with the exact integer d²≤r² "
        "verify folded into the condition — no CartesianProduct / "
        "BroadcastNestedLoopJoin anywhere (also pinned in "
        "tests/test_r5h_ops.py). Cell ids use exact integer floor "
        "division ((c − pmod(c, r)) div r): float cell math could "
        "1-ulp-flip a boundary point into the wrong cell and push a "
        "qualifying pair outside the 3×3 neighborhood. At 100 TB both "
        "sides hash-partition on the cell key — shuffle is 9·|A| + "
        "|B| rows; a skewed (urban) cell composes with the j10 "
        "salting pattern unchanged.",
    ),
    (
        "j12_bucketed_join — co-located layout, no fact-side shuffle",
        "Both scans read `Bucketed: true`. Under the no-broadcast pin "
        "(tests/test_plans.py::test_bucketed_join_has_no_shuffle) the "
        "SortMergeJoin has NO Exchange on either side — bucket i "
        "joins bucket i straight off disk; at this SF, AQE broadcasts "
        "the small side instead. Either path never shuffles the fact "
        "table; at 100 TB (nothing broadcasts) the bucketed layout "
        "removes the repeated-join shuffle permanently — the batch "
        "analog of Iceberg's bucket() partition transform.",
    ),
    (
        "a36_countmin_freq — constant-size sketch state",
        "The Count-Min sketch is built directly from the event "
        "stream: explode ×depth, hash to (j, bucket), one "
        "HashAggregate pair whose map-side partial collapses every "
        "partition to ≤ depth·width (192) rows before the exchange — "
        "shuffle AND reducer state constant at any key cardinality. "
        "Estimation broadcasts the 192-cell frame; the LEFT-outer "
        "probe with min(coalesce(bucket_n, 0)) is load-bearing (an "
        "inner join drops empty cells from the min and overestimates "
        "absent keys — pinned in tests/test_r5h_ops.py).",
    ),
    (
        "x15_clean_pipeline — funnel counts without count-jobs",
        "All stage predicates are Column expressions folded into the "
        "scans; ONE conditional aggregate emits all five funnel "
        "counts (stack unpivots the single row). The dedup keep-set "
        "join reads the corpus twice (once per join side); at 100 TB "
        "persist the flag frame once to make it a single scan. Never "
        "one count-job per stage.",
    ),
]


NARRATIVE_GRAPH = """## g1_pagerank / g2_triangle_count — iterative + oriented graph shapes (r5)

PageRank: per round one hash join (state × edges on src) + one
map-side-combined sum on dst; all arithmetic in BIGINT fixed point so
the result is bit-deterministic under any partitioning (float message
sums are order-dependent). The edge frame is localCheckpointed once
up front; ranks are checkpointed EVERY round (both per-round jobs —
the dangling collect and the rank update — read the previous round's
materialized blocks instead of replaying joins) and the previous
checkpoint's blocks are freed immediately — constant storage, the
connected_components discipline. Callers free the returned frame's
final checkpoint when done (free_local_checkpoint), the documented CC
lifecycle.

Triangle count: edges oriented toward the higher-(degree, id)
endpoint, bounding out-degree ~O(√m) — a 10⁷-degree hub that would
emit 10¹⁴ wedges in the naive Σ deg² wedge join contributes almost
nothing once oriented (its edges all point INTO it; pinned by the
50k-spoke hub test completing in seconds). The close step runs in
edge-iterator form (r6 second pass): per oriented edge, one
array_intersect of the two endpoints' sorted out-neighbor arrays —
the same membership tests as the former wedge join without
materializing Σ outdeg² wedge rows (measured ~13× less CPU at
sf0.1); per-node adjacency state stays LINEAR in outdeg, unlike the
rejected quadratic pair-array wedge generation. The SQL oracle runs
the naive a<b<c three-way join — a different algorithm for the same
invariant — so the external CORRECTNESS row checks the orientation
argument itself.

"""

NARRATIVE = """## dedup_pipeline — O(n²) guards (r5)

Not a single plan but the two bounds that keep the near-dup pipeline
sub-quadratic on a web corpus (r4 VERDICT's one scale-killer):

1. **Exact-fingerprint collapse before banding**
   (`operators/dedup.py exact_collapse`). Identical docs share the
   full MinHash signature, so a 1M-doc boilerplate cluster lands in
   ONE bucket in EVERY band and the bucket self-join alone would emit
   ~5×10¹¹ candidate pairs × 16 bands. The collapse is one
   map-side-combined `groupBy(fingerprint) → min(id)` plus a
   semi-join — both linear, both shuffle only (id, 128-bit fp) rows —
   and the cluster contributes exactly one representative to banding.
   Membership is recovered afterwards by a fingerprint join;
   connectivity is provably unchanged (identical text ⇒ identical
   Jaccard to every third doc), and the component min-label is still
   the global min id because each representative is its group's min.
2. **Hot-bucket cap** (`lsh_candidate_pairs(bucket_cap=1000)`, same
   guard on the SRP embedding side). Any surviving (band, bucket)
   wider than the cap — after the collapse that means a swarm of
   near-identical-but-not-equal docs — is dropped before the
   self-join, bounding any bucket's contribution at cap²/2; a true
   pair inside a dropped bucket still surfaces through its other
   bands. Same stop-key pattern as `jaccard_candidates`' `df_cap` and
   the SimHash quarter cap.

Measured (tests/test_dedup_similarity.py): a planted 500-identical-doc
cluster emits 124,750 candidate pairs uncapped and 0 with the cap; the
full pipeline over 50k identical + 200 distinct + 1 near-dup pair
completes with ≤ reps×bands candidate pairs and byte-identical
kept/cluster output. Connected components stress: a 10⁵-node chain
(worst diameter) converges in ≤36 pointer-jumping rounds and a
10⁵-node star (worst skew) in ≤3, labels exact in both.
"""


def formatted_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue().rstrip()


def main() -> None:
    from biosample_enricher_spark.queries import QUERIES
    from biosample_enricher_spark.session import get_spark

    spark = get_spark(app_name="dump-plans", master="local[4]",
                      shuffle_partitions=4)
    out = [
        "# PLANS — formatted physical plans for the flagship paths",
        "",
        "Generated by `python jobs/dump_plans.py` over"
        f" `{SF}` (plan SHAPE is scale-invariant; only row-count",
        "statistics change with SF). The same properties are pinned as",
        "assertions in `tests/test_plans.py`; this file exists so a",
        "reviewer can read the actual plans without running anything.",
        "",
    ]
    for title, why in SECTIONS:
        qname = title.split(" — ")[0]
        df = QUERIES[qname](spark, SF)
        out.append(f"## {title}")
        out.append("")
        out.append(why)
        out.append("")
        out.append("```")
        out.append(formatted_plan(df))
        out.append("```")
        out.append("")
    out.append(NARRATIVE_GRAPH)
    out.append(NARRATIVE)
    path = os.path.join(REPO, "PLANS.md")
    with open(path, "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
