"""Similarity search over embedding columns (``array<float>``).

Two tiers:

- **Brute-force cosine top-k** — exact baseline. The dot product /
  norms are pure higher-order-function expressions
  (``F.aggregate``/``F.zip_with``) against a broadcast query vector;
  top-k via one ORDER BY LIMIT (Spark executes TakeOrderedAndProject —
  per-partition heaps + driver merge of k rows, no global sort
  materialization).
- **LSH-bucketed (random hyperplane / signed random projection)** —
  the scale path: sign-bit sketches bucket vectors so the probe only
  scans matching buckets; Hamming distance on the sketch approximates
  angular distance.

Hyperplanes are generated deterministically from a seed (hash-based,
no RNG state), so plans are reproducible and resumable.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def _py_l2_norm(vec: list[float]) -> float:
    """Driver-side l2 norm with EXACTLY the fold order/arithmetic of
    ``l2_norm``: left-fold acc + v*v over IEEE doubles, then sqrt —
    bit-identical to evaluating the JVM expression on the same
    literals, so substituting it preserves every query's results."""
    acc = 0.0
    for v in vec:
        acc = acc + float(v) * float(v)
    return math.sqrt(acc)


def cosine_lit(a: Column, query_vec: list[float]) -> Column:
    """``cosine`` against a literal query vector, with the
    query-side norm folded at plan-build time. Catalyst does not
    constant-fold higher-order functions, so the plain form re-runs
    ``SQRT(aggregate([...64 literals...]))`` for every row (guide §1.2
    step 2: per-task work); this computes that scalar once on the
    driver (identical fold order ⇒ identical IEEE result) and emits it
    as a literal. The row-side dot/norm are unchanged."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    return dot(a, q) / (l2_norm(a) * F.lit(_py_l2_norm(query_vec)))


def brute_force_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k against a literal query vector."""
    scored = embeddings.select(
        F.col(id_col),
        F.round(cosine_lit(F.col(vec_col), query_vec), 6).alias("cos_sim"),
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k)


def _hyperplane(dim: int, plane_idx: int, seed: int = 7) -> list[float]:
    """Deterministic pseudo-random unit-ish hyperplane: component j is
    a hash-derived value in [-1, 1). Pure function of (seed, plane, j)
    via md5 (process-salt-free, unlike builtin hash())."""
    import hashlib

    out = []
    for j in range(dim):
        digest = hashlib.md5(f"{seed}:{plane_idx}:{j}".encode()).digest()
        h = int.from_bytes(digest[:4], "little")
        out.append((h / 0x80000000) - 1.0)
    return out


def srp_sketch(vec: Column, planes: list[list[float]]) -> Column:
    """Signed-random-projection sketch: bit b = sign(vec · plane_b),
    packed into a long (≤ 64 planes).

    Packed with ``shiftleft`` + bitwise OR so bit 63 (the sign bit) is
    set JVM-side — a Python literal ``1 << 63`` would overflow
    LongType at expression construction."""
    if len(planes) > 64:
        raise ValueError("srp_sketch packs into one long: <= 64 planes")
    out = F.lit(0).cast("long")
    for b, plane in enumerate(planes):
        bit = (
            F.when(dot(vec, F.array(*[F.lit(float(v)) for v in plane])) > 0, F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
        )
        out = out.bitwiseOR(F.shiftleft(bit, b))
    return out


def srp_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 16,
    max_hamming: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """Approximate cosine top-k: prefilter to vectors whose SRP sketch
    is within ``max_hamming`` bits of the query's sketch, then exact
    cosine re-rank of the survivors. At scale the sketch is computed
    once at ingest and the prefilter is a cheap long-column predicate —
    the full-vector math runs only on the candidate set."""
    planes = [_hyperplane(len(query_vec), p, seed) for p in range(n_planes)]
    q_sketch = 0
    for b, plane in enumerate(planes):
        s = sum(float(x) * float(y) for x, y in zip(query_vec, plane))
        if s > 0:
            q_sketch |= 1 << b
    if q_sketch >= 1 << 63:  # two's-complement so bit 63 fits LongType
        q_sketch -= 1 << 64
    sk = embeddings.select(
        F.col(id_col),
        F.col(vec_col),
        srp_sketch(F.col(vec_col), planes).alias("sketch"),
    )
    cands = sk.where(
        F.bit_count(F.col("sketch").bitwiseXOR(F.lit(q_sketch))) <= max_hamming
    )
    return (
        cands.select(
            F.col(id_col),
            F.round(cosine_lit(F.col(vec_col), query_vec), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def pairwise_near_neighbors(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 16,
    n_bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    seed: int = 7,
    bucket_cap: int | None = 1000,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, SRP-banded like the
    MinHash LSH (dedup.py lsh_candidate_pairs): the n_planes-bit
    sketch splits into ``n_bands`` bands; docs agreeing on ANY full
    band become candidates, then exact cosine verifies ≥ threshold.
    Returns (id_a, id_b, cos_sim), id_a < id_b.

    Banding fixes the r2 VERDICT recall cliff of exact whole-sketch
    equality: at cos 0.95 a bit agrees w.p. ≈0.9, so 16 identical bits
    happen ≈19% of the time, while ≥1-of-4 4-bit bands agree ≈98.5%
    (recall floor pinned in tests/test_dedup_similarity.py).
    ``n_bands=1`` degenerates to the old exact-sketch join. Shuffle
    cost: docs × n_bands small rows; vectors rejoin only for the
    candidate pairs.

    ``bucket_cap`` drops any (band, bucket) wider than the cap before
    the self-join (milder exposure than MinHash — a band has only 2^r
    buckets, so mass concentration is expected — but a corpus of
    near-identical embeddings would still stack one bucket in every
    band toward O(n²) pairs). Identical-vector clusters should be
    collapsed upstream (group by a vector fingerprint, e.g.
    ``sha2(to_json(vec))``, the embedding analog of
    ``dedup.exact_collapse``); a dropped bucket's true pairs still
    surface via the other bands. ``None`` disables the cap."""
    if n_planes % n_bands != 0:
        # ValueError, not assert: under python -O a silent partial
        # banding would drop the top bits and quietly lower recall
        raise ValueError(
            f"n_planes ({n_planes}) must divide into n_bands ({n_bands})"
        )
    r = n_planes // n_bands
    if dim is None:
        first = embeddings.select(F.size(vec_col).alias("d")).first()
        dim = int(first["d"])
    planes = [_hyperplane(dim, p, seed) for p in range(n_planes)]
    sk = embeddings.select(
        F.col(id_col).alias("doc_id"),
        F.col(vec_col).alias("vec"),
        srp_sketch(F.col(vec_col), planes).alias("sketch"),
    )
    if r >= 64:
        band_vals = F.array(F.col("sketch"))
    else:
        mask = F.lit((1 << r) - 1).cast("long")
        band_vals = F.array(
            *[
                F.shiftrightunsigned(F.col("sketch"), b * r).bitwiseAND(mask)
                for b in range(n_bands)
            ]
        )
    banded = sk.select(
        "doc_id", F.posexplode(band_vals).alias("band", "bucket")
    )
    # one collect_list aggregation per (band, bucket) instead of a
    # widths-precount + self-join (see dedup._bucket_pairs): the SRP
    # sketch subtree is evaluated once and nothing self-joins
    from .dedup import _bucket_pairs

    pairs = _bucket_pairs(banded, ["band", "bucket"], "doc_id", bucket_cap)
    va = sk.select(F.col("doc_id").alias("id_a"), F.col("vec").alias("_va"))
    vb = sk.select(F.col("doc_id").alias("id_b"), F.col("vec").alias("_vb"))
    return (
        pairs.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("_va"), F.col("_vb")), 6).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )


def exact_vector_collapse(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> tuple[DataFrame, DataFrame]:
    """Collapse byte-identical embedding vectors to one representative
    (min id) before any pairwise candidate generation — the embedding
    twin of ``dedup.exact_collapse``. Identical vectors share the full
    SRP sketch, so an identical cluster lands in one bucket in every
    band and the bucket self-join is O(n²) in the cluster size; worse,
    the ``bucket_cap`` guard alone would then DROP those cos-1.0 pairs
    (every one of the cluster's buckets is over-wide). Collapse first:
    the cluster contributes one representative, and membership is
    recovered by the fingerprint join.

    The fingerprint is sha2-256 of the JSON rendering of the vector
    (deterministic per value; 256 bits so collisions are impossible in
    practice — a 64-bit hash at 10⁹ vectors would see birthday
    collisions, silently merging distinct vectors). NULL vectors are
    excluded (nothing to collapse; they never sketch).

    Returns ``(reps, members)`` with ``members = (<id_col>, rep_id,
    group_n)``, shapes matching ``dedup.exact_collapse``.
    """
    fp = df.where(F.col(vec_col).isNotNull()).select(
        F.col(id_col),
        F.sha2(
            F.to_json(F.struct(F.col(vec_col).alias("v"))), 256
        ).alias("_fp"),
    )
    groups = fp.groupBy("_fp").agg(
        F.min(id_col).alias("rep_id"), F.count(F.lit(1)).alias("group_n")
    )
    members = fp.join(groups, "_fp").select(F.col(id_col), "rep_id", "group_n")
    reps = df.join(
        members.where(F.col(id_col) == F.col("rep_id")).select(id_col),
        id_col,
        "left_semi",
    )
    return reps, members


def embedding_dedup_pipeline(
    df: DataFrame,
    threshold: float = 0.95,
    n_planes: int = 16,
    n_bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
    bucket_cap: int | None = 1000,
):
    """Embedding-cosine near-duplicate dedup composed end-to-end:
    exact-vector collapse → banded-SRP candidate pairs among
    representatives → exact-cosine verification → connected
    components → keep min-id per cluster. The embedding twin of
    ``dedup.dedup_pipeline`` with the same two O(n²) guards
    (collapse + ``bucket_cap``) and the same expansion semantics
    (``dedup.expand_rep_clusters``): identical vectors have identical
    cosine to every third vector, so collapsing cannot change
    connectivity, and exact-dup vector groups untouched by any
    near-dup edge still cluster under their representative.

    Returns a ``dedup.DedupPipelineResult`` (kept / pairs / clusters)
    with the same lifecycle contract: ``pairs`` comes back persisted,
    ``clusters`` holds one localCheckpoint — call
    ``pairs.unpersist()`` + ``free_local_checkpoint(clusters)`` once
    consumed.
    """
    from .dedup import (
        DedupPipelineResult,
        connected_components,
        expand_rep_clusters,
    )

    reps, members = exact_vector_collapse(df, id_col, vec_col)
    # same persist discipline as dedup.dedup_pipeline: reps feeds the
    # sketch scan + both vector-verify join sides (freed below);
    # members feeds both expansion branches (returned persisted)
    reps = reps.persist()
    members = members.persist()
    # try covers everything from the persists on (r6 review: a plan-
    # build failure would otherwise leak the two cache entries)
    pairs = None
    try:
        pairs = pairwise_near_neighbors(
            reps,
            threshold=threshold,
            n_planes=n_planes,
            n_bands=n_bands,
            id_col=id_col,
            vec_col=vec_col,
            seed=seed,
            bucket_cap=bucket_cap,
        ).select("id_a", "id_b")
        pairs.persist()
        rep_clusters = connected_components(pairs)
    except Exception:
        if pairs is not None:
            pairs.unpersist()
        members.unpersist()
        raise
    finally:
        reps.unpersist()
    clusters, kept = expand_rep_clusters(df, id_col, members, rep_clusters)
    return DedupPipelineResult(
        kept=kept, pairs=pairs, clusters=clusters, members=members
    )


# --- IVF (inverted-file) index ------------------------------------------------


def ivf_assign(
    embeddings: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_inline: int = 64,
) -> DataFrame:
    """Assign every vector to its nearest centroid (max cosine; ties
    break to the larger centroid_id in BOTH paths).

    Small centroid counts inline as literal expressions — a single
    codegen'd projection, no join, no shuffle. Past ``max_inline`` the
    literal tree grows linearly with k and falls out of codegen (r2
    VERDICT watch-list), so the broadcast-join path takes over: explode
    against a broadcast centroid dimension, partial-aggregated
    ``max(struct(sim, cid))`` per vector — the shuffle carries ONE row
    per vector thanks to map-side combine, at any k. At ingest this
    materializes the inverted lists: ``(centroid_id, vec_id,
    embedding)`` partitioned/sorted by centroid_id so a probe scan
    prunes to nprobe lists."""
    if len(centroids) > max_inline:
        return _ivf_assign_join(embeddings, centroids, id_col, vec_col)
    best = None
    for cid, cvec in centroids:
        score = F.struct(
            cosine_lit(F.col(vec_col), cvec).alias("sim"),
            F.lit(cid).alias("cid"),
        )
        best = score if best is None else F.greatest(best, score)
    return embeddings.select(
        F.col(id_col),
        F.col(vec_col),
        best["cid"].alias("centroid_id"),
        F.round(best["sim"], 6).alias("centroid_sim"),
    )


def _ivf_assign_join(
    embeddings: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Join-based assignment for large centroid counts: broadcast the
    centroid dimension, score every (vector, centroid) pair, reduce to
    the argmax with ``max(struct(sim, cid, vec))`` — identical results
    to the literal path (struct comparison orders by sim then cid,
    matching ``F.greatest``'s lexicographic tie-break)."""
    spark = embeddings.sparkSession
    cent_structs = [
        F.struct(
            F.lit(int(cid)).alias("cid"),
            F.array(*[F.lit(float(v)) for v in cvec]).alias("cvec"),
        )
        for cid, cvec in centroids
    ]
    # explode(array(lits)) instead of createDataFrame: no Python-runner
    # round trip for the tiny dimension
    cdf = (
        spark.range(1)
        .select(F.explode(F.array(*cent_structs)).alias("c"))
        .select("c.cid", "c.cvec")
    )
    scored = embeddings.join(F.broadcast(cdf)).select(
        F.col(id_col),
        F.struct(
            cosine(F.col(vec_col), F.col("cvec")).alias("sim"),
            F.col("cid").alias("cid"),
            F.col(vec_col).alias("vec"),
        ).alias("s"),
    )
    return (
        scored.groupBy(id_col)
        .agg(F.max("s").alias("b"))
        .select(
            F.col(id_col),
            F.col("b.vec").alias(vec_col),
            F.col("b.cid").alias("centroid_id"),
            F.round(F.col("b.sim"), 6).alias("centroid_sim"),
        )
    )


def seed_centroids(
    embeddings: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> list[tuple[int, list[float]]]:
    """Deterministic centroid selection: the k vectors with the
    smallest xxhash64(id, seed) — a seeded uniform sample without RNG
    state (a full k-means refinement would iterate assign/average;
    one seeded-sample round is the deterministic baseline)."""
    rows = (
        embeddings.select(
            F.col(id_col).alias("_id"),
            F.col(vec_col).alias("_v"),
            F.xxhash64(F.col(id_col), F.lit(seed)).alias("_h"),
        )
        .orderBy("_h")
        .limit(k)
        .collect()
    )
    return [(i, list(r._v)) for i, r in enumerate(rows)]


def _nearest_centroid_ids(
    centroids: list[tuple[int, list[float]]], query_vec: list[float], nprobe: int
) -> list[int]:
    """Driver-side probe-list selection: score the query against every
    centroid (tiny — k rows) and keep the nprobe nearest."""

    def cos_py(a: list[float], b: list[float]) -> float:
        num = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(y * y for y in b) ** 0.5
        return num / (na * nb) if na and nb else 0.0

    return [
        cid
        for cid, _ in sorted(centroids, key=lambda c: -cos_py(query_vec, c[1]))[
            :nprobe
        ]
    ]


def ivf_build(
    embeddings: DataFrame,
    path: str,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> list[tuple[int, list[float]]]:
    """Materialize the inverted lists AT INGEST: assign every vector to
    its nearest centroid once, write the lists parquet-partitioned by
    ``centroid_id``. Returns the centroids (persist them next to the
    index; they are the probe-time routing table).

    This is the step that makes IVF pruning real at 100 TB: the probe
    (``ivf_probe``) filters on the partition column, so Spark's scan
    lists only nprobe/n_centroids of the directories — PartitionFilters
    in the plan, asserted in tests/test_plans.py — instead of scanning
    and re-assigning the full corpus per query."""
    centroids = seed_centroids(embeddings, n_centroids, id_col, vec_col, seed)
    assigned = ivf_assign(embeddings, centroids, id_col, vec_col)
    assigned.write.mode("overwrite").partitionBy("centroid_id").parquet(path)
    return centroids


def ivf_probe(
    spark,
    path: str,
    centroids: list[tuple[int, list[float]]],
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe a materialized IVF index: read ONLY the nprobe nearest
    inverted lists (partition-pruned scan), exact cosine re-rank."""
    probe_ids = _nearest_centroid_ids(centroids, query_vec, nprobe)
    lists = spark.read.parquet(path).where(F.col("centroid_id").isin(probe_ids))
    return (
        lists.select(
            F.col(id_col),
            F.round(cosine_lit(F.col(vec_col), query_vec), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def ivf_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """IVF approximate top-k: score the query against every centroid
    (driver-side, tiny), keep the ``nprobe`` nearest lists, scan only
    vectors assigned to those lists, exact cosine re-rank.

    This is the NO-INDEX fallback (assignment recomputed in-flight —
    reads the full corpus once); the production path is ``ivf_build``
    at ingest + ``ivf_probe``, whose scan is partition-pruned to the
    nprobe lists. Both return identical results for the same
    (seed, n_centroids, nprobe) — asserted in tests."""
    centroids = seed_centroids(embeddings, n_centroids, id_col, vec_col, seed)
    probe_ids = _nearest_centroid_ids(centroids, query_vec, nprobe)
    assigned = ivf_assign(embeddings, centroids, id_col, vec_col)
    cands = assigned.where(F.col("centroid_id").isin(probe_ids))
    return (
        cands.select(
            F.col(id_col),
            F.round(cosine_lit(F.col(vec_col), query_vec), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


# --- recall harness -----------------------------------------------------------


def recall_vs_bruteforce(
    embeddings: DataFrame,
    n_queries: int = 10,
    k: int = 10,
    n_planes: int = 16,
    max_hamming: int = 8,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> DataFrame:
    """Measured recall@k of the approximate ANN tiers against exact
    brute force, computed IN Spark (one job, no per-query loop):
    one row per method — (method, n_queries, k, avg_recall).

    This is the quantitative correctness signal for the ``no_oracle``
    approximate operators: DuckDB cannot replay an SRP prefilter or an
    IVF probe, but it doesn't need to — the engine measures its own
    recall against its exact baseline, and tests pin a floor.

    Shape: queries are the first ``n_queries`` vectors; every method's
    candidate set is scored with the same cosine expression and ranked
    with one window per method; recalls are set-intersection joins.
    The query side is tiny and broadcast everywhere; the corpus is
    scanned once per method, never collected.
    """
    emb = embeddings.select(
        F.col(id_col).alias("vid"), F.col(vec_col).alias("vec")
    )
    qs = emb.where(F.col("vid") < n_queries).select(
        F.col("vid").alias("qid"), F.col("vec").alias("qvec")
    )
    first = embeddings.select(F.size(vec_col).alias("d")).first()
    dim = int(first["d"])
    planes = [_hyperplane(dim, p, seed) for p in range(n_planes)]

    sk_e = emb.withColumn("sketch", srp_sketch(F.col("vec"), planes))
    sk_q = qs.withColumn("qsketch", srp_sketch(F.col("qvec"), planes))
    pairs = sk_e.crossJoin(F.broadcast(sk_q))
    scored = pairs.withColumn(
        "cos", F.round(cosine(F.col("vec"), F.col("qvec")), 6)
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("vid"))

    exact_top = (
        scored.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("qid", "vid")
    )
    srp_top = (
        scored.where(
            F.bit_count(F.col("sketch").bitwiseXOR(F.col("qsketch")))
            <= max_hamming
        )
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .select("qid", "vid")
    )

    # IVF: assign corpus once; route each query to its nprobe nearest
    # centroids via the same literal-centroid trick (no createDataFrame)
    def _ivf_top(centroids: list[tuple[int, list[float]]]) -> DataFrame:
        assigned = ivf_assign(embeddings, centroids, id_col, vec_col).select(
            F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"),
            "centroid_id",
        )
        cent_lit = F.array(
            *[
                F.struct(
                    F.lit(cid).alias("cid"),
                    F.array(*[F.lit(float(v)) for v in cvec]).alias("cvec"),
                )
                for cid, cvec in centroids
            ]
        )
        cents = qs.select("qid", "qvec", F.explode(cent_lit).alias("c"))
        wq = Window.partitionBy("qid").orderBy(
            F.col("csim").desc(), F.col("c.cid")
        )
        qprobe = (
            cents.withColumn("csim", cosine(F.col("qvec"), F.col("c.cvec")))
            .withColumn("crk", F.row_number().over(wq))
            .where(F.col("crk") <= nprobe)
            .select("qid", F.col("c.cid").alias("centroid_id"))
        )
        ivf_cands = assigned.join(F.broadcast(qprobe), "centroid_id").join(
            F.broadcast(qs), "qid"
        )
        return (
            ivf_cands.withColumn(
                "cos", F.round(cosine(F.col("vec"), F.col("qvec")), 6)
            )
            .withColumn("rk", F.row_number().over(w))
            .where(F.col("rk") <= k)
            .select("qid", "vid")
        )

    seeded = seed_centroids(embeddings, n_centroids, id_col, vec_col, seed)
    ivf_top = _ivf_top(seeded)
    refined = kmeans_refine(embeddings, seeded, n_iters=2, id_col=id_col,
                            vec_col=vec_col)
    ivf_top_refined = _ivf_top(refined)

    def _recall(approx: DataFrame, method: str) -> DataFrame:
        hits = exact_top.join(approx, ["qid", "vid"]).groupBy().agg(
            F.count(F.lit(1)).alias("n_hits")
        )
        return hits.select(
            F.lit(method).alias("method"),
            F.lit(n_queries).alias("n_queries"),
            F.lit(k).alias("k"),
            F.round(F.col("n_hits") / F.lit(n_queries * k), 4).alias(
                "avg_recall"
            ),
        )

    return (
        _recall(srp_top, "srp_sketch")
        .unionByName(_recall(ivf_top, "ivf_probe"))
        .unionByName(_recall(ivf_top_refined, "ivf_probe_refined"))
    )


def kmeans_refine(
    embeddings: DataFrame,
    centroids: list[tuple[int, list[float]]],
    n_iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Deterministic Lloyd refinement of IVF centroids.

    Each iteration: assign (codegen'd literal-centroid argmax, no
    shuffle) → element-wise mean per centroid via
    ``posexplode(vec) → groupBy(centroid_id, pos).avg`` — a k×dim-row
    aggregate (map-side combined, skew-free: the shuffle carries only
    (centroid, dim) keys) — then k×dim rows come back to the driver to
    rebuild the literal centroid table. Empty centroids keep their old
    position. Iterative-algorithm tier: not SQL-expressible as one
    query, so its correctness signal is the measured recall lift in
    ann_recall_metrics plus determinism tests."""
    cents = {cid: list(map(float, v)) for cid, v in centroids}
    for _ in range(n_iters):
        assigned = ivf_assign(
            embeddings, sorted(cents.items()), id_col, vec_col
        )
        means = (
            assigned.select(
                "centroid_id", F.posexplode(F.col(vec_col)).alias("pos", "x")
            )
            .groupBy("centroid_id", "pos")
            .agg(F.avg("x").alias("m"))
            .collect()
        )
        new: dict[int, list[float]] = {}
        for r in means:
            new.setdefault(r.centroid_id, [0.0] * len(cents[r.centroid_id]))
            new[r.centroid_id][r.pos] = float(r.m)
        for cid, vec in new.items():
            cents[cid] = vec
    return sorted(cents.items())
