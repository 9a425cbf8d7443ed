"""Deterministic synthetic corpus generator.

Produces the engine's primary input table (``BASELINE.json:input_hint``)::

    documents(doc_id: string,
              spans: array<struct<kind:string, text:string,
                                  media_ref:string, offset:int>>)

plus the referential dimension::

    asset_catalog(media_ref: string, media_kind: string, size_bytes: bigint)

Design constraints (SURVEY.md §7):

- **Pure function of (seed, n)** — every value derives from
  ``xxhash64`` over (seed, row id, span index, tag). No wall-clock, no
  Python RNG, no driver-side loops: generation is a Column-expression
  pipeline over ``spark.range(n)``, so it distributes and scales to any
  row count (the 10^12-doc posture) and is reproducible across
  partitionings and parallelism levels.
- **Seeded violations**, each mapping to one constraint (FIXTURES.md A1):
  duplicate ``doc_id``; dangling ``media_ref``; null/unknown ``kind``;
  conditional-presence breaks (``text`` null on kind='text',
  ``media_ref`` set on kind='text', ...); negative / non-monotonic
  ``offset``; whitespace/sentinel strings ("n/a", "unknown").
- **Controlled skew**: ``kind='text'`` is hot (~75% of spans) and one
  catalog asset receives ~30% of all media references — exercising the
  salted aggregation and AQE skew-join paths.

Reference analogs are cited per violation class in FIXTURES.md §A1
(e.g. duplicate-ID semantics at ``/root/reference/biosample_enricher/
adapters.py:327-338``, positional invariants at ``metrics/aligner.py:
66-74``, null sentinels at ``metrics/aligner.py:234-238``).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .spec import KIND_VOCAB, MEDIA_KINDS, NULL_SENTINELS  # noqa: F401


@dataclass(frozen=True)
class GenParams:
    """Knobs for the corpus generator. Rates are per-mille (‰) of the
    relevant population; set ``clean()`` for a violation-free corpus
    (drift baselines, perf runs)."""

    seed: int = 42
    n_assets: int = 10_000
    max_spans: int = 8
    # violation rates, per mille
    dup_doc_id: int = 5          # of docs: doc_id equals previous doc's id
    null_kind: int = 4           # of spans
    unknown_kind: int = 4        # of spans: kind='video' (not in vocab)
    text_null: int = 4           # of text spans: text missing
    text_sentinel: int = 6       # of text spans: whitespace / "n/a" / "unknown"
    text_has_media_ref: int = 3  # of text spans: media_ref wrongly set
    media_text_set: int = 3      # of media spans: text wrongly set
    media_ref_null: int = 4      # of media spans: media_ref missing
    dangling_ref: int = 10       # of media spans: media_ref not in catalog
    bad_offset: int = 6          # of spans: negative or non-monotonic offset
    # distribution shape (drift knobs)
    text_weight: int = 750       # per-mille of spans that are kind='text'
    image_weight: int = 130
    audio_weight: int = 70       # remainder -> 'table'
    text_len_base: int = 4       # words per text span: base + hash%spread
    text_len_spread: int = 24
    hot_asset_share: int = 300   # per-mille of media refs hitting asset 0

    def clean(self) -> "GenParams":
        """Copy with all violation rates zeroed (valid corpus)."""
        return GenParams(
            seed=self.seed,
            n_assets=self.n_assets,
            max_spans=self.max_spans,
            dup_doc_id=0, null_kind=0, unknown_kind=0, text_null=0,
            text_sentinel=0, text_has_media_ref=0, media_text_set=0,
            media_ref_null=0, dangling_ref=0, bad_offset=0,
            text_weight=self.text_weight,
            image_weight=self.image_weight,
            audio_weight=self.audio_weight,
            text_len_base=self.text_len_base,
            text_len_spread=self.text_len_spread,
            hot_asset_share=self.hot_asset_share,
        )


def _h(p: GenParams, tag: str, *cols: Column) -> Column:
    """Deterministic per-(seed, tag, cols) uniform hash in [0, 2^63)."""
    return F.abs(F.xxhash64(F.lit(p.seed), F.lit(tag), *cols))


def _u(p: GenParams, tag: str, mod: int, *cols: Column) -> Column:
    """Uniform integer in [0, mod)."""
    return F.pmod(_h(p, tag, *cols), F.lit(mod))


def gen_documents(
    spark: SparkSession,
    n_docs: int,
    params: GenParams | None = None,
    partitions: int | None = None,
) -> DataFrame:
    """Synthesize the ``documents`` table as a distributed expression
    pipeline (no driver materialization)."""
    p = params or GenParams()
    rng = spark.range(0, n_docs, numPartitions=partitions) if partitions \
        else spark.range(0, n_docs)
    doc = rng.withColumnRenamed("id", "_i")
    i = F.col("_i")

    # --- doc_id (with seeded duplicates of the *previous* row's id) ---
    is_dup = (_u(p, "dup", 1000, i) < F.lit(p.dup_doc_id)) & (i > 0)
    doc_key = F.when(is_dup, i - 1).otherwise(i)
    doc = doc.withColumn("doc_id", F.format_string("doc-%012d", doc_key))

    n_spans = (F.lit(1) + _u(p, "nspans", p.max_spans, i)).cast("int")

    def span(j: Column) -> Column:
        # kind: violations first, then skewed vocabulary pick
        r_kind = _u(p, "kind", 1000, i, j)
        t0 = p.null_kind
        t1 = t0 + p.unknown_kind
        t2 = t1 + p.text_weight
        t3 = t2 + p.image_weight
        t4 = t3 + p.audio_weight
        kind = (
            F.when(r_kind < t0, F.lit(None).cast("string"))
            .when(r_kind < t1, F.lit("video"))
            .when(r_kind < t2, F.lit("text"))
            .when(r_kind < t3, F.lit("image"))
            .when(r_kind < t4, F.lit("audio"))
            .otherwise(F.lit("table"))
        )
        is_textish = kind.isNull() | (kind == "text") | (kind == "video")

        # text payload: `len` words of a deterministic token, so span
        # length histograms are seed-stable and drift knobs move them.
        word = F.format_string("w%05d", _u(p, "word", 50_000, i, j))
        length = F.lit(p.text_len_base) + _u(p, "tlen", p.text_len_spread, i, j)
        body = F.rtrim(F.repeat(F.concat(word, F.lit(" ")), length))

        r_txt = _u(p, "txtv", 1000, i, j)
        s0 = p.text_null
        s1 = s0 + p.text_sentinel
        text_for_text_kind = (
            F.when(r_txt < s0, F.lit(None).cast("string"))
            .when(r_txt < s1,
                  F.element_at(F.array(F.lit("   "), F.lit("n/a"), F.lit("unknown")),
                               (F.pmod(r_txt, F.lit(3)) + 1).cast("int")))
            .otherwise(body)
        )
        r_mtxt = _u(p, "mtxt", 1000, i, j)
        text = (
            F.when(is_textish, text_for_text_kind)
            .when(r_mtxt < F.lit(p.media_text_set), body)  # violation on media span
            .otherwise(F.lit(None).cast("string"))
        )

        # media_ref: skewed toward one hot asset; seeded dangling refs
        r_asset = _u(p, "asset", 1000, i, j)
        asset_id = (
            F.when(r_asset < F.lit(p.hot_asset_share), F.lit(0))
            .otherwise(_u(p, "assetid", p.n_assets, i, j))
        )
        dangling_id = F.lit(p.n_assets) + _u(p, "dang", 100_000, i, j)
        r_ref = _u(p, "refv", 1000, i, j)
        m0 = p.media_ref_null
        m1 = m0 + p.dangling_ref
        ref_for_media = (
            F.when(r_ref < m0, F.lit(None).cast("string"))
            .when(r_ref < m1, F.format_string("asset-%08d", dangling_id))
            .otherwise(F.format_string("asset-%08d", asset_id))
        )
        r_tref = _u(p, "tref", 1000, i, j)
        media_ref = (
            F.when(~is_textish, ref_for_media)
            .when(r_tref < F.lit(p.text_has_media_ref),
                  F.format_string("asset-%08d", asset_id))  # violation on text span
            .otherwise(F.lit(None).cast("string"))
        )

        # offset: strictly increasing base; seeded negatives + inversions
        base = j * 16 + F.pmod(_h(p, "off", i, j), F.lit(8))
        r_off = _u(p, "offv", 1000, i, j)
        half = p.bad_offset // 2
        offset = (
            F.when(r_off < F.lit(half), -(F.lit(1) + F.pmod(r_off, F.lit(7))))
            .when(r_off < F.lit(p.bad_offset), base - 24)   # < previous span's base
            .otherwise(base)
        ).cast("int")

        return F.struct(
            kind.alias("kind"),
            text.alias("text"),
            media_ref.alias("media_ref"),
            offset.alias("offset"),
        )

    doc = doc.withColumn(
        "spans", F.transform(F.sequence(F.lit(0), n_spans - 1), span)
    )
    return doc.select("doc_id", "spans")


def gen_asset_catalog(spark: SparkSession, params: GenParams | None = None) -> DataFrame:
    """Asset dimension: the broadcast side of the referential check.
    Analog: GOLD ``seq_projects`` lookup collection
    (``/root/reference/biosample_enricher/adapters.py:623-632``)."""
    p = params or GenParams()
    rng = spark.range(0, p.n_assets).withColumnRenamed("id", "_i")
    i = F.col("_i")
    kind = F.element_at(
        F.array(*[F.lit(k) for k in MEDIA_KINDS]),
        (_u(p, "mkind", len(MEDIA_KINDS), i) + 1).cast("int"),
    )
    return rng.select(
        F.format_string("asset-%08d", i).alias("media_ref"),
        kind.alias("media_kind"),
        (F.lit(128) + _u(p, "asz", 50_000_000, i)).alias("size_bytes"),
    )
