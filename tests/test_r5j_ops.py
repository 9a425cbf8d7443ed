"""Python-reference pins for the r5j interleaved-span batch:
kind-grammar audit, token budget, new-category drift."""

from __future__ import annotations

from pyspark.sql import functions as F

from biosample_enricher_spark.operators.spans import (
    kind_grammar_audit,
    token_budget,
)
from biosample_enricher_spark.queries import QUERIES
from biosample_enricher_spark.spec import MEDIA_KINDS

SEQS = [
    [],
    ["text"],
    ["image"],
    ["text", "image", "text"],
    ["image", "image"],
    ["text", "audio", "table", "text"],
    ["table", "text", "image"],
    ["text", "text", "image", "image", "image", "text"],
    [None, "text"],  # null kind: counts as non-media, never crashes
]


def _py_grammar(seq):
    med = [k in MEDIA_KINDS if k is not None else False for k in seq]
    n_adj = sum(1 for a, b in zip(med, med[1:]) if a and b)
    return (
        len(seq),
        med[0] if seq else False,
        med[-1] if seq else False,
        n_adj,
    )


def test_kind_grammar_audit_matches_python_on_arbitrary_sequences(spark):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(SEQS)], "i long, kinds array<string>"
    )
    got = {
        r.i: (
            r.g.n_spans,
            r.g.starts_with_media,
            r.g.ends_with_media,
            r.g.n_adjacent_media,
        )
        for r in df.select("i", kind_grammar_audit(F.col("kinds")).alias("g"))
        .collect()
    }
    for i, s in enumerate(SEQS):
        assert got[i] == _py_grammar(s), (i, s)


def test_token_budget_floors_per_span_and_handles_null_text(spark):
    spans = [
        # (kind, text): lens 1,2,3,4,5 -> per-span floors 1,1,1,1,2
        [("text", "a"), ("text", "ab"), ("text", "abc"),
         ("text", "abcd"), ("text", "abcde")],
        [("image", None), ("text", None), ("audio", None)],  # null text = 0
        [],
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(spans)],
        "i long, spans array<struct<kind string, text string>>",
    )
    got = {
        r.i: (r.b.text_tokens, r.b.media_tokens, r.b.total_tokens)
        for r in df.select(
            "i", token_budget(F.col("spans"), media_cost=64).alias("b")
        ).collect()
    }
    # sum of per-span floors (1+1+1+1+2)=6; a single floor over the
    # total length 15 would give (15+3)//4=4 — the per-span contract
    assert got[0] == (6, 0, 6)
    assert got[1] == (0, 128, 128)
    assert got[2] == (0, 0, 0)


def test_v12_reports_only_planted_categories_at_sf001(spark):
    rows = QUERIES["v12_new_categories"](spark, "/root/testdata/sf0.001").collect()
    assert rows  # a broken plant/anti-join must not pass vacuously
    assert all(r.col_name == "lang" and r.category.endswith("-v2") for r in rows)
