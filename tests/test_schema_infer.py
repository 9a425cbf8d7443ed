"""Inferred JSON Schema (genson-shaped) vs a local Python model of
genson's required-key rule: a key is required at an object level iff it
is present (non-null) in every observed instance of that object.
genson itself is not in the container, so the model recomputes required
lists from collected rows (reference: schema_inference.py:50-66)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from biosample_enricher_spark.operators.schema_infer import (
    field_presence,
    infer_json_schema,
    infer_json_schema_df,
    json_type_of,
)


def _nested_df(spark):
    return spark.range(6).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 4, F.concat(F.lit("t"), F.col("id"))).alias("title"),
        F.when(
            F.col("id") < 3,
            F.struct(
                F.lit("en").alias("lang"),
                F.when(F.col("id") % 2 == 0, F.lit(1.5)).alias("score"),
            ),
        ).alias("meta"),
        F.array(
            F.struct(
                F.lit("text").alias("kind"),
                F.when(F.col("id") < 2, F.lit("hello")).alias("text"),
                F.lit(0).alias("offset"),
                F.array(
                    F.struct(
                        F.lit(1).alias("tok"),
                        F.when(F.col("id") < 5, F.lit("x")).alias("tag"),
                    )
                ).alias("subs"),
            )
        ).alias("spans"),
        F.array(F.lit(1), F.lit(2)).alias("tags"),
    )


def test_matches_local_genson_model(spark):
    df = _nested_df(spark)
    schema = infer_json_schema(df)

    # local model: walk collected rows, gather instances per object
    # pointer, mark required = present in every instance
    instances: dict[str, list[dict]] = {"": []}

    def visit(obj: dict, pointer: str):
        instances.setdefault(pointer, []).append(obj)
        for k, v in obj.items():
            if isinstance(v, dict):
                visit(v, f"{pointer}/{k}")
            elif isinstance(v, list):
                for el in v:
                    if isinstance(el, dict):
                        visit(el, f"{pointer}/{k}/items")

    for row in df.collect():
        visit(
            json.loads(json.dumps(row.asDict(recursive=True), default=str)),
            "",
        )

    def expected_required(pointer: str) -> list[str]:
        objs = [o for o in instances.get(pointer, []) if o is not None]
        objs = [o for o in objs if isinstance(o, dict)]
        if not objs:
            return []
        keys = objs[0].keys()
        return [k for k in keys if all(o.get(k) is not None for o in objs)]

    def walk(node: dict, pointer: str):
        if node.get("type") == "object" and "properties" in node:
            assert sorted(node.get("required", [])) == sorted(
                expected_required(pointer)
            ), pointer
            for k, child in node["properties"].items():
                walk(child, f"{pointer}/{k}")
        elif node.get("type") == "array" and isinstance(
            node.get("items"), dict
        ):
            if node["items"].get("type") == "object":
                walk(node["items"], f"{pointer}/items")

    walk(schema, "")
    # spot-pin the interesting verdicts
    assert schema["required"] == ["doc_id", "spans", "tags"]
    assert schema["properties"]["meta"]["required"] == ["lang"]
    spans_items = schema["properties"]["spans"]["items"]
    assert spans_items["required"] == ["kind", "offset", "subs"]
    # array nested inside array-of-struct elements (two HOF levels)
    assert spans_items["properties"]["subs"]["items"]["required"] == ["tok"]


def test_type_mapping_and_document_shape(spark):
    from pyspark.sql import types as T

    assert json_type_of(T.LongType()) == "integer"
    assert json_type_of(T.DoubleType()) == "number"
    assert json_type_of(T.DecimalType(10, 2)) == "number"
    assert json_type_of(T.BooleanType()) == "boolean"
    assert json_type_of(T.DateType()) == "string"
    assert json_type_of(T.TimestampType()) == "string"
    assert json_type_of(T.BinaryType()) == "string"

    df = _nested_df(spark)
    schema = infer_json_schema(df)
    assert schema["$schema"] == "https://json-schema.org/draft/2020-12/schema"
    assert schema["type"] == "object"
    assert schema["properties"]["tags"] == {
        "type": "array",
        "items": {"type": "integer"},
    }

    row = infer_json_schema_df(df).first()
    assert json.loads(row.json_schema)["type"] == "object"


def test_empty_frame_has_no_required(spark):
    df = _nested_df(spark).where(F.lit(False))
    schema = infer_json_schema(df)

    def no_required(node):
        assert "required" not in node
        for child in node.get("properties", {}).values():
            no_required(child)
        if isinstance(node.get("items"), dict):
            no_required(node["items"])

    no_required(schema)


def test_field_presence_tabular(spark):
    df = _nested_df(spark)
    got = {r.field: r for r in field_presence(df).collect()}
    assert got["doc_id"].required and got["doc_id"].json_type == "integer"
    assert not got["title"].required and got["title"].present_docs == 4
    assert got["meta"].json_type == "object" and not got["meta"].required
    assert got["spans"].json_type == "array" and got["spans"].required
    assert got["doc_id"].total_docs == 6


def test_required_lists_fuzz_against_local_model(spark):
    """Hypothesis over random null patterns: the distributed counting
    pass must agree with the local genson-model required rule at every
    object level, including empty arrays and all-null parents."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    sub = st.fixed_dictionaries(
        {
            "tok": st.one_of(st.none(), st.integers(0, 9)),
            "tag": st.one_of(st.none(), st.sampled_from(["x", "y"])),
        }
    )
    span = st.fixed_dictionaries(
        {
            "kind": st.one_of(st.none(), st.sampled_from(["text", "image"])),
            "subs": st.one_of(st.none(), st.lists(sub, max_size=3)),
        }
    )
    doc = st.fixed_dictionaries(
        {
            "doc_id": st.integers(0, 1000),
            "meta": st.one_of(
                st.none(),
                st.fixed_dictionaries(
                    {
                        "lang": st.one_of(st.none(), st.just("en")),
                        "score": st.one_of(st.none(), st.floats(0, 1)),
                    }
                ),
            ),
            "spans": st.one_of(st.none(), st.lists(span, max_size=3)),
        }
    )

    schema = (
        "doc_id long, "
        "meta struct<lang: string, score: double>, "
        "spans array<struct<kind: string, subs: array<struct<tok: long, tag: string>>>>"
    )

    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(st.lists(doc, min_size=0, max_size=8))
    def check(docs):
        df = spark.createDataFrame(
            [
                (
                    d["doc_id"],
                    (d["meta"]["lang"], d["meta"]["score"])
                    if d["meta"] is not None
                    else None,
                    [
                        (
                            s["kind"],
                            [(x["tok"], x["tag"]) for x in s["subs"]]
                            if s["subs"] is not None
                            else None,
                        )
                        for s in d["spans"]
                    ]
                    if d["spans"] is not None
                    else None,
                )
                for d in docs
            ]
            or [],
            schema,
        )
        got = infer_json_schema(df)

        instances: dict[str, list] = {}

        def visit(obj, pointer):
            instances.setdefault(pointer, []).append(obj)
            for k, v in obj.items():
                if isinstance(v, dict):
                    visit(v, f"{pointer}/{k}")
                elif isinstance(v, list):
                    for el in v:
                        if isinstance(el, dict):
                            visit(el, f"{pointer}/{k}/items")

        for d in docs:
            visit(d, "")

        def expected_required(pointer):
            objs = [o for o in instances.get(pointer, []) if isinstance(o, dict)]
            if not objs:
                return []
            return sorted(
                k
                for k in objs[0]
                if all(o.get(k) is not None for o in objs)
            )

        def walk(node, pointer):
            if node.get("type") == "object" and "properties" in node:
                assert sorted(node.get("required", [])) == expected_required(
                    pointer
                ), (pointer, docs)
                for k, child in node["properties"].items():
                    walk(child, f"{pointer}/{k}")
            elif node.get("type") == "array" and isinstance(
                node.get("items"), dict
            ):
                if node["items"].get("type") == "object":
                    walk(node["items"], f"{pointer}/items")

        walk(got, "")

    check()


def test_sample_size_caps_counting_pass(spark):
    """--sample-size analog: the typed shape is sample-invariant; the
    required verdict for an always-present column survives sampling."""
    df = _nested_df(spark)
    full = infer_json_schema(df)
    sampled = infer_json_schema(df, sample_size=3, seed=7)

    def shape(node):
        # required lists are data-dependent (estimated from the
        # sample, like genson over a Mongo $sample) — the typed
        # shape must be identical
        return {
            k: shape(v) if isinstance(v, dict) else v
            for k, v in node.items()
            if k != "required"
        }

    assert shape(sampled) == shape(full)
    # doc_id is non-null everywhere, so any sample keeps it required
    # (unless the sample is empty, which seed=7 over 6 rows is not)
    assert "doc_id" in sampled.get("required", [])
