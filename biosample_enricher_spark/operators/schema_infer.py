"""Inferred JSON Schema emission (reference: schema_inference.py).

The reference streams sampled Mongo documents into a genson
``SchemaBuilder`` and writes a JSON Schema draft 2020-12 document
(``/root/reference/biosample_enricher/schema_inference.py:50-66``;
example outputs in ``/root/reference/data/outputs/schema/``). Over a
typed Spark table the *shape* (properties, item types) is free from
``df.schema``; the only data-dependent part is genson's ``required``
lists — a key is required at an object level iff it is present in every
observed instance of that object. That reduces to distributed counting,
and ALL the counts come out of ONE wide aggregation:

- struct levels: a child is null whenever its parent struct is null,
  so plain nested non-null counts need no explode;
- array-of-struct levels: per-element presence is summed with a
  higher-order ``aggregate`` fold over the array — still the same
  single pass, no shuffle beyond the partial-aggregated reduce.

Type mapping matches what genson sees after the reference's
``json.dumps(doc, default=str)`` round-trip: integers → "integer",
floats/decimals → "number", booleans → "boolean", dates/timestamps/
binary → "string" (stringified), arrays → {"type": "array", "items"},
structs → {"type": "object", ...}. A typed column holding null maps to
"not required" — JSON documents omit absent keys, like the reference's
sparse Mongo fields.
"""

from __future__ import annotations

import json
from typing import Any, Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SCHEMA_URI = "https://json-schema.org/draft/2020-12/schema"

_INTEGER_TYPES = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_NUMBER_TYPES = (T.FloatType, T.DoubleType, T.DecimalType)


def json_type_of(dt: T.DataType) -> str:
    """JSON Schema primitive type for a Spark type (strings for
    date/timestamp/binary — the reference stringifies non-JSON types
    with ``default=str`` before feeding genson)."""
    if isinstance(dt, T.BooleanType):
        return "boolean"
    if isinstance(dt, _INTEGER_TYPES):
        return "integer"
    if isinstance(dt, _NUMBER_TYPES):
        return "number"
    if isinstance(dt, T.ArrayType):
        return "array"
    if isinstance(dt, (T.StructType, T.MapType)):
        return "object"
    return "string"


# Getter: field name -> Column at the current object level.
# Contrib: getter -> per-occurrence long contribution.
# Occ: contrib -> per-ROW long expression (sums over this level's
# occurrences within the row). Composing Occs threads array nesting.
Getter = Callable[[str], Column]
Contrib = Callable[[Getter], Column]
Occ = Callable[[Contrib], Column]


def _b2l(b: Column) -> Column:
    return F.when(b, F.lit(1)).otherwise(F.lit(0)).cast("long")


def _walk(st: T.StructType, occ: Occ, pointer: str, out: dict[str, Column]) -> None:
    """Register per-row long contributions: occurrence counts for this
    object level and presence counts for each field, recursively."""
    # occurrence count for this object level: rows at the root, the
    # parent's non-null presence count for a nested struct (already
    # registered under the same pointer — setdefault keeps it), element
    # count for array items
    out.setdefault(pointer or "/", occ(lambda get: F.lit(1).cast("long")))
    for field in st.fields:
        ptr = f"{pointer}/{field.name}"
        fname = field.name
        out[ptr] = occ(lambda get, f=fname: _b2l(get(f).isNotNull()))
        dt = field.dataType
        if isinstance(dt, T.StructType):

            def socc(lb: Contrib, f=fname, parent: Occ = occ) -> Column:
                return parent(
                    lambda get, lb=lb, f=f: lb(
                        lambda name, get=get, f=f: get(f)[name]
                    )
                )

            _walk(dt, socc, ptr, out)
        elif isinstance(dt, T.ArrayType) and isinstance(
            dt.elementType, T.StructType
        ):

            def aocc(lb: Contrib, f=fname, parent: Occ = occ) -> Column:
                # NOTE: lambdas handed to F.aggregate must have exact
                # arity (pyspark inspects the signature to bind lambda
                # variables) — close over lb/f, never default-arg them
                def per_row(get: Getter, lb=lb, f=f) -> Column:
                    def merge(acc: Column, x: Column) -> Column:
                        return acc + lb(lambda name: x[name])

                    return F.coalesce(
                        F.aggregate(get(f), F.lit(0).cast("long"), merge),
                        F.lit(0).cast("long"),
                    )

                return parent(per_row)

            _walk(dt.elementType, aocc, f"{ptr}/items", out)


def _presence_counts(df: DataFrame) -> dict[str, int]:
    """ONE wide aggregation producing every nested occurrence/presence
    count, keyed by JSON pointer ('/' = root rows)."""
    contribs: dict[str, Column] = {}
    _walk(df.schema, lambda lb: lb(lambda name: F.col(name)), "", contribs)
    row = df.agg(
        *[
            F.coalesce(F.sum(expr), F.lit(0)).alias(f"_c{i}")
            for i, expr in enumerate(contribs.values())
        ]
    ).first()
    return {ptr: int(row[f"_c{i}"]) for i, ptr in enumerate(contribs)}


def _node(dt: T.DataType, pointer: str, counts: dict[str, int]) -> dict[str, Any]:
    if isinstance(dt, T.StructType):
        here = counts.get(pointer or "/", 0)
        node: dict[str, Any] = {"type": "object", "properties": {}}
        required = []
        for field in dt.fields:
            ptr = f"{pointer}/{field.name}"
            node["properties"][field.name] = _node(field.dataType, ptr, counts)
            if here > 0 and counts.get(ptr, 0) == here:
                required.append(field.name)
        if required:
            node["required"] = required
        return node
    if isinstance(dt, T.ArrayType):
        if isinstance(dt.elementType, T.StructType):
            items = _node(dt.elementType, f"{pointer}/items", counts)
        else:
            items = {"type": json_type_of(dt.elementType)}
        return {"type": "array", "items": items}
    if isinstance(dt, T.MapType):
        return {
            "type": "object",
            "additionalProperties": {"type": json_type_of(dt.valueType)},
        }
    return {"type": json_type_of(dt)}


def infer_json_schema(
    df: DataFrame, sample_size: int | None = None, seed: int = 42
) -> dict[str, Any]:
    """Inferred JSON Schema (draft 2020-12) for ``df`` — genson-shaped
    output from the typed schema plus one distributed counting pass for
    the ``required`` lists.

    ``sample_size`` mirrors the reference CLI's ``--sample-size``
    (server-side ``$sample`` before the builder,
    schema_inference.py:23,48): a seeded hash-sample caps the counting
    pass at ~``sample_size`` rows. The typed shape is sample-invariant;
    only the required lists are estimated, exactly like genson over a
    Mongo sample. None = full table (the default: counting is one
    aggregation, cheap even at scale)."""
    if sample_size is not None:
        total = df.count()
        if total > sample_size:
            df = df.sample(fraction=sample_size / total, seed=seed)
    counts = _presence_counts(df)
    return {"$schema": _SCHEMA_URI, **_node(df.schema, "", counts)}


def infer_json_schema_df(df: DataFrame) -> DataFrame:
    """The schema document as a 1-row DataFrame (driver artifact)."""
    doc = json.dumps(infer_json_schema(df), sort_keys=True)
    return df.sparkSession.range(1).select(
        F.lit(doc).alias("json_schema"),
        F.lit(_SCHEMA_URI).alias("schema_uri"),
    )


def field_presence(df: DataFrame) -> DataFrame:
    """Tabular (oracle-checkable) face of the inference: one row per
    top-level field with its JSON type and genson-required verdict,
    derived from the same single counting pass."""
    counts = _presence_counts(df)
    total = counts["/"]
    rows = F.array(
        *[
            F.struct(
                F.lit(f.name).alias("field"),
                F.lit(json_type_of(f.dataType)).alias("json_type"),
                F.lit(counts[f"/{f.name}"]).cast("long").alias("present_docs"),
                F.lit(total).cast("long").alias("total_docs"),
                F.lit(
                    total > 0 and counts[f"/{f.name}"] == total
                ).alias("required"),
            )
            for f in df.schema.fields
        ]
    )
    return (
        df.sparkSession.range(1)
        .select(F.explode(rows).alias("r"))
        .select(
            "r.field",
            "r.json_type",
            "r.present_docs",
            "r.total_docs",
            "r.required",
        )
    )
