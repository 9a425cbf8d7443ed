"""Span-sequence integrity as pure Column expressions (JVM fast path).

Semantically identical to the Arrow UDF (``udf.py``) and the Python
oracle (``reference.py``) — asserted in tests/test_parity.py — but runs
entirely inside Catalyst/Tungsten with no Python boundary: one
``F.aggregate`` left-fold over the ``spans`` array carries
``(index, prev_offset, violations)`` state through the sequence, so the
whole per-row check is a single whole-stage-codegen-friendly projection.

This is the default path for benchmarks; the Arrow UDF remains the
mandated reference path and a drop-in alternative (``use_arrow_udf=True``
on the suite).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..spec import (
    C_KIND_VOCAB,
    C_MEDIA_REF_PRESENCE,
    C_OFFSET_ORDERING,
    C_SPANS_NONEMPTY,
    C_TEXT_PRESENCE,
    KIND_VOCAB,
    MEDIA_KINDS,
    MSG_KIND_NULL,
    MSG_OFFSET_NULL,
    MSG_REF_MISSING,
    MSG_REF_ON_TEXT,
    MSG_SPANS_EMPTY,
    MSG_TEXT_MISSING,
    MSG_TEXT_ON_MEDIA,
    NULL_SENTINELS,
    STRIP_WHITESPACE,
)

_VIOL_ARRAY_TYPE = (
    "array<struct<constraint_id:string,field:string,message:string>>"
)
def norm_is_null(c: Column) -> Column:
    """True when the string is absent after strip + sentinel folding
    (Spark analog of spec.normalize_text; reference:
    ``metrics/aligner.py:234-238``, ``models.py:133``).

    Strips exactly ``spec.STRIP_WHITESPACE`` — the set the UDF/oracle
    paths strip (F.trim would strip only 0x20, silently diverging on
    tab/newline-padded sentinels). btrim with an explicit char set is a
    plain two-ended scan — no regex machinery in the hot fold."""
    stripped = F.btrim(c, F.lit(STRIP_WHITESPACE))
    return c.isNull() | F.lower(stripped).isin(*sorted(NULL_SENTINELS))


def _item(cid: str, field: Column, message: Column) -> Column:
    return F.struct(
        F.lit(cid).alias("constraint_id"),
        field.alias("field"),
        message.alias("message"),
    )


def _span_is_clean(s: Column, prev: Column) -> Column:
    """Cheap allocation-free predicate: True iff the span produces NO
    violation. Must stay the exact complement of the union of
    candidates in _span_items (asserted by the parity tests)."""
    kind = s["kind"]
    text = s["text"]
    ref = s["media_ref"]
    off = s["offset"]
    presence_ok = (
        F.when(kind == "text", ~norm_is_null(text) & ref.isNull())
        .otherwise(text.isNull() & ~norm_is_null(ref))
    )
    offset_ok = off.isNotNull() & (off >= 0) & (prev.isNull() | (off > prev))
    return (
        kind.isNotNull()
        & kind.isin(*KIND_VOCAB)
        & presence_ok
        & offset_ok
    )


def _span_items(s: Column, idx: Column, prev: Column) -> Column:
    """Candidate violation structs for one span, each guarded by a
    boolean; invalid candidates are filtered out."""
    kind = s["kind"]
    text = s["text"]
    ref = s["media_ref"]
    off = s["offset"]

    is_text = kind == "text"
    is_media = kind.isin(*MEDIA_KINDS)

    f_kind = F.format_string("spans[%d].kind", idx)
    f_text = F.format_string("spans[%d].text", idx)
    f_ref = F.format_string("spans[%d].media_ref", idx)
    f_off = F.format_string("spans[%d].offset", idx)

    def guarded(cond: Column, cid: str, field: Column, message: Column) -> Column:
        return F.struct(
            cond.alias("bad"),
            F.lit(cid).alias("constraint_id"),
            field.alias("field"),
            message.alias("message"),
        )

    candidates = F.array(
        guarded(kind.isNull(), C_KIND_VOCAB, f_kind, F.lit(MSG_KIND_NULL)),
        guarded(
            kind.isNotNull() & ~kind.isin(*KIND_VOCAB),
            C_KIND_VOCAB,
            f_kind,
            F.format_string("kind not in vocabulary: %s", kind),
        ),
        guarded(is_text & norm_is_null(text), C_TEXT_PRESENCE, f_text,
                F.lit(MSG_TEXT_MISSING)),
        guarded(is_media & text.isNotNull(), C_TEXT_PRESENCE, f_text,
                F.lit(MSG_TEXT_ON_MEDIA)),
        guarded(is_media & norm_is_null(ref), C_MEDIA_REF_PRESENCE, f_ref,
                F.lit(MSG_REF_MISSING)),
        guarded(is_text & ref.isNotNull(), C_MEDIA_REF_PRESENCE, f_ref,
                F.lit(MSG_REF_ON_TEXT)),
        guarded(off.isNull(), C_OFFSET_ORDERING, f_off, F.lit(MSG_OFFSET_NULL)),
        guarded(off.isNotNull() & (off < 0), C_OFFSET_ORDERING, f_off,
                F.format_string("offset negative: %d", off)),
        guarded(
            off.isNotNull() & prev.isNotNull() & (off <= prev),
            C_OFFSET_ORDERING,
            f_off,
            F.format_string("offset not increasing: %d <= %d", off, prev),
        ),
    )
    kept = F.filter(candidates, lambda c: F.coalesce(c["bad"], F.lit(False)))
    return F.transform(
        kept,
        lambda c: F.struct(
            c["constraint_id"].alias("constraint_id"),
            c["field"].alias("field"),
            c["message"].alias("message"),
        ),
    )


# Building the fold Column below costs ~0.3 s of Python/py4j calls
# (hundreds of Column-method round-trips); every ConstraintSuite run
# re-requests the identical tree over the UNRESOLVED F.col("spans"),
# so that one canonical instance is memoized. Deliberately NOT keyed
# on str(column): a DataFrame-bound df["spans"] stringifies the same
# as the unresolved F.col("spans") (verified), so a string-keyed cache
# could hand a plan-bound tree to an unrelated DataFrame. Unresolved
# Columns are immutable expression descriptions — reusing the one
# canonical instance across DataFrames/sessions in a process is safe
# (analysis copies the tree).
_CANONICAL_SPAN_VIOLATIONS: Column | None = None


def span_violations_canonical() -> Column:
    """The memoized fold over the unresolved column ``spans`` — the
    form the constraint suite and streaming validator use."""
    global _CANONICAL_SPAN_VIOLATIONS
    if _CANONICAL_SPAN_VIOLATIONS is None:
        _CANONICAL_SPAN_VIOLATIONS = _build_span_violations(F.col("spans"))
    return _CANONICAL_SPAN_VIOLATIONS


def span_violations(spans: Column) -> Column:
    """``array<struct<constraint_id, field, message>>`` per document,
    computed by a single left-fold over the spans array. Always builds
    a fresh tree for the caller's column — a cache keyed on the column
    is unsound because ``str()`` renders a DataFrame-bound
    ``df["spans"]`` identically to the unresolved ``F.col("spans")``.
    Hot-path callers (the suite, the streaming validator) use
    ``span_violations_canonical()`` instead, which memoizes the one
    unresolved canonical instance."""
    return _build_span_violations(spans)


def _build_span_violations(spans: Column) -> Column:
    init = F.struct(
        F.lit(0).alias("idx"),
        F.lit(None).cast("int").alias("prev"),
        F.array().cast(_VIOL_ARRAY_TYPE).alias("viols"),
    )

    empty_items = F.array().cast(_VIOL_ARRAY_TYPE)

    def merge(acc: Column, s: Column) -> Column:
        # fast path: ~97% of spans are clean — skip building the
        # 9-candidate struct array (and its messages) entirely, keeping
        # allocation pressure (and GC) off the hot loop
        items = F.when(_span_is_clean(s, acc["prev"]), empty_items).otherwise(
            _span_items(s, acc["idx"], acc["prev"])
        )
        new_prev = F.when(s["offset"].isNotNull(), s["offset"]).otherwise(acc["prev"])
        return F.struct(
            (acc["idx"] + 1).alias("idx"),
            new_prev.cast("int").alias("prev"),
            F.when(F.size(items) == 0, acc["viols"])
            .otherwise(F.concat(acc["viols"], items))
            .alias("viols"),
        )

    folded = F.aggregate(spans, init, merge, lambda acc: acc["viols"])
    empty_item = F.array(
        _item(C_SPANS_NONEMPTY, F.lit("spans"), F.lit(MSG_SPANS_EMPTY))
    )
    return (
        F.when(spans.isNull() | (F.size(spans) == 0), empty_item)
        .otherwise(folded)
    )
