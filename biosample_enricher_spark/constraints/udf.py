"""Span-sequence integrity as a single vectorized Arrow UDF.

The mandated per-row path (``BASELINE.json:north_star``): one scalar
``pandas_udf`` taking the ``spans`` column (Arrow-batched
``array<struct>``) and returning ``array<struct<constraint_id, field,
message>>`` per document — the reference's ``[{field, message}]`` error
rows (``/root/reference/biosample_enricher/synthetic_validation_demo.py:
82-94``) with the constraint id attached.

Implementation is batch-vectorized: each Arrow batch is flattened once
into columnar numpy/pandas arrays (one entry per span), all predicate
masks are computed vectorized, and Python-level message formatting runs
only for the (rare) violating spans. This is an *independent*
implementation from the plain-Python oracle in ``reference.py``; parity
between the two is asserted in tests/test_parity.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from ..spec import (
    C_KIND_VOCAB,
    C_MEDIA_REF_PRESENCE,
    C_OFFSET_ORDERING,
    C_SPANS_NONEMPTY,
    C_TEXT_PRESENCE,
    KIND_VOCAB,
    MEDIA_KINDS,
    MSG_KIND_BAD,
    MSG_KIND_NULL,
    MSG_OFFSET_NEG,
    MSG_OFFSET_NULL,
    MSG_OFFSET_ORDER,
    MSG_REF_MISSING,
    MSG_REF_ON_TEXT,
    MSG_SPANS_EMPTY,
    MSG_TEXT_MISSING,
    MSG_TEXT_ON_MEDIA,
    NULL_SENTINELS,
    STRIP_WHITESPACE,
    VIOLATION_ITEM_TYPE,
)

_EMPTY_ROW_ITEM = {
    "constraint_id": C_SPANS_NONEMPTY,
    "field": "spans",
    "message": MSG_SPANS_EMPTY,
}


def _norm_null_mask(values: pd.Series) -> np.ndarray:
    """True where the string is absent after strip + sentinel folding
    (vectorized analog of spec.normalize_text; strips the shared
    spec.STRIP_WHITESPACE class so all three paths agree char-for-char)."""
    stripped = values.str.strip(STRIP_WHITESPACE).str.lower()
    return values.isna().to_numpy() | stripped.isin(NULL_SENTINELS).to_numpy()


def _validate_batch(
    kinds_col: pd.Series,
    texts_col: pd.Series,
    refs_col: pd.Series,
    offsets_col: pd.Series,
) -> pd.Series:
    """Validate one Arrow batch given the four parallel field arrays
    (``spans.kind`` etc. — Spark projects an array<struct> into
    per-field arrays JVM-side, so Python never touches struct dicts)."""
    n_rows = len(kinds_col)
    out: list[list[dict]] = [[] for _ in range(n_rows)]

    # ---- flatten the batch to columnar span arrays (one pass) ----
    kind_rows = kinds_col.tolist()
    lengths = np.fromiter(
        (0 if r is None else len(r) for r in kind_rows), dtype=np.int64,
        count=n_rows,
    )
    for r in np.flatnonzero(lengths == 0):
        out[r].append(dict(_EMPTY_ROW_ITEM))
    if int(lengths.sum()) == 0:
        return pd.Series(out)

    di = np.repeat(np.arange(n_rows, dtype=np.int64), lengths)
    si = np.concatenate([np.arange(n, dtype=np.int64) for n in lengths if n > 0])
    nonempty = lengths > 0
    kind_s = pd.Series(
        np.concatenate([np.asarray(r, dtype=object) for r, ok in
                        zip(kind_rows, nonempty) if ok]),
        dtype="object",
    )

    def _flat(col: pd.Series) -> np.ndarray:
        return np.concatenate(
            [np.asarray(r, dtype=object) for r, ok in zip(col.tolist(), nonempty) if ok]
        )

    text_s = pd.Series(_flat(texts_col), dtype="object")
    ref_s = pd.Series(_flat(refs_col), dtype="object")
    off_s = pd.Series(_flat(offsets_col)).astype("Float64")

    kind_null = kind_s.isna().to_numpy()
    kind_bad = ~kind_null & ~kind_s.isin(KIND_VOCAB).to_numpy()
    is_text_kind = (kind_s == "text").fillna(False).to_numpy()
    is_media_kind = kind_s.isin(MEDIA_KINDS).fillna(False).to_numpy()

    text_absent = _norm_null_mask(text_s)
    ref_absent = _norm_null_mask(ref_s)
    text_raw_set = ~text_s.isna().to_numpy()
    ref_raw_set = ~ref_s.isna().to_numpy()

    m_text_missing = is_text_kind & text_absent
    m_ref_on_text = is_text_kind & ref_raw_set
    m_ref_missing = is_media_kind & ref_absent
    m_text_on_media = is_media_kind & text_raw_set

    off_null = off_s.isna().to_numpy()
    off_vals = off_s.to_numpy(dtype="float64", na_value=np.nan)
    m_off_neg = ~off_null & (off_vals < 0)
    # previous non-null offset within each document: forward-fill the
    # offset column per doc group, then shift by one within the group.
    off_pd = pd.Series(off_vals)
    grouped = off_pd.groupby(di)
    prev = grouped.ffill().groupby(di).shift(1).to_numpy()
    m_off_order = ~off_null & ~np.isnan(prev) & (off_vals <= prev)

    def emit(mask: np.ndarray, cid: str, fld: str, msg_fn) -> None:
        for k in np.flatnonzero(mask):
            out[di[k]].append(
                {
                    "constraint_id": cid,
                    "field": f"spans[{si[k]}].{fld}",
                    "message": msg_fn(k),
                }
            )

    emit(kind_null, C_KIND_VOCAB, "kind", lambda k: MSG_KIND_NULL)
    emit(kind_bad, C_KIND_VOCAB, "kind",
         lambda k: MSG_KIND_BAD.format(kind=kind_s.iat[k]))
    emit(m_text_missing, C_TEXT_PRESENCE, "text", lambda k: MSG_TEXT_MISSING)
    emit(m_text_on_media, C_TEXT_PRESENCE, "text", lambda k: MSG_TEXT_ON_MEDIA)
    emit(m_ref_missing, C_MEDIA_REF_PRESENCE, "media_ref", lambda k: MSG_REF_MISSING)
    emit(m_ref_on_text, C_MEDIA_REF_PRESENCE, "media_ref", lambda k: MSG_REF_ON_TEXT)
    emit(off_null, C_OFFSET_ORDERING, "offset", lambda k: MSG_OFFSET_NULL)
    emit(m_off_neg, C_OFFSET_ORDERING, "offset",
         lambda k: MSG_OFFSET_NEG.format(offset=int(off_vals[k])))
    emit(m_off_order, C_OFFSET_ORDERING, "offset",
         lambda k: MSG_OFFSET_ORDER.format(offset=int(off_vals[k]),
                                           prev=int(prev[k])))
    return pd.Series(out)


@pandas_udf(T.ArrayType(VIOLATION_ITEM_TYPE))
def span_violations_udf(
    kinds: pd.Series, texts: pd.Series, refs: pd.Series, offsets: pd.Series
) -> pd.Series:
    return _validate_batch(kinds, texts, refs, offsets)


def span_violations(spans: Column) -> Column:
    """Column of ``array<struct<constraint_id, field, message>>``.

    The array<struct> is decomposed into four parallel field arrays
    JVM-side (``spans.kind`` is an ``array<string>`` projection) so the
    Arrow transfer carries flat primitive arrays, not structs — ~4-5×
    less Python-side unpacking work per batch.

    Note: a row whose ``spans`` is NULL arrives here as four NULL
    arrays, indistinguishable from spans=[] — both yield the
    spans_nonempty violation, matching the oracle's semantics for
    missing-or-empty.
    """
    return span_violations_udf(
        spans.getField("kind"),
        spans.getField("text"),
        spans.getField("media_ref"),
        spans.getField("offset"),
    )
