"""Plain-Python reference implementation of the per-row constraint
verdicts — the parity oracle.

This deliberately mirrors the *reference repo's* execution style —
one document at a time, ordinary Python control flow, verdict +
``[{field, message}]`` error rows — so the Spark paths (Arrow UDF and
Column expressions) can be asserted byte-identical against it.
Reference analogs:

- verdict/error-row shape: ``/root/reference/biosample_enricher/
  synthetic_validation_demo.py:69-94`` (pass/fail partition + error list),
- field rules with ge/le bounds + enum regex: ``models.py:15-134``,
- null-sentinel + strip normalization: ``metrics/aligner.py:234-238``,
  ``models.py:133``,
- positional ordering invariants: ``metrics/aligner.py:66-74``.

This module is used only in tests and never in the Spark hot path.
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping
from typing import Any

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
    normalize_text,
)

Violation = tuple[str, str, str]  # (constraint_id, field, message)


def validate_spans(spans: Iterable[Mapping[str, Any]] | None) -> list[Violation]:
    """Validate one document's span sequence; return its violation rows."""
    out: list[Violation] = []
    if spans is None:
        return [(C_SPANS_NONEMPTY, "spans", MSG_SPANS_EMPTY)]
    spans = list(spans)
    if not spans:
        return [(C_SPANS_NONEMPTY, "spans", MSG_SPANS_EMPTY)]

    prev_offset: int | None = None
    for idx, span in enumerate(spans):
        kind = span.get("kind")
        text = span.get("text")
        media_ref = span.get("media_ref")
        offset = span.get("offset")

        if kind is None:
            out.append((C_KIND_VOCAB, f"spans[{idx}].kind", MSG_KIND_NULL))
        elif kind not in KIND_VOCAB:
            out.append(
                (C_KIND_VOCAB, f"spans[{idx}].kind", MSG_KIND_BAD.format(kind=kind))
            )
        elif kind == "text":
            if normalize_text(text) is None:
                out.append((C_TEXT_PRESENCE, f"spans[{idx}].text", MSG_TEXT_MISSING))
            if media_ref is not None:
                out.append(
                    (C_MEDIA_REF_PRESENCE, f"spans[{idx}].media_ref", MSG_REF_ON_TEXT)
                )
        elif kind in MEDIA_KINDS:
            if normalize_text(media_ref) is None:
                out.append(
                    (C_MEDIA_REF_PRESENCE, f"spans[{idx}].media_ref", MSG_REF_MISSING)
                )
            if text is not None:
                out.append((C_TEXT_PRESENCE, f"spans[{idx}].text", MSG_TEXT_ON_MEDIA))

        if offset is None:
            out.append((C_OFFSET_ORDERING, f"spans[{idx}].offset", MSG_OFFSET_NULL))
        else:
            if offset < 0:
                out.append(
                    (
                        C_OFFSET_ORDERING,
                        f"spans[{idx}].offset",
                        MSG_OFFSET_NEG.format(offset=offset),
                    )
                )
            if prev_offset is not None and offset <= prev_offset:
                out.append(
                    (
                        C_OFFSET_ORDERING,
                        f"spans[{idx}].offset",
                        MSG_OFFSET_ORDER.format(offset=offset, prev=prev_offset),
                    )
                )
            prev_offset = offset
    return out


def validate_rows(
    rows: Iterable[Mapping[str, Any]],
) -> list[tuple[str, str, str, str]]:
    """Validate collected document rows → sorted
    ``(doc_id, constraint_id, field, message)`` tuples."""
    out: list[tuple[str, str, str, str]] = []
    for row in rows:
        doc_id = row["doc_id"]
        for cid, field, message in validate_spans(row["spans"]):
            out.append((doc_id, cid, field, message))
    return sorted(out)
