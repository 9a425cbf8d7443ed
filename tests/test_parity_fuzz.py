"""Property-based three-way parity: hypothesis-generated span
documents (arbitrary kinds/texts/refs/offsets incl. junk, sentinels,
nulls, empties) must produce identical violation rows from the
expression fold, the Arrow UDF, and the Python oracle."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from biosample_enricher_spark.constraints import ConstraintSuite
from biosample_enricher_spark.constraints.reference import validate_rows
from biosample_enricher_spark.spec import DOCUMENTS_SCHEMA

KINDS = st.sampled_from(
    ["text", "image", "audio", "table", "video", "TEXT", "", " ", None]
)
TEXTS = st.one_of(
    st.none(),
    st.sampled_from(
        [
            "", "   ", "n/a", "N/A", "null", "unknown", "None", "ok text",
            # whitespace-padded sentinels: all paths must strip the same
            # class (spec.STRIP_WHITESPACE) — regression for the F.trim
            # (0x20-only) divergence
            "n/a\t", "\nnull ", "\x0bunknown\r", " none\x0c",
            # NBSP-padded sentinel: NOT in the strip class, so it
            # must survive normalization as a PRESENT value
            "\u00a0null\u00a0", "n/a\u3000",
        ]
    ),
    st.text(
        # accents + CJK + the full ASCII strip class + UNICODE
        # whitespace (NBSP, ideographic space, line separator) that is
        # OUTSIDE spec.STRIP_WHITESPACE: all three paths must agree on
        # NOT stripping it (python str.strip() with no args would)
        alphabet="abc XYZ0é中\t\n\r\x0b\x0c\u00a0\u3000\u2028",
        min_size=0,
        max_size=12,
    ),
)
REFS = st.one_of(
    st.none(),
    st.sampled_from(
        ["asset-00000001", "asset-99999999", "n/a", " ", "", "\tn/a\n", "x\r"]
    ),
)
OFFSETS = st.one_of(
    st.none(), st.integers(min_value=-100, max_value=200)
)

SPAN = st.fixed_dictionaries(
    {"kind": KINDS, "text": TEXTS, "media_ref": REFS, "offset": OFFSETS}
)
DOC = st.one_of(st.none(), st.lists(SPAN, min_size=0, max_size=6))
BATCH = st.lists(DOC, min_size=1, max_size=40)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(batch=BATCH)
def test_fuzzed_docs_three_way_parity(spark, batch):
    rows = [
        {"doc_id": f"doc-{i:04d}", "spans": spans} for i, spans in enumerate(batch)
    ]
    df = spark.createDataFrame(rows, DOCUMENTS_SCHEMA)
    expected = sorted(validate_rows(rows))

    results = []
    for use_arrow in (False, True):
        suite = ConstraintSuite(use_arrow_udf=use_arrow, check_uniqueness=False)
        got = sorted(
            (r.doc_id, r.constraint_id, r.field, r.message)
            for r in suite.row_violations(suite.with_partition_id(df)).collect()
        )
        results.append(got)

    assert results[0] == expected, "expression fold diverged from oracle"
    assert results[1] == expected, "Arrow UDF diverged from oracle"
