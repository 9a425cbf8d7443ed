"""Text-analysis operators vs plain-Python recomputation, run over the
driver-provided documents table (sf0.001)."""

from __future__ import annotations

import hashlib
import re

import pytest
from pyspark.sql import functions as F

from biosample_enricher_spark.operators.text import (
    EN_MARKERS,
    WS_RUN,
    fingerprint,
    lang_id,
    quality_score,
    token_count,
)

SF_DIR = "/root/testdata/sf0.001"

# The Python reference model MUST use the same explicit ASCII
# whitespace class as the production ops (ADVICE r4): Python's \s and
# str.strip()/str.lower() are Unicode-aware, so modeling with them
# only passes while the corpus happens to contain no NBSP/ideographic
# space — a latent false failure (or masked divergence) otherwise.
# WS_RUN is a regex-source fragment ("[ \\t\\n\\x0B\\f\\r]+") whose
# escapes Python's re parses identically to Java/RE2 — reuse it
# verbatim so there is one source of truth.


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


def test_token_count_matches_python(spark, docs):
    got = {
        r.doc_id: r.n
        for r in docs.select("doc_id", token_count(F.col("text")).alias("n")).collect()
    }
    for row in docs.collect():
        # F.trim strips ASCII space ONLY — model with strip(' '), not
        # str.strip(); a leading tab would (correctly) yield an empty
        # first token on both sides
        t = (row.text or "").strip(" ")
        expected = 0 if not t else len(re.split(WS_RUN, t))
        assert got[row.doc_id] == expected, row.doc_id


def test_fingerprint_matches_python_and_dedups(spark, docs):
    got = {
        r.doc_id: r.fp
        for r in docs.select("doc_id", fingerprint(F.col("text")).alias("fp")).collect()
    }
    for row in docs.collect():
        # space-only trim after WS-run collapse (every WS char is now a
        # plain space), matching F.trim's ASCII-space semantics
        canon = re.sub(WS_RUN, " ", (row.text or "").lower()).strip(" ")
        assert got[row.doc_id] == hashlib.md5(canon.encode()).hexdigest()


def test_lang_id_mostly_agrees_with_label(spark, docs):
    scored = docs.select("lang", lang_id(F.col("text")).alias("pred"))
    rows = scored.collect()
    en_rows = [r for r in rows if r.lang == "en"]
    if en_rows:
        acc = sum(r.pred == "en" for r in en_rows) / len(en_rows)
        assert acc > 0.5, f"en accuracy {acc}"
    # every prediction is from the closed vocabulary
    assert {r.pred for r in rows} <= {"en", "de", "fr", "es", "und"}


def test_quality_score_bounded_and_monotone_on_length(spark, docs):
    scores = [
        r.q for r in docs.select(quality_score(F.col("text")).alias("q")).collect()
    ]
    assert all(0.0 <= s <= 1.0 for s in scores)
    tiny = spark.createDataFrame([("a b",), ("word " * 200,)], ["text"])
    lo, hi = [
        r.q for r in tiny.select(quality_score(F.col("text")).alias("q")).collect()
    ]
    assert hi > lo


def test_en_marker_counting_matches_python(spark):
    """Split-token counting equals ASCII-\\b regex counting on ASCII
    text — the equivalence _marker_regex documents."""
    text = "The cat and the dog went to the park and that was fun"
    df = spark.createDataFrame([(text,)], ["text"])
    from biosample_enricher_spark.operators.text import (
        _marker_regex,
        marker_hits,
    )

    got = df.select(marker_hits(F.col("text"), EN_MARKERS).alias("n")).first().n
    expected = len(re.findall(_marker_regex(EN_MARKERS), text.lower()))
    assert got == expected == 8


def test_sha1_matches_hashlib(spark):
    """F21 sha1 tier: Spark's sha1 must equal hashlib on real texts
    (DuckDB has no sha1, so the driver-checked tier is md5 and this is
    the sha1 parity pin)."""
    import hashlib

    from pyspark.sql import functions as F

    rows = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .where(F.col("text").isNotNull())
        .limit(50)
        .select("text", F.sha1(F.col("text")).alias("d"))
        .collect()
    )
    assert rows
    for r in rows:
        assert r.d == hashlib.sha1(r.text.encode("utf-8")).hexdigest()


def test_bpe_token_count_pinned(spark):
    from biosample_enricher_spark.operators.text import bpe_token_count

    cases = [
        ("The quick brown fox's 42 jumps, don't stop!", 12),
        ("", 0),
        ("   ", 1),
        # "déjà", " vu", " 中文", " 123", "abc" — digit→letter boundary
        # splits without a space
        ("déjà vu 中文 123abc", 5),
        (None, None),
    ]
    df = spark.createDataFrame(
        [(i, c[0]) for i, c in enumerate(cases)], "i long, t string"
    )
    got = {
        r.i: r.n
        for r in df.select("i", bpe_token_count(F.col("t")).alias("n")).collect()
    }
    assert got == {i: c[1] for i, c in enumerate(cases)}


# --- cross-engine fuzz: Spark (Java regex) vs DuckDB (RE2) ---------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

FUZZ_TEXTS = st.lists(
    st.text(
        # letters, digits, contraction quotes, punctuation runs, and the
        # FULL whitespace battleground: \x0b is in Java's \s but not
        # RE2's — the explicit WS_CHARS class must make the engines
        # agree anyway (r3 ADVICE item). NBSP/ideographic space are
        # non-ASCII whitespace: outside the regex class in BOTH engines
        # AND outside F.trim's ASCII-space class — the oracle pins
        # DuckDB's trim to ' ' because its default strips Unicode.
        alphabet="ab Z0 9'.,!-\t\n\r\x0b\x0c 　é中",
        min_size=0,
        max_size=24,
    ),
    min_size=1,
    max_size=30,
)


@settings(
    max_examples=6, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(texts=FUZZ_TEXTS)
def test_tokenizer_fingerprint_bpe_cross_engine_fuzz(spark, texts):
    """token_count, fingerprint, and bpe_token_count must agree with
    DuckDB on arbitrary text INCLUDING vertical tab — the regex class
    is shared, so any \\s-style divergence (Java includes \\x0b, RE2
    does not) would surface here before it surfaces in a driver row."""
    import duckdb

    from biosample_enricher_spark.operators.text import (
        BPE_ISH_PATTERN,
        WS_RUN,
        bpe_token_count,
        fingerprint,
        token_count,
    )
    from pyspark.sql import functions as F

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        r.id: (r.n_tok, r.n_bpe, r.fp)
        for r in df.select(
            "id",
            token_count(F.col("text")).alias("n_tok"),
            bpe_token_count(F.col("text")).alias("n_bpe"),
            fingerprint(F.col("text")).alias("fp"),
        ).collect()
    }

    con = duckdb.connect()
    con.execute("CREATE TABLE tt (id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO tt VALUES (?, ?)", rows)
    pat = BPE_ISH_PATTERN.replace("'", "''")
    exp = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(
            f"""
            SELECT id,
              -- trim(x, ' '): DuckDB's default trim strips UNICODE
              -- whitespace (NBSP strips to ''), Spark's F.trim strips
              -- ASCII space only — the oracle must pin Spark's class
              CASE WHEN length(trim(text, ' ')) = 0 THEN 0
                   ELSE len(string_split_regex(trim(text, ' '), '{WS_RUN}'))
              END AS n_tok,
              len(regexp_extract_all(text, '{pat}')) AS n_bpe,
              md5(trim(regexp_replace(lower(text), '{WS_RUN}', ' ', 'g'), ' ')) AS fp
            FROM tt
            """
        ).fetchall()
    }
    assert got == exp


# alphabet that can actually FORM the EN markers (the/and/of/to/in/is/
# that/for/with/was) plus boundary-relevant junk: digits and '_' (both
# \w — a marker glued to them must NOT count), punctuation/whitespace
# (non-\w — must count), non-ASCII letters (é/中: the sharp Java-\b vs
# RE2-\b case), UPPERCASE ASCII (exercises the case fold), and the
# case-mapping landmines İ (Spark full-maps to i+combining-dot, DuckDB
# to plain i — why the fold is ASCII translate, not lower()) and ß
MARKER_TEXTS = st.lists(
    st.text(
        alphabet="thandofiswTHEOF ér中İß0_.'-\t\x0b",
        min_size=0,
        max_size=24,
    ),
    min_size=1,
    max_size=30,
)


@settings(
    max_examples=6, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(texts=MARKER_TEXTS)
def test_lang_marker_hits_cross_engine_fuzz(spark, texts):
    """Marker counting must agree between engines on arbitrary text
    including non-ASCII letters next to markers — the case where
    \\b-based counting provably DIVERGES (Java's \\b is Unicode-aware,
    RE2's is ASCII; measured: 'ofé' counts 0 in Java, 1 in RE2), which
    is why both sides use split-token counting instead. lang_id is
    pure arithmetic over these counts, so its parity follows."""
    import duckdb

    from biosample_enricher_spark.operators.text import (
        ASCII_LOWER,
        ASCII_UPPER,
        EN_MARKERS,
        WORD_SPLIT,
        marker_hits,
    )
    from pyspark.sql import functions as F

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        r.id: r.n_en
        for r in df.select(
            "id", marker_hits(F.col("text"), EN_MARKERS).alias("n_en")
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE tt (id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO tt VALUES (?, ?)", rows)
    lst = ", ".join(f"'{m}'" for m in EN_MARKERS)
    exp = {
        r[0]: r[1]
        for r in con.execute(
            f"""SELECT id, len(list_filter(
                  string_split_regex(
                    translate(text, '{ASCII_UPPER}', '{ASCII_LOWER}'),
                    '{WORD_SPLIT}'),
                  x -> x IN ({lst}))) FROM tt"""
        ).fetchall()
    }
    assert got == exp
