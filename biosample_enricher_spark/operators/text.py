"""Text-analysis operators for large-scale training-data pipelines:
token counting, language-ID heuristic, quality scoring, and document
fingerprinting — all pure Column expressions (JVM-side, codegen'd; no
Python in the hot path).

These extend the engine beyond the reference's operator set (the
reference's closest analogs are keyword-containment classification,
``/root/reference/biosample_enricher/host_detector.py:61-105``, and
completeness scoring, ``models.py:86-112``), as required for the
training-data pipeline surface.

All functions take a ``text`` Column and return a Column, so they
compose into any select; the `queries()` driver contract exposes them
over the driver's ``documents(doc_id, text, lang, source, n_chars)``
table with DuckDB oracle SQL.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small fixed stopword sets for the n-gram language heuristic. Keeping
# them tiny and hard-coded makes the scoring reproducible in ANSI SQL
# for the DuckDB oracle.
EN_MARKERS = ("the", "and", "of", "to", "in", "is", "that", "for", "with", "was")
DE_MARKERS = ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "von", "zu")
FR_MARKERS = ("le", "la", "les", "et", "est", "une", "que", "pour", "dans", "des")
ES_MARKERS = ("el", "la", "los", "las", "es", "que", "una", "por", "para", "con")


# Java regex \s is [ \t\n\x0B\f\r]; RE2 (DuckDB) \s is [\t\n\f\r ] —
# no vertical tab. Any pattern shipped to BOTH engines must spell the
# whitespace class explicitly or \x0B-containing text silently counts
# differently on the two sides. WS_CHARS is the Java set (the superset)
# written with escapes both engines parse identically.
WS_CHARS = r" \t\n\x0B\f\r"
WS_RUN = "[" + WS_CHARS + "]+"


def token_count(text: Column) -> Column:
    """Whitespace token count; empty/blank → 0."""
    trimmed = F.trim(text)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, WS_RUN))
    )


# GPT-2-style pretokenizer, lookahead-free so Java regex (Spark) and
# RE2 (DuckDB oracle) agree match-for-match: contraction suffixes,
# optional-space letter runs, digit runs, punctuation runs, whitespace
# runs. The true GPT-2 pattern's trailing-whitespace lookahead
# (\s+(?!\S)) is unsupported by RE2; dropping it merges a token's
# leading space into the preceding whitespace run, changing counts by
# the same amount in both engines. Whitespace is the explicit WS_CHARS
# class, never \s (Java-vs-RE2 \x0B divergence).
BPE_ISH_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^"
    + WS_CHARS
    + r"\p{L}\p{N}]+|["
    + WS_CHARS
    + "]+"
)


def bpe_token_count(text: Column) -> Column:
    """BPE-ish token count: matches of the GPT-2-style pretokenizer
    (the 'how many tokens will this cost' pipeline estimator); null →
    null, empty → 0."""
    return F.regexp_count(text, F.lit(BPE_ISH_PATTERN))


# the word-character class both engines agree on. NEVER use \b for
# cross-engine marker matching: Java's \b is Unicode-aware regardless
# of flags ('ofé' has NO boundary after 'of' in Java) while RE2's \b
# is ASCII-\w based ('ofé' DOES end a word in RE2) — measured
# divergence on é/中-adjacent markers. Splitting on the explicit
# non-word class and comparing whole tokens has exactly one meaning
# in both engines (and equals ASCII-\b counting on ASCII text).
WORD_SPLIT = r"[^a-z0-9_]+"

# ASCII-only case fold for marker matching. lower() is ALSO an
# engine-divergence source: Spark applies full Unicode case mapping
# (lower('İ') = 'i' + combining dot U+0307) while DuckDB's utf8proc
# gives plain 'i' — measured 0-vs-1 marker counts on 'İs'. The
# markers are ASCII words, so a char-for-char ASCII translate (which
# means exactly one thing in both engines) is the correct fold;
# non-ASCII uppercase stays unfolded and falls into the split class
# consistently on both sides.
ASCII_UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
ASCII_LOWER = "abcdefghijklmnopqrstuvwxyz"


def ascii_lower(text: Column) -> Column:
    return F.translate(text, ASCII_UPPER, ASCII_LOWER)


def _marker_regex(markers: tuple[str, ...]) -> str:
    """ASCII-\\b marker alternation — the plain-Python parity model
    (python re's \\b on ASCII-folded ASCII text equals the split-token
    count; pinned in tests/test_text_ops.py); engine code paths use
    the split-token form below."""
    return r"\b(" + "|".join(markers) + r")\b"


def marker_hits(text: Column, markers: tuple[str, ...]) -> Column:
    """Count of language-marker word occurrences (ASCII-case-
    insensitive): maximal [a-z0-9_]+ runs of the ASCII-folded text
    that equal a marker. Null text → null (matching the old
    regexp_count form)."""
    marker_arr = F.array(*[F.lit(m) for m in markers])

    def is_marker(tok: Column) -> Column:
        return F.array_contains(marker_arr, tok)

    toks = F.split(ascii_lower(text), WORD_SPLIT)
    return F.when(
        text.isNotNull(), F.size(F.filter(toks, is_marker))
    )


def lang_scores(text: Column) -> dict[str, Column]:
    return {
        "en": marker_hits(text, EN_MARKERS),
        "de": marker_hits(text, DE_MARKERS),
        "fr": marker_hits(text, FR_MARKERS),
        "es": marker_hits(text, ES_MARKERS),
    }


def lang_id(text: Column) -> Column:
    """Pick the language with the most marker hits; 'und' when no
    markers at all. Ties break by fixed language order (en,de,fr,es) —
    deterministic and SQL-reproducible."""
    scores = lang_scores(text)
    best = F.greatest(*scores.values())
    out = F.lit("und")
    # reversed order so earlier languages win ties in the when-chain
    for code in ("es", "fr", "de", "en"):
        out = F.when((scores[code] == best) & (best > 0), F.lit(code)).otherwise(out)
    return out


def punct_ratio(text: Column) -> Column:
    n = F.length(text)
    punct = F.length(F.regexp_replace(text, r"[^!-/:-@\[-`{-~]", ""))
    return F.when(n > 0, punct / n).otherwise(F.lit(0.0))


def alpha_ratio(text: Column) -> Column:
    n = F.length(text)
    alpha = F.length(F.regexp_replace(text, r"[^A-Za-z]", ""))
    return F.when(n > 0, alpha / n).otherwise(F.lit(0.0))


def quality_score_raw(text: Column) -> Column:
    """Unrounded [0,1] quality composite: length band + alpha ratio −
    punctuation penalty. Analog of the reference's completeness score
    (``models.py:86-112``): a bounded composite of simple signals.
    Kept unrounded so the oracle can compare floor-scaled integers
    (round-half-up vs half-even diverges on dyadic rationals)."""
    n_tok = token_count(text)
    len_component = F.least(n_tok / F.lit(100.0), F.lit(1.0)) * 0.4
    alpha_component = alpha_ratio(text) * 0.4
    punct_penalty = F.least(punct_ratio(text) * 2.0, F.lit(0.2))
    score = len_component + alpha_component + F.lit(0.2) - punct_penalty
    return F.greatest(F.least(score, F.lit(1.0)), F.lit(0.0))


def quality_score(text: Column) -> Column:
    """``quality_score_raw`` rounded to 6 dp (the user-facing form)."""
    return F.round(quality_score_raw(text), 6)


def normalize_for_fingerprint(text: Column) -> Column:
    """Canonical form for dedup fingerprints: lowercase, collapse all
    whitespace runs to single spaces, strip. Analog of canonical
    request keys (``http_cache.py:20-44``)."""
    return F.trim(F.regexp_replace(F.lower(text), WS_RUN, " "))


def fingerprint(text: Column) -> Column:
    """Deterministic 128-bit content fingerprint (md5 of the canonical
    form) — portable to the DuckDB oracle."""
    return F.md5(normalize_for_fingerprint(text))


def ascii_word_tokens(text: Column) -> Column:
    """Maximal ``[a-z0-9_]+`` runs of the ASCII-folded text, empties
    dropped — the cross-engine tokenization every SQL-oracled token
    operator shares (split class + ASCII fold chosen for the exact
    Java-regex/RE2/utf8proc parity reasons documented on WORD_SPLIT /
    ascii_lower above). Null text → null."""
    return F.filter(
        F.split(ascii_lower(text), WORD_SPLIT), lambda x: x != F.lit("")
    )
