"""Pure-DataFrame Bloom filter for referential pre-filtering at scale.

Spark's internal ``bloom_filter_agg`` / ``might_contain`` expressions
are not in the public function registry (verified UNRESOLVED_ROUTINE on
this build), so this is the same construction from first principles,
entirely in Column expressions:

- **build**: k double-hashed bit positions per catalog key
  (``xxhash64(key, i)`` — JVM-side, codegen'd) → ``(word, bit)`` →
  ``groupBy(word).agg(bit_or(1 << bit))`` → densified, sorted, and
  collapsed to ONE row holding the whole filter as ``array<long>``.
  The build shuffles only (word, partial-or) pairs — bounded by
  m/64 words, not catalog size — and the result row is
  m/8 bytes (2 MiB at m=2²⁴), broadcastable where the exact key set
  (8+ bytes/key × 10⁹ keys) is not.
- **probe**: cross-join the one filter row (broadcast) and evaluate
  the k conjunctive bit tests as a folded boolean Column — zero
  shuffle of the fact side, no Python.

No false negatives ever: a key that fails the probe is DEFINITELY
absent from the catalog. A key that passes may be a false positive at
the standard (1 − e^{−kn/m})^k rate, so presence-critical paths verify
survivors with an exact join (``bloom_referential_violations``).

Reference analog: the reference validates media_ref existence by exact
lookup against its asset catalog (adapters.py:327-338 content-identity
semantics); this is the 100-TB tier where the catalog no longer
broadcasts as an exact set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _one_shl(nbits: Column) -> Column:
    """1L << nbits with a Column shift amount (F.shiftleft only takes a
    Python int; call_function reaches the SQL form directly)."""
    return F.call_function("shiftleft", F.lit(1).cast("long"), nbits)


def _positions(key: Column, m_bits: int, k: int) -> list[Column]:
    """k bit positions via double hashing: pmod(xxhash64(key, i), m).

    CAUTION: xxhash64 is TYPE-sensitive — int 5 and bigint 5 hash
    differently even though a join would coerce them equal. Build and
    probe must hash the key at the SAME dtype or the no-false-negative
    guarantee silently breaks; ``bloom_referential_violations``
    normalizes the fact key to the catalog key's type for exactly this
    reason."""
    return [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits)) for i in range(k)
    ]


def build_bloom(
    catalog: DataFrame, key_col: str, m_bits: int = 1 << 20, k: int = 5
) -> DataFrame:
    """One-row DataFrame ``(words array<long>, m_bits, k)`` encoding the
    Bloom filter of ``catalog[key_col]``. ``m_bits`` must be a multiple
    of 64."""
    if m_bits % 64 != 0:
        # ValueError, not assert: stripped under python -O (ADVICE r5)
        raise ValueError("m_bits must be a multiple of 64")
    n_words = m_bits // 64
    key = F.col(key_col)
    pos = F.explode(F.array(*_positions(key, m_bits, k))).alias("pos")
    words = (
        catalog.select(pos)
        .select(
            (F.col("pos") / 64).cast("long").alias("word_idx"),
            _one_shl((F.col("pos") % 64).cast("int")).alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(bit)").alias("word"))
    )
    dense = (
        F.broadcast(words)
        .join(
            words.sparkSession.range(n_words).withColumnRenamed("id", "word_idx"),
            "word_idx",
            "right",
        )
        .select("word_idx", F.coalesce("word", F.lit(0).cast("long")).alias("word"))
    )
    return dense.agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("word_idx", "word"))),
            lambda s: s.word,
        ).alias("words")
    ).select("words", F.lit(m_bits).alias("m_bits"), F.lit(k).alias("k"))


def might_contain(key: Column, words: Column, m_bits: int, k: int) -> Column:
    """Conjunctive probe: all k bits set → maybe present; any bit clear
    → definitely absent. Pure Column expression (element_at + bitwise
    AND), no Python."""
    tests = []
    for p in _positions(key, m_bits, k):
        word = F.element_at(words, (p / 64).cast("int") + 1)
        bit = _one_shl((p % 64).cast("int"))
        tests.append(word.bitwiseAND(bit) != 0)
    out = tests[0]
    for c in tests[1:]:
        out = out & c
    return out


def bloom_referential_violations(
    facts: DataFrame,
    fact_key: str,
    catalog: DataFrame,
    catalog_key: str,
    m_bits: int = 1 << 20,
    k: int = 5,
) -> DataFrame:
    """Facts whose ``fact_key`` is absent from ``catalog[catalog_key]``
    — exactly the plain left-anti join's output, computed through the
    Bloom tier:

    1. Probe every fact against the broadcast filter row (zero
       shuffle). Bloom failures are DEFINITE violations — on a dirty
       ingest the violating majority is caught without any join.
    2. Only bloom-passing rows (valid keys + the small false-positive
       tail) enter the exact left-anti join that catches the false
       positives.

    Output = definite ∪ verified, provably equal to the exact
    anti-join (no false negatives ⇒ nothing valid in part 1, and part
    2 is exact). Honest scale note: when violations are rare, stage 2
    still carries most rows — the tier's win is the broadcastable
    filter size (m/8 bytes vs 8+ bytes/key) and the shuffle-free fast
    path for violating rows, not a reduction of the valid-row join.

    The fact key is hashed AT THE CATALOG KEY'S dtype (xxhash64 is
    type-sensitive where the join's equality is coercing — int 5 and
    bigint 5 hash differently; see ``_positions``). The filter row's
    columns ride under a reserved ``_bloom_`` prefix so fact columns
    named ``words``/``k`` etc. survive untouched.
    """
    reserved = [c for c in facts.columns if c.startswith("_bloom_")]
    if reserved:
        raise ValueError(
            f"facts columns collide with bloom prefix: {reserved}"
        )
    probe_key = F.col(fact_key).cast(catalog.schema[catalog_key].dataType)
    bloom = build_bloom(catalog, catalog_key, m_bits, k).select(
        F.col("words").alias("_bloom_words")
    )
    probed = facts.crossJoin(F.broadcast(bloom)).withColumn(
        "_bloom_maybe",
        might_contain(probe_key, F.col("_bloom_words"), m_bits, k),
    )
    definite = probed.where(~F.col("_bloom_maybe")).drop(
        "_bloom_maybe", "_bloom_words"
    )
    verified = (
        probed.where(F.col("_bloom_maybe"))
        .drop("_bloom_maybe", "_bloom_words")
        .join(
            catalog.select(F.col(catalog_key).alias("_bloom_ckey")),
            probe_key == F.col("_bloom_ckey"),
            "left_anti",
        )
    )
    return definite.unionByName(verified)
