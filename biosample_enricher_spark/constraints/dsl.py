"""Declarative row-constraint DSL.

Generalizes the span suite's pattern to arbitrary flat tables: a suite
is a tuple of ``Rule`` objects, each compiling to a guarded violation
struct; the whole suite evaluates as ONE wide projection (candidate
array → filter → explode), entirely JVM-side. This is the engine's
analog of the reference's pydantic ``Field`` constraints
(``/root/reference/biosample_enricher/models.py:15-134``): each
``Field(ge=..., le=..., pattern=...)`` maps to one Rule.

Null semantics follow pydantic optional fields: a NULL value passes
every rule except ``not_null`` (``latitude: float | None = Field(None,
ge=-90, le=90)`` accepts None).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """One named constraint on one column.

    ``fails`` maps the column to a boolean Column that is True when the
    rule is VIOLATED (must already treat NULL as passing unless the
    rule is a presence rule). ``message`` maps the column to a string
    Column rendered only for violating rows.
    """

    constraint_id: str
    field: str
    fails: Callable[[Column], Column]
    message: Callable[[Column], Column]


def range_rule(
    field: str,
    ge: float | None = None,
    le: float | None = None,
    constraint_id: str | None = None,
) -> Rule:
    """ge/le bounds, null passes. Analog: Field(ge=..., le=...)."""
    def fails(c: Column) -> Column:
        bad = F.lit(False)
        if ge is not None:
            bad = bad | (c < F.lit(ge))
        if le is not None:
            bad = bad | (c > F.lit(le))
        return c.isNotNull() & bad

    desc = []
    if ge is not None:
        desc.append(f">= {ge}")
    if le is not None:
        desc.append(f"<= {le}")
    bounds = " and ".join(desc)

    def message(c: Column) -> Column:
        return F.format_string(
            f"{field} must be {bounds}, got %s", c.cast("string")
        )

    return Rule(constraint_id or f"{field}_range", field, fails, message)


def pattern_rule(field: str, regex: str, constraint_id: str | None = None) -> Rule:
    """Full-match regex, null passes. Analog: Field(pattern=...)."""
    def fails(c: Column) -> Column:
        return c.isNotNull() & ~c.rlike(regex)

    def message(c: Column) -> Column:
        return F.format_string(
            f"{field} must match {regex}, got %s", c
        )

    return Rule(constraint_id or f"{field}_pattern", field, fails, message)


def enum_rule(
    field: str, values: tuple[str, ...], constraint_id: str | None = None
) -> Rule:
    def fails(c: Column) -> Column:
        return c.isNotNull() & ~c.isin(*values)

    def message(c: Column) -> Column:
        return F.format_string(
            f"{field} must be one of {sorted(values)}, got %s", c
        )

    return Rule(constraint_id or f"{field}_enum", field, fails, message)


def not_null_rule(field: str, constraint_id: str | None = None) -> Rule:
    def fails(c: Column) -> Column:
        return c.isNull()

    def message(c: Column) -> Column:
        return F.lit(f"{field} is required")

    return Rule(constraint_id or f"{field}_not_null", field, fails, message)


def valid_date_rule(
    field: str, fmt: str = "yyyy-MM-dd", constraint_id: str | None = None
) -> Rule:
    """String parses as a real calendar date (strptime analog,
    models.py:104-112 — '2014-13-45' fails even if it matches the
    regex). Null passes."""
    def fails(c: Column) -> Column:
        return c.isNotNull() & F.try_to_timestamp(c, F.lit(fmt)).isNull()

    def message(c: Column) -> Column:
        return F.format_string(
            f"{field} must be a valid date ({fmt}), got %s", c
        )

    return Rule(constraint_id or f"{field}_valid_date", field, fails, message)


def custom_rule(
    constraint_id: str,
    field: str,
    fails: Callable[[Column], Column],
    message_text: str,
) -> Rule:
    return Rule(constraint_id, field, fails, lambda c: F.lit(message_text))


def check_schema_conformance(df: DataFrame, schema) -> None:
    """``extra="forbid"`` analog (models.py:131): reject a frame that
    carries columns outside the declared schema (or misses declared
    ones). At Iceberg/parquet table level this is enforced by the table
    format itself; this check covers in-flight frames."""
    declared = {f.name for f in schema.fields}
    actual = set(df.columns)
    extra = sorted(actual - declared)
    missing = sorted(declared - actual)
    if extra or missing:
        raise ValueError(
            f"schema mismatch: extra columns {extra}, missing columns {missing}"
        )


class RowSuite:
    """Compile a tuple of Rules into violation rows / per-row verdicts
    in one projection."""

    def __init__(self, rules: tuple[Rule, ...] | list[Rule]) -> None:
        self.rules = tuple(rules)

    def _candidates(self) -> Column:
        if not self.rules:
            return F.array().cast(
                "array<struct<constraint_id:string,field:string,message:string>>"
            )
        items = [
            F.struct(
                rule.fails(F.col(rule.field)).alias("bad"),
                F.lit(rule.constraint_id).alias("constraint_id"),
                F.lit(rule.field).alias("field"),
                rule.message(F.col(rule.field)).alias("message"),
            )
            for rule in self.rules
        ]
        kept = F.filter(
            F.array(*items), lambda c: F.coalesce(c["bad"], F.lit(False))
        )
        return F.transform(
            kept,
            lambda c: F.struct(
                c["constraint_id"].alias("constraint_id"),
                c["field"].alias("field"),
                c["message"].alias("message"),
            ),
        )

    def with_violations(self, df: DataFrame, col_name: str = "_violations") -> DataFrame:
        return df.withColumn(col_name, self._candidates())

    def violations(self, df: DataFrame, id_col: str) -> DataFrame:
        """Exploded violation rows (id, constraint_id, field, message)."""
        v = self.with_violations(df)
        return v.select(
            F.col(id_col).alias("row_id"), F.explode("_violations").alias("v")
        ).select(
            "row_id",
            F.col("v.constraint_id").alias("constraint_id"),
            F.col("v.field").alias("field"),
            F.col("v.message").alias("message"),
        )

    def verdicts(self, df: DataFrame, id_col: str) -> DataFrame:
        """(row_id, valid, n_violations) — the reference's pass/fail
        partition (synthetic_validation_demo.py:69-94)."""
        v = self.with_violations(df)
        return v.select(
            F.col(id_col).alias("row_id"),
            (F.size("_violations") == 0).alias("valid"),
            F.size("_violations").alias("n_violations"),
        )

    def summary(self, df: DataFrame) -> DataFrame:
        """total/valid/invalid/validation_rate — the reference's
        validation_summary shape (synthetic_validation_demo.py:96-113)."""
        v = self.with_violations(df)
        return v.agg(
            F.count(F.lit(1)).alias("total"),
            F.sum((F.size("_violations") == 0).cast("long")).alias("valid"),
            F.sum((F.size("_violations") > 0).cast("long")).alias("invalid"),
            F.round(
                F.avg((F.size("_violations") == 0).cast("double")), 6
            ).alias("validation_rate"),
        )
