"""The reference's BiosampleLocation constraint set, ported to the
declarative DSL — rule-for-rule from
``/root/reference/biosample_enricher/models.py:15-134``:

- latitude  ge=-90 le=90            (models.py:19-21)
- longitude ge=-180 le=180          (models.py:22-24)
- collection_date ^\\d{4}-\\d{2}-\\d{2}$ AND real calendar date
                                     (models.py:25-29, 104-112)
- database_source ^(NMDC|GOLD)$     (models.py:38-40)
- date_precision ^(day|month|year)$ (models.py:70-72)
- coordinate_precision ge=0         (models.py:67-69)
- location_completeness ge=0 le=1   (models.py:73-75)
- extra="forbid"                    (models.py:131) → structural: the
  table schema is fixed, unknown columns cannot exist (Iceberg/parquet
  give this for free; asserted in tests)

Derived expressions:

- ``completeness_expr`` — the model_validator that recomputes
  location_completeness from lat/lon/date/textual_location
  (models.py:86-99)
- ``is_enrichable_expr`` — lat/lon present and in range
  (models.py:114-121)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .dsl import RowSuite, pattern_rule, range_rule, valid_date_rule

BIOSAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("sample_id", T.StringType()),
        T.StructField("latitude", T.DoubleType()),
        T.StructField("longitude", T.DoubleType()),
        T.StructField("collection_date", T.StringType()),
        T.StructField("textual_location", T.StringType()),
        T.StructField("database_source", T.StringType()),
        T.StructField("coordinate_precision", T.IntegerType()),
        T.StructField("date_precision", T.StringType()),
        T.StructField("location_completeness", T.DoubleType()),
    ]
)

BIOSAMPLE_RULES = (
    range_rule("latitude", ge=-90, le=90),
    range_rule("longitude", ge=-180, le=180),
    pattern_rule("collection_date", r"^\d{4}-\d{2}-\d{2}$"),
    valid_date_rule("collection_date"),
    pattern_rule("database_source", r"^(NMDC|GOLD)$"),
    pattern_rule("date_precision", r"^(day|month|year)$"),
    range_rule("coordinate_precision", ge=0),
    range_rule("location_completeness", ge=0.0, le=1.0),
)

biosample_suite = RowSuite(BIOSAMPLE_RULES)


def completeness_expr() -> Column:
    """Recomputed completeness over the four location fields
    (models.py:86-99)."""
    fields = ["latitude", "longitude", "collection_date", "textual_location"]
    present = sum(F.col(f).isNotNull().cast("int") for f in fields)
    return (present / F.lit(len(fields))).cast("double")


def is_enrichable_expr() -> Column:
    """Minimum data for enrichment (models.py:114-121)."""
    lat, lon = F.col("latitude"), F.col("longitude")
    return (
        lat.isNotNull()
        & lon.isNotNull()
        & lat.between(-90, 90)
        & lon.between(-180, 180)
    )
