"""The reference's validation corpus, ported verbatim: 15 named cases
with expected valid/invalid outcomes
(/root/reference/biosample_enricher/pydantic_validation_demo.py:23-192,
expected lists at 407-425) plus the enrichability cases incl. boundary
coordinates (:262-300). The DSL suite must reproduce every verdict."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from biosample_enricher_spark.constraints.biosample import (
    BIOSAMPLE_SCHEMA,
    biosample_suite,
    completeness_expr,
    is_enrichable_expr,
)

# (name, row, expected_valid) — rows use the fixed table schema;
# extra_fields_forbidden is structural (see test_extra_fields_are_
# impossible_by_schema) and auto_timestamp is an ingestion default, so
# both reduce to valid rows here exactly as in the reference's expected
# lists (auto_timestamp_test is expected-valid; extra_fields is covered
# separately).
CASES = [
    ("valid_complete_sample",
     dict(sample_id="nmdc:bsm-11-34xj1150", latitude=42.3601, longitude=-71.0928,
          collection_date="2014-11-25", textual_location="Boston Harbor",
          database_source="NMDC", coordinate_precision=4, date_precision="day"),
     True),
    ("valid_minimal_enrichable",
     dict(sample_id="test_minimal", latitude=38.8895, longitude=-77.0501,
          database_source="GOLD"),
     True),
    ("invalid_latitude_high",
     dict(sample_id="t", latitude=95.0, longitude=-71.0928, database_source="NMDC"),
     False),
    ("invalid_latitude_low",
     dict(sample_id="t", latitude=-95.0, longitude=-71.0928, database_source="NMDC"),
     False),
    ("invalid_longitude_high",
     dict(sample_id="t", latitude=42.3601, longitude=185.0, database_source="NMDC"),
     False),
    ("invalid_longitude_low",
     dict(sample_id="t", latitude=42.3601, longitude=-185.0, database_source="NMDC"),
     False),
    ("invalid_date_format",
     dict(sample_id="t", latitude=42.3601, longitude=-71.0928,
          collection_date="25-11-2014", database_source="NMDC"),
     False),
    ("invalid_database_source",
     dict(sample_id="t", latitude=42.3601, longitude=-71.0928,
          database_source="INVALID_DB"),
     False),
    ("invalid_date_precision",
     dict(sample_id="t", latitude=42.3601, longitude=-71.0928,
          collection_date="2014-11-25", date_precision="invalid_precision",
          database_source="NMDC"),
     False),
    ("invalid_coordinate_precision",
     dict(sample_id="t", latitude=42.3601, longitude=-71.0928,
          coordinate_precision=-1, database_source="NMDC"),
     False),
    ("invalid_completeness_high",
     dict(sample_id="t", latitude=42.3601, longitude=-71.0928,
          location_completeness=1.5, database_source="NMDC"),
     False),
    ("invalid_completeness_low",
     dict(sample_id="t", latitude=42.3601, longitude=-71.0928,
          location_completeness=-0.1, database_source="NMDC"),
     False),
    ("auto_timestamp_test",
     dict(sample_id="t", latitude=42.3601, longitude=-71.0928,
          database_source="NMDC"),
     True),
    ("completeness_calculation_test",
     dict(sample_id="t", latitude=42.3601, longitude=-71.0928,
          collection_date="2014-11-25", textual_location="Test location",
          database_source="NMDC"),
     True),
    # not in the reference list but implied by its strptime validator:
    # regex-passing yet impossible calendar date must fail
    ("invalid_date_impossible",
     dict(sample_id="t", latitude=42.3601, longitude=-71.0928,
          collection_date="2014-13-45", database_source="NMDC"),
     False),
]

ENRICHABLE_CASES = [
    ("enrichable_valid_coords", 42.0, -71.0, True),
    ("not_enrichable_missing_lat", None, -71.0, False),
    ("not_enrichable_missing_lon", 42.0, None, False),
    ("not_enrichable_lat_too_high", 91.0, -71.0, False),
    ("not_enrichable_lat_too_low", -91.0, -71.0, False),
    ("enrichable_boundary_coords", 90.0, 180.0, True),
    ("enrichable_negative_boundary_coords", -90.0, -180.0, True),
]


def _df(spark):
    rows = []
    for name, data, _ in CASES:
        row = {f.name: None for f in BIOSAMPLE_SCHEMA.fields}
        row.update(data)
        row["sample_id"] = name
        rows.append(row)
    return spark.createDataFrame(rows, BIOSAMPLE_SCHEMA)


def test_corpus_verdicts_match_reference(spark):
    verdicts = {
        r.row_id: r.valid
        for r in biosample_suite.verdicts(_df(spark), "sample_id").collect()
    }
    for name, _, expected in CASES:
        assert verdicts[name] is expected, name


def test_violation_rows_name_the_right_field(spark):
    viols = biosample_suite.violations(_df(spark), "sample_id").collect()
    by_case = {}
    for r in viols:
        by_case.setdefault(r.row_id, set()).add(r.field)
    assert by_case["invalid_latitude_high"] == {"latitude"}
    assert by_case["invalid_longitude_low"] == {"longitude"}
    assert by_case["invalid_date_format"] == {"collection_date"}
    assert by_case["invalid_database_source"] == {"database_source"}
    assert by_case["invalid_coordinate_precision"] == {"coordinate_precision"}
    assert by_case["invalid_completeness_high"] == {"location_completeness"}
    # valid cases emit nothing
    assert "valid_complete_sample" not in by_case


def test_summary_rates(spark):
    s = biosample_suite.summary(_df(spark)).first()
    n_valid = sum(1 for _, _, v in CASES if v)
    assert s.total == len(CASES)
    assert s.valid == n_valid
    assert s.invalid == len(CASES) - n_valid
    assert abs(s.validation_rate - n_valid / len(CASES)) < 1e-6


def test_enrichability_matches_reference(spark):
    rows = [
        {"sample_id": name, "latitude": lat, "longitude": lon,
         "collection_date": None, "textual_location": None,
         "database_source": "NMDC", "coordinate_precision": None,
         "date_precision": None, "location_completeness": None}
        for name, lat, lon, _ in ENRICHABLE_CASES
    ]
    df = spark.createDataFrame(rows, BIOSAMPLE_SCHEMA)
    got = {
        r.sample_id: r.e
        for r in df.select("sample_id", is_enrichable_expr().alias("e")).collect()
    }
    for name, _, _, expected in ENRICHABLE_CASES:
        assert got[name] is expected, name


def test_completeness_recalculation(spark):
    df = _df(spark).select(
        "sample_id", F.round(completeness_expr(), 6).alias("c")
    )
    got = {r.sample_id: r.c for r in df.collect()}
    assert got["completeness_calculation_test"] == 1.0  # all 4 fields present
    assert got["valid_minimal_enrichable"] == 0.5       # lat+lon only
    assert got["auto_timestamp_test"] == 0.5


def test_extra_fields_are_rejected(spark):
    """extra='forbid' (models.py:131): unknown columns on an incoming
    frame are rejected by the schema-conformance check (at the storage
    layer, the fixed Iceberg/parquet schema enforces the same thing)."""
    from biosample_enricher_spark.constraints.dsl import check_schema_conformance

    good = _df(spark)
    check_schema_conformance(good, BIOSAMPLE_SCHEMA)  # no raise
    bad = good.withColumn("extra_field", F.lit("nope"))
    with pytest.raises(ValueError, match="extra columns \\['extra_field'\\]"):
        check_schema_conformance(bad, BIOSAMPLE_SCHEMA)
    with pytest.raises(ValueError, match="missing columns"):
        check_schema_conformance(good.drop("latitude"), BIOSAMPLE_SCHEMA)
