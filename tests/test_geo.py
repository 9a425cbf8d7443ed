"""F18 geo_loc parse + F14 region/land-ocean classifiers vs an
independent Python model of the reference logic
(metrics/evaluator.py:348-460, elevation/classifier.py:104-244)."""

from __future__ import annotations

from pyspark.sql import functions as F

from biosample_enricher_spark.operators.geo import (
    US_STATES,
    land_ocean_class,
    parse_geo_loc_name,
    us_region_class,
)

# (geo_loc, expected country, state, locality) — reference semantics
PARSE_CASES = [
    ("USA: California, San Francisco Bay", "USA", "California", "San Francisco Bay"),
    ("USA: Central City, Nebraska", "USA", "Nebraska", "Central City"),
    ("USA: Wisconsin, Lake Mendota", "USA", "Wisconsin", "Lake Mendota"),
    ("USA: Austin, Texas", "USA", "Texas", "Austin"),
    ("Pacific Ocean: North Pacific", "Pacific Ocean", "North Pacific", None),
    ("Canada: Ontario, Toronto", "Canada", "Ontario", "Toronto"),
    ("France: Paris", "France", "Paris", None),
    ("USA", "USA", None, None),
    ("mexico", "mexico", None, None),
    ("Lake Erie", None, None, "Lake Erie"),
    ("USA: , Nebraska", "USA", None, None),
    ("USA: Texas,", "USA", None, None),
    ("", None, None, None),
    (None, None, None, None),
    # three-part rest: only the first two are used (reference parts[0:2])
    ("USA: Boston, Massachusetts, Suffolk", "USA", "Massachusetts", "Boston"),
    # second colon stays inside rest
    ("USA:区: test, Utah", "USA", "Utah", "区: test"),
    # ADVICE r2: tab/newline padding must strip like the reference's
    # .strip() (full spec.STRIP_WHITESPACE class, not 0x20 only)
    ("\tUSA :\n Anchorage ,\tAlaska \x0b\n", "USA", "Alaska", "Anchorage"),
    ("\n France :\tParis\r", "France", "Paris", None),
    ("\t usa \n", "usa", None, None),
]


def test_parse_geo_loc_name_all_branches(spark):
    df = spark.createDataFrame(
        [(i, c[0]) for i, c in enumerate(PARSE_CASES)], ["i", "geo"]
    )
    parsed = df.select("i", parse_geo_loc_name(F.col("geo")).alias("p")).orderBy("i")
    got = [(r.p.country, r.p.state, r.p.locality) for r in parsed.collect()]
    assert got == [(c[1], c[2], c[3]) for c in PARSE_CASES]


def test_us_states_set_is_the_reference_50(spark):
    assert len(US_STATES) == 50
    assert "Nebraska" in US_STATES and "Puerto Rico" not in US_STATES


REGION_CASES = [
    ((39.0, -98.0), "CONUS"),
    ((49.384358, -66.93457), "CONUS"),   # inclusive corner
    ((64.0, -150.0), "AK"),              # main landmass
    ((52.9, 179.9), "AK"),               # Aleutians WEST of 180°
    ((52.9, -170.0), "AK"),              # Aleutians east of 180°
    ((52.9, -128.0), "OTHER"),           # inside lat band, outside wrap
    ((20.5, -157.0), "HI"),
    ((18.2, -66.5), "PR"),
    ((18.0, -64.8), "VI"),               # VI wins only where PR misses
    ((13.5, 144.8), "GU"),
    ((-14.3, -170.7), "AS"),
    ((15.2, 145.7), "MP"),
    ((0.0, 0.0), "OTHER"),
    ((-33.9, 151.2), "OTHER"),           # Sydney
]

SURFACE_CASES = [
    ((0.0, -150.0), "ocean"),       # central Pacific
    ((0.0, -125.0), "uncertain"),   # Pacific box but lon > -130 EARLY RETURN
    ((20.0, -30.0), "ocean"),       # central Atlantic
    ((-70.0, 0.0), "ocean"),        # Southern Ocean
    ((-10.0, 75.0), "ocean"),       # Indian Ocean
    ((45.0, -100.0), "land"),       # North America
    ((-20.0, -60.0), "land"),       # South America
    ((10.0, 20.0), "land"),         # Africa
    ((50.0, 10.0), "land"),         # Europe
    ((40.0, 100.0), "land"),        # Asia
    ((-25.0, 135.0), "land"),       # Australia
    ((37.0, -123.5), "uncertain"),  # near-coast
]


def test_region_and_surface_classifiers(spark):
    rows = [
        (i, lat, lon, reg, None)
        for i, ((lat, lon), reg) in enumerate(REGION_CASES)
    ] + [
        (100 + i, lat, lon, None, surf)
        for i, ((lat, lon), surf) in enumerate(SURFACE_CASES)
    ]
    df = spark.createDataFrame(
        rows, "i int, lat double, lon double, exp_region string, exp_surface string"
    )
    got = df.select(
        "i",
        "exp_region",
        "exp_surface",
        us_region_class(F.col("lat"), F.col("lon")).alias("region"),
        land_ocean_class(F.col("lat"), F.col("lon")).alias("surface"),
    ).collect()
    for r in got:
        if r.exp_region is not None:
            assert r.region == r.exp_region, f"case {r.i}: {r.region}"
        if r.exp_surface is not None:
            assert r.surface == r.exp_surface, f"case {r.i}: {r.surface}"


def test_f14_driver_corpus_hits_antimeridian(spark):
    """The driver query's derived grid must exercise the Aleutian wrap
    (west-of-180 AK points) so the oracle row-hash covers it."""
    from biosample_enricher_spark.queries import QUERIES

    df = QUERIES["f14_bbox_classify"](spark, "/root/testdata/sf0.01")
    lat = (F.col("event_id") % 1800).cast("double") / 10 - 90
    lon = ((F.col("event_id") * 131) % 3600).cast("double") / 10 - 180
    west = df.where((F.col("region_class") == "AK") & (lon > 170)).count()
    assert west > 0
    by_class = {
        r.region_class: r["count"]
        for r in df.groupBy("region_class").count().collect()
    }
    assert by_class.get("CONUS", 0) > 0 and by_class.get("AK", 0) > 0
