"""GEODIST: haversine column vs python reference."""

import math

from pyspark.sql import functions as F

from columnar_spark.functions.geo import haversine_m, haversine_m_py


def test_haversine_matches_python(spark):
    pts = [
        (1, 40.7128, -74.0060, 51.5074, -0.1278),   # NYC -> London
        (2, 0.0, 0.0, 0.0, 0.0),                     # zero
        (3, -33.86, 151.21, 35.68, 139.69),          # Sydney -> Tokyo
        (4, 89.9, 0.0, -89.9, 0.0),                  # near-antipodal
        (5, 40.0, -74.0, 40.0001, -74.0001),         # ~13 m apart
    ]
    df = spark.createDataFrame(pts, "id long, lat1 double, lon1 double, lat2 double, lon2 double")
    got = {
        r["id"]: r["d"]
        for r in df.select(
            "id", haversine_m(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")).alias("d")
        ).collect()
    }
    for i, lat1, lon1, lat2, lon2 in pts:
        assert math.isclose(got[i], haversine_m_py(lat1, lon1, lat2, lon2), rel_tol=1e-12)
    # sanity magnitudes
    assert 5_500_000 < got[1] < 5_600_000
    assert got[2] == 0.0
    assert 1 < got[5] < 20
