"""Testdata-vintage regression guard: `__spark_entry__._events` must
normalize BOTH parquet timestamp vintages the driver has shipped —
TIMESTAMP(MICROS) (reads as timestamp/timestamp_ntz) and
TIMESTAMP(NANOS) (reads as long under nanosAsLong). A silent vintage
change once broke every event-time query in a round's driver run."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entry

ROWS = [
    (1, 1_700_000_000_000_000, 10, "click", 1.5),
    (2, 1_700_000_060_000_000, 11, "view", 2.5),
    (3, 1_700_000_120_000_000, 10, "click", 3.5),
]


def _write_events(tmp_path, unit):
    ts_type = pa.timestamp(unit)
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in ROWS], pa.int64()),
            "ts": pa.array(
                [r[1] * (1000 if unit == "ns" else 1) for r in ROWS], ts_type
            ),
            "user_id": pa.array([r[2] for r in ROWS], pa.int64()),
            "event_type": pa.array([r[3] for r in ROWS]),
            "value": pa.array([r[4] for r in ROWS], pa.float64()),
            "props": pa.array(["{}"] * 3),
        }
    )
    d = tmp_path / unit
    d.mkdir()
    pq.write_table(t, str(d / "events.parquet"))
    return str(d)


@pytest.mark.parametrize("unit", ["us", "ns"])
def test_events_normalizes_both_vintages(spark, tmp_path, unit):
    from columnar_spark.session import tune

    tune(spark)  # the query wrapper applies this before _events
    sf_dir = _write_events(tmp_path, unit)
    entry._TABLE_CACHE.clear()  # isolate from other tests' cached reads
    ev = entry._events(spark, sf_dir)
    got = {r["event_id"]: r["ts_us"] for r in ev.select("event_id", "ts_us").collect()}
    assert got == {r[0]: r[1] for r in ROWS}, unit
    entry._TABLE_CACHE.clear()
