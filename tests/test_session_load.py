"""load_table robustness: timestamp-encoding and error-path contracts.

The synthetic events table ships as timestamp[ns] (read as epoch-ns BIGINT
via the nanosAsLong conf), but the loader also supports µs-encoded files,
which surface as TIMESTAMP_NTZ when isAdjustedToUTC is false. These tests
pin two contracts flagged in round-3 review:

- NTZ normalization is timezone-INDEPENDENT: the same wall times produce
  the same instants whether the session timezone is UTC or not, and match
  the ns-encoded reading of the same data.
- A read failure that is NOT the illegal-parquet-type error re-raises as
  itself instead of being silently retried with the forced BIGINT schema
  (which would mis-scale a µs file by 1000x).
"""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from dataframes_spark.session import load_table


@pytest.fixture(scope="module")
def ntz_events_dir(spark, tmp_path_factory):
    """A tiny events table written with a TIMESTAMP_NTZ(µs) ts column."""
    root = str(tmp_path_factory.mktemp("ntz_events"))
    df = spark.createDataFrame(
        [
            (1, "2024-03-01 12:00:00.123456", 10, "click", 1.5, "{}"),
            (2, "2024-07-04 23:59:59.000001", 11, "view", 2.5, "{}"),
        ],
        "event_id BIGINT, ts STRING, user_id BIGINT, "
        "event_type STRING, value DOUBLE, props STRING",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    out = os.path.join(root, "events.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(out)
    return root


def _instants(spark, sf_dir):
    df = load_table(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    rows = df.select("event_id", F.unix_micros("ts").alias("us")).collect()
    return {r["event_id"]: r["us"] for r in rows}


def test_ntz_events_normalize_tz_independent(spark, ntz_events_dir):
    # expected: wall time read as a UTC instant, regardless of session TZ
    expected = {
        1: 1709294400123456,  # 2024-03-01T12:00:00.123456Z
        2: 1720137599000001,  # 2024-07-04T23:59:59.000001Z
    }
    tz0 = spark.conf.get("spark.sql.session.timeZone")
    try:
        assert _instants(spark, ntz_events_dir) == expected
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        assert _instants(spark, ntz_events_dir) == expected
    finally:
        spark.conf.set("spark.sql.session.timeZone", tz0)


def test_missing_events_file_raises_not_schema_forced(spark, tmp_path):
    # a missing file must surface as an analysis/IO error, not be silently
    # reread with the forced BIGINT schema (schema-forced reads of a missing
    # path would fail late and confusingly — or worse, succeed empty)
    with pytest.raises(Exception) as ei:
        load_table(spark, str(tmp_path), "events").collect()
    assert "PARQUET_TYPE_ILLEGAL" not in str(ei.value)


def test_corrupt_events_file_raises(spark, tmp_path):
    os.makedirs(tmp_path / "d", exist_ok=True)
    with open(tmp_path / "d" / "events.parquet", "wb") as f:
        f.write(b"not a parquet file at all")
    with pytest.raises(Exception):
        load_table(spark, str(tmp_path / "d"), "events").collect()
