"""Insurance against driver testdata dtype drift on ``events.ts``.

The driver has regenerated events.parquet with three different physical
encodings across rounds: TIMESTAMP(NANOS) (Spark reads as bigint under
nanosAsLong), ``timestamp[us]`` without the UTC flag (TIMESTAMP_NTZ),
and ``timestamp[us]`` UTC (TIMESTAMP). Round 4 broke on the NTZ variant
(`unix_micros` requires TIMESTAMP). ``load_table`` is the single choke
point that must normalize all of them to a plain TIMESTAMP with
identical UTC instants, so every downstream query can assume one type.
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_DIR
from travel_data_ingestion_spark.queries import load_table

# One instant, three physical encodings. 2024-03-05T12:34:56.789123 UTC
# (+ 999 ns in the nanos variant, which must floor-truncate away).
_MICROS = int(
    dt.datetime(2024, 3, 5, 12, 34, 56, 789123, tzinfo=dt.timezone.utc).timestamp()
    * 1_000_000
)

_ENCODINGS = {
    "nanos": pa.array([_MICROS * 1000 + 999], type=pa.timestamp("ns")),
    "us_ntz": pa.array([_MICROS], type=pa.timestamp("us")),
    "us_utc": pa.array([_MICROS], type=pa.timestamp("us", tz="UTC")),
}


def _write_events(tmp_path, name: str, ts_array: pa.Array) -> str:
    """A minimal events table under <dir>/events.parquet with one row."""
    tbl = pa.table(
        {
            "event_id": pa.array([1], type=pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([7], type=pa.int64()),
            "event_type": pa.array(["click"], type=pa.string()),
            "value": pa.array([1.5], type=pa.float64()),
        }
    )
    d = tmp_path / name
    d.mkdir()
    pq.write_table(tbl, str(d / "events.parquet"))
    return str(d)


@pytest.mark.parametrize("encoding", sorted(_ENCODINGS))
def test_events_ts_normalized_to_timestamp(spark, tmp_path, encoding):
    sf_dir = _write_events(tmp_path, encoding, _ENCODINGS[encoding])
    df = load_table(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp", (
        f"{encoding}: load_table must normalize events.ts to TIMESTAMP, "
        f"got {dict(df.dtypes)['ts']}"
    )
    [row] = df.collect()
    # Session TZ is pinned UTC inside load_table, so the collected naive
    # datetime is the UTC wall clock of the single encoded instant.
    assert row.ts == dt.datetime(2024, 3, 5, 12, 34, 56, 789123), (
        f"{encoding}: instant drifted: {row.ts!r}"
    )


def test_real_testdata_ts_is_timestamp(spark):
    """Whatever the driver's current encoding is, queries see TIMESTAMP."""
    df = load_table(spark, SF_DIR, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
