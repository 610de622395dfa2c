"""Dashboard query layer over the e2e warehouse."""

from __future__ import annotations

import math

import pytest

from tests.test_pipeline_e2e import pipeline_wh  # noqa: F401 (fixture reuse)
from travel_data_ingestion_spark import dashboard as dash

# slow lane (dashboard-surface e2e over the built pipeline); default gate covers the area via faster tests
pytestmark = pytest.mark.slow

START, END = "2026-02-01", "2026-02-10"


def test_visits_and_movements(spark, pipeline_wh):  # noqa: F811
    v = dash.visits(spark, pipeline_wh, START, END).collect()
    assert len(v) == 7
    assert all(r.tooltip_text.startswith("<b>Type:</b> Visit") for r in v)
    m = dash.movements(spark, pipeline_wh, START, END).collect()
    assert len(m) == 6
    flying = [r for r in m if r.activity_type == "FLYING"]
    ground = [r for r in m if r.activity_type != "FLYING"]
    assert all(r.bearing is None for r in flying)  # bearing only for ground
    for r in ground:
        assert 0.0 <= r.bearing < 360.0
    # color mapping: trains purple, walking lime
    train = next(r for r in m if r.activity_type == "IN_TRAIN")
    assert train.color == [148, 0, 211, 200]
    walk = next(r for r in m if r.activity_type == "WALKING")
    assert walk.color == [50, 205, 50, 200]


def test_bearing_matches_reference_formula(spark, pipeline_wh):  # noqa: F811
    m = [r for r in dash.movements(spark, pipeline_wh, START, END).collect()
         if r.activity_type != "FLYING"]
    r = m[0]
    lat1, lon1, lat2, lon2 = map(
        math.radians, [r.start_lat, r.start_lon, r.end_lat, r.end_lon]
    )
    dlon = lon2 - lon1
    x = math.sin(dlon) * math.cos(lat2)
    y = math.cos(lat1) * math.sin(lat2) - math.sin(lat1) * math.cos(lat2) * math.cos(dlon)
    expected = (math.degrees(math.atan2(x, y)) + 360) % 360
    assert r.bearing == pytest.approx(expected, abs=1e-9)


def test_tabular_queries(spark, pipeline_wh):  # noqa: F811
    it = dash.itinerary(spark, pipeline_wh, START, END).collect()
    assert len(it) == 10
    sp = dash.spending(spark, pipeline_wh, START, END).collect()
    assert len(sp) > 0
    # multi-key sort: type asc, amount desc within type
    for a, b in zip(sp, sp[1:]):
        assert (a.type or "") <= (b.type or "") or (
            a.type == b.type and a.amount >= b.amount
        )
    fl = dash.flights(spark, pipeline_wh, START, END).collect()
    assert len(fl) == 5
    sl = dash.sleep(spark, pipeline_wh, START, END).collect()
    assert len(sl) == 10
    st = dash.daily_steps(spark, pipeline_wh, START, END).collect()
    assert all(r.total_steps >= 0 for r in st)


def test_pivot_topk_distance(spark, pipeline_wh):  # noqa: F811
    piv = dash.spend_by_type_pivot(spark, pipeline_wh, START, END)
    assert "date" in piv.columns and len(piv.columns) > 2
    top = dash.top_expenses(spark, pipeline_wh, START, END, k=5).collect()
    assert len(top) == 5
    assert top[0].amount >= top[-1].amount
    km = {r.activity_type: r.total_km for r in
          dash.distance_by_mode(spark, pipeline_wh, START, END).collect()}
    assert set(km) == {"IN_TRAIN", "WALKING", "FLYING"}
    assert all(v > 0 for v in km.values())
