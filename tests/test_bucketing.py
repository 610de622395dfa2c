"""Bucketed-table co-located join: the 100 TB technique for killing the
fact-fact shuffle. Writing both sides bucketed by the join key lets
Catalyst plan a sort-merge join with NO Exchange on either side."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    # bucketBy requires saveAsTable (catalog-managed); point the session
    # warehouse at a temp dir for the test
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS orders_bucketed")
    (
        li.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("li_bucketed")
    )
    (
        orders.withColumnRenamed("o_orderkey", "l_orderkey")
        .write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("orders_bucketed")
    )
    yield "li_bucketed", "orders_bucketed"
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS orders_bucketed")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    li_t, o_t = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        joined = spark.table(li_t).join(spark.table(o_t), "l_orderkey")
        import contextlib
        import io as sio

        buf = sio.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        # correctness: same count as the plain join
        plain = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").join(
            spark.read.parquet(f"{SF_DIR}/orders.parquet").withColumnRenamed(
                "o_orderkey", "l_orderkey"
            ),
            "l_orderkey",
        )
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_bucket_pruning_on_key_filter(spark, bucketed_tables):
    li_t, _ = bucketed_tables
    one = spark.table(li_t).filter(F.col("l_orderkey") == 1)
    assert one.count() == spark.read.parquet(f"{SF_DIR}/lineitem.parquet").filter(
        "l_orderkey = 1"
    ).count()
