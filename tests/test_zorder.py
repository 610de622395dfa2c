"""Z-order layout: multi-column clustering for data skipping.

The skipping property under test: partition each output file's rows,
measure the bounding box (min..max per z-ordered column) — Z-order
files must cover far less of the value space than the incoming layout,
so parquet footer min/max stats prune files for predicates on EITHER
column (a single-column sort only helps its leading column).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from travel_data_ingestion_spark.maintenance import zorder_layout


def _avg_box_area(df, c1, c2):
    part = df.withColumn("__p", F.spark_partition_id())
    box = part.groupBy("__p").agg(
        (F.max(c1) - F.min(c1)).alias("w"), (F.max(c2) - F.min(c2)).alias("h")
    )
    rows = box.collect()
    return sum(r.w * r.h for r in rows) / len(rows)


def test_zorder_shrinks_bounding_boxes(spark):
    n = 40_000
    df = (
        spark.range(n)
        .withColumn("x", (F.col("id") * 48271 % 65536).cast("long"))
        .withColumn("y", (F.col("id") * 69621 % 65536).cast("long"))
        .repartition(16)
    )
    before = _avg_box_area(df, "x", "y")
    z = zorder_layout(df, ["x", "y"], bits=8, num_files=16)
    after = _avg_box_area(z, "x", "y")
    # 16 z-order files over a 2-D uniform space: each box covers ~1/16
    # of the area; the random layout's boxes each cover ~all of it.
    assert after < before / 4

    # layout-only: same rows survive
    assert z.count() == n
    assert z.agg(F.sum("x")).first()[0] == df.agg(F.sum("x")).first()[0]


def test_zorder_skips_on_second_column(spark):
    """A range predicate on the SECOND column alone must touch only a
    minority of z-order files (the whole point vs a lexicographic sort,
    where y-only predicates hit every file)."""
    n = 40_000
    df = (
        spark.range(n)
        .withColumn("x", (F.col("id") * 48271 % 65536).cast("long"))
        .withColumn("y", (F.col("id") * 69621 % 65536).cast("long"))
    )
    z = zorder_layout(df, ["x", "y"], bits=8, num_files=16)
    part = z.withColumn("__p", F.spark_partition_id())
    stats = part.groupBy("__p").agg(F.min("y").alias("lo"), F.max("y").alias("hi"))
    # files a footer-stats reader would touch for y BETWEEN 1000 AND 5000
    touched = stats.filter((F.col("lo") <= 5000) & (F.col("hi") >= 1000)).count()
    total = stats.count()
    assert touched <= total / 2, (touched, total)
