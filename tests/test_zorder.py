"""Z-order clustering: Morton-key golden vectors + 2-D file skipping."""

from pyspark.sql import functions as F

from nolock_social_ocr_services_spark.functions.zorder import zorder_key
from nolock_social_ocr_services_spark.sources.snaptable import SnapTable


def test_zorder_key_golden_vectors(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1), (2, 0), (0, 2), (3, 3), (4, 0)],
        "x int, y int",
    )
    got = {
        (r.x, r.y): r.z
        for r in df.select("x", "y", zorder_key(["x", "y"]).alias("z")).collect()
    }
    # canonical Morton order: x bits even positions, y bits odd
    assert got == {
        (0, 0): 0, (1, 0): 1, (0, 1): 2, (1, 1): 3,
        (2, 0): 4, (0, 2): 8, (3, 3): 15, (4, 0): 16,
    }


def test_zorder_clustering_skips_files_in_both_dimensions(spark, tmp_path):
    """Range-clustering on the Morton key gives BOTH columns tight
    per-file bounds: a box query prunes files from metadata, and a
    filter on either single dimension also prunes."""
    grid = (
        spark.range(32 * 32)
        .select(
            (F.col("id") % 32).cast("int").alias("x"),
            (F.col("id") / 32).cast("int").alias("y"),
        )
        .withColumn("zkey", zorder_key(["x", "y"]))
    )
    t = SnapTable(str(tmp_path / "t"))
    t.append(
        grid, cluster_by="zkey", stats_cols=["x", "y"], cluster_files=16
    )
    all_files, _ = t.scan_files()
    assert len(all_files) == 16
    # an upper-left 8x8 box is 1/16 of the space: z-locality keeps it
    # inside a handful of files
    box, _ = t.scan_files(between={"x": (0, 7), "y": (0, 7)})
    assert len(box) <= 4
    # single-dimension filters prune too (1-D clustering on x alone
    # could never prune on y)
    xs, _ = t.scan_files(between={"x": (0, 7)})
    ys, _ = t.scan_files(between={"y": (0, 7)})
    assert len(xs) < 16 and len(ys) < 16
    got = t.read(spark, between={"x": (0, 7), "y": (0, 7)}).collect()
    assert len(got) == 64
    assert all(r.x <= 7 and r.y <= 7 for r in got)
