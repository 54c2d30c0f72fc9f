"""Z-order layout: Morton math + the 2-D pruning win it exists for."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_his_spark.operators.zorder import zorder_file_ids, zorder_keys


def test_zorder_keys_corner_bins(spark):
    # 2-D grid 0..255 × 0..255: extremes map to bin 0 and 255 exactly
    df = spark.createDataFrame(
        [(0, 0.0, 0), (1, 255.0, 255), (2, 128.0, 64)],
        "id long, x double, y int",
    )
    rows = {r.id: r for r in zorder_keys(df, "x", "y").collect()}
    assert (rows[0].x_bin, rows[0].y_bin, rows[0].zval) == (0, 0, 0)
    assert rows[1].x_bin == 255 and rows[1].y_bin == 255
    assert rows[1].zval == (1 << 16) - 1  # all 16 bits set
    # interleave: even bits from x, odd bits from y
    r = rows[2]
    assert r.zval == sum(
        (((r.x_bin >> i) & 1) << (2 * i)) | (((r.y_bin >> i) & 1) << (2 * i + 1))
        for i in range(8)
    )


def test_zorder_degenerate_span_is_zero_bin(spark):
    df = spark.createDataFrame([(1, 5.0, 3), (2, 5.0, 9)], "id long, x double, y int")
    out = zorder_keys(df, "x", "y").collect()
    assert all(r.x_bin == 0 for r in out)  # zero span → single bin


def test_zorder_files_prune_2d_box_better_than_row_order(spark):
    # 64×64 grid, 64 files of 64 rows each. A 8×8 box predicate:
    # row-order layout stores full x-stripes per file, so EVERY file
    # overlapping the 8 y-columns... (x-major: each file = 1 x value ×
    # all y) → 8 files each fully scanned on x, but selective on y only
    # via footer min/max = whole range → touches 8 files. Z-order
    # groups the box into O(box-area / file-size) neighborhoods.
    n = 64
    grid = spark.range(n * n).select(
        (F.col("id") / n).cast("int").cast("double").alias("x"),
        (F.col("id") % n).cast("int").alias("y"),
    )
    z = zorder_file_ids(grid, n_files=64, xcol="x", ycol="y", bits=8)
    box = z.filter((F.col("x") >= 8) & (F.col("x") <= 15)
                   & (F.col("y") >= 8) & (F.col("y") <= 15))
    z_files = box.select("file_id").distinct().count()

    # row-order files: 64 consecutive ids per file = one x value each →
    # the same box touches every file whose x stripe intersects [8,15]
    row_files = (
        grid.withColumn("file_id", (F.col("x")).cast("long"))
        .filter((F.col("x") >= 8) & (F.col("x") <= 15)
                & (F.col("y") >= 8) & (F.col("y") <= 15))
        .select("file_id").distinct().count()
    )
    # a y-ordered layout is symmetric (8 files); z-order touches fewer
    # for the same box because both dims contribute locality
    assert z_files < row_files
    assert row_files == 8
