"""Z-order layout: the multi-dimensional data-skipping contract.

The claim operators/zorder.py makes for 100 TB is physical: files written
in Morton order cover bounded rectangles of the key space, so a box
predicate on EITHER dimension touches a small subset of files, while a
single-key sort only skips on that one key. These tests measure actual
files touched via the parquet `_metadata.file_path` hidden column.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from monitoring_data_ingestion_spark.operators.zorder import (
    morton2,
    quantize,
    zorder_write,
)
from monitoring_data_ingestion_spark.sources.readers import table

from .conftest import SF_SMOKE

N_FILES = 16


def _files_touched(spark, path, predicate):
    df = spark.read.parquet(path).filter(predicate)
    return (
        df.select(F.col("_metadata.file_path").alias("f")).distinct().count()
    )


def test_morton_is_monotone_in_quadrants(spark):
    """Quadrant ordering sanity: all z-values of the (low, low) quadrant
    sort strictly below the (high, high) quadrant."""
    df = spark.range(0, 256).select(
        (F.col("id") % 16).alias("x"), (F.col("id") / 16).cast("bigint").alias("y")
    )
    z = df.select("x", "y", morton2(F.col("x"), F.col("y"), 4).alias("z"))
    low = z.filter((F.col("x") < 8) & (F.col("y") < 8)).agg(F.max("z")).first()[0]
    high = z.filter((F.col("x") >= 8) & (F.col("y") >= 8)).agg(F.min("z")).first()[0]
    assert low < high


def test_quantize_clamps_and_covers(spark):
    df = spark.createDataFrame([(-5.0,), (0.0,), (50.0,), (100.0,), (200.0,)], ["v"])
    out = [r[0] for r in df.select(quantize(F.col("v"), 0.0, 100.0, 8)).collect()]
    assert out[0] == 0  # below range clamps to 0
    assert out[1] == 0
    assert out[4] == 255  # above range clamps to max cell
    assert 0 < out[2] < 255


def test_zorder_layout_skips_files_on_both_dims(spark, tmp_path):
    """Box predicates on each dimension must touch a minority of z-ordered
    files; under a single-key sort the secondary dimension touches ~all
    files. This is the measurable data-skipping win of the curve."""
    e = table(spark, SF_SMOKE, "events").select("event_id", "user_id", "value")
    u_min, u_max = e.agg(F.min("user_id"), F.max("user_id")).first()
    v_min, v_max = e.agg(F.min("value"), F.max("value")).first()

    zpath = str(tmp_path / "events_z")
    zorder_write(
        e,
        zpath,
        [("user_id", float(u_min), float(u_max)), ("value", float(v_min), float(v_max))],
        n_files=N_FILES,
    )
    # Single-key layout: range-partitioned by user_id only.
    spath = str(tmp_path / "events_s")
    (
        e.repartitionByRange(N_FILES, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(spath)
    )

    # Narrow box on user_id (primary dim): both layouts skip.
    u_span = (u_max - u_min) or 1
    u_pred = (F.col("user_id") >= u_min) & (F.col("user_id") <= u_min + u_span // 8)
    assert _files_touched(spark, zpath, u_pred) < N_FILES
    assert _files_touched(spark, spath, u_pred) < N_FILES

    # Narrow box on value (secondary dim): only the z-layout skips.
    v_span = (v_max - v_min) or 1.0
    v_pred = (F.col("value") >= v_min) & (F.col("value") <= v_min + v_span / 8)
    z_touch = _files_touched(spark, zpath, v_pred)
    s_touch = _files_touched(spark, spath, v_pred)
    # The single-key layout cannot skip on the secondary dim; the z-layout
    # must skip strictly more. (Equal-row-count file ranges over a skewed
    # value distribution keep the ratio modest at 16 files — at production
    # file counts the bound tightens toward the ideal 1/√files.)
    assert z_touch < s_touch, (z_touch, s_touch)
    assert z_touch <= (3 * N_FILES) // 4


def test_zorder_write_roundtrip_preserves_rows(spark, tmp_path):
    e = table(spark, SF_SMOKE, "events").select("event_id", "user_id", "value")
    path = str(tmp_path / "events_rt")
    zorder_write(e, path, [("user_id", 0.0, 1000.0), ("value", 0.0, 100.0)], n_files=4)
    back = spark.read.parquet(path)
    assert back.count() == e.count()
    assert set(r[0] for r in back.select("event_id").collect()) == set(
        r[0] for r in e.select("event_id").collect()
    )
