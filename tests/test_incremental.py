"""Batch-incremental watermark pipeline (ref extract.py:196-211 flow):
advance-only-on-success, replay safety, and empty-batch no-op."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from zoom_etl_spark.catalog import table
from zoom_etl_spark.streaming.incremental import (read_watermark,
                                                  run_incremental)


def test_incremental_flow(spark, sf_dir):
    events = table(spark, sf_dir, "events")
    control = tempfile.mkdtemp(prefix="zes_wm_") + "/wm"
    loaded = []

    n1 = run_incremental(spark, events, control, lambda b: loaded.append(b.count()))
    assert n1 == events.count()            # first run: everything
    wm = read_watermark(spark, control)
    assert wm == events.agg(F.max("ts")).collect()[0][0]

    # second run: only the boundary row (ts >= watermark is inclusive —
    # idempotent upserts absorb the overlap, mirroring the reference)
    n2 = run_incremental(spark, events, control, lambda b: None)
    assert n2 == events.filter(F.col("ts") >= F.lit(wm)).count() == 1


def test_failed_load_keeps_watermark(spark, sf_dir):
    events = table(spark, sf_dir, "events")
    control = tempfile.mkdtemp(prefix="zes_wm_") + "/wm"

    def boom(_):
        raise RuntimeError("load failed")

    with pytest.raises(RuntimeError):
        run_incremental(spark, events, control, boom)
    assert read_watermark(spark, control) is None   # not advanced

    n = run_incremental(spark, events, control, lambda b: None)
    assert n == events.count()             # replay processes everything
