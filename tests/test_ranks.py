"""Differential tests for operators.ranks: the segmented range-bucketed
ranking must reproduce Spark's native window functions exactly — the
native single-task-per-group form is the spec, the segmented form is
the scale-shape implementation."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from whale_sightings_spark.operators import ranks as RK


def _random_df(spark, seed: int, n: int, value_range: int):
    rng = random.Random(seed)
    rows = [
        (i, rng.choice(["a", "b", "c"]), float(rng.randint(0, value_range)))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "uid long, grp string, val double")


@pytest.mark.parametrize(
    "seed,n,value_range,width",
    [
        (1, 300, 1000, 64.0),  # many buckets
        (2, 200, 30, 7.0),     # heavy ties across bucket boundaries
        (3, 120, 500, 10000.0),  # one bucket (degenerates to plain window)
    ],
)
def test_segmented_total_order_matches_native_windows(
    spark, seed, n, value_range, width
):
    df = _random_df(spark, seed, n, value_range)
    got = RK.segmented_total_order(df, "grp", "val", "uid", width, descending=True)
    w = W.partitionBy("grp").orderBy(F.col("val").desc(), F.col("uid").asc())
    want = df.select(
        "uid",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(W.partitionBy("grp")).alias("n_part"),
        F.lag("val").over(w).alias("prev_val"),
        F.ntile(7).over(w).alias("tile"),
        F.round(F.percent_rank().over(w), 9).alias("pr"),
        F.round(F.cume_dist().over(w), 9).alias("cd"),
    )
    rn, np_ = F.col("rn"), F.col("n_part")
    got_flat = got.select(
        "uid",
        rn.cast("int").alias("rn"),
        np_.cast("int").alias("n_part"),
        "prev_val",
        RK.ntile_from_rn(rn, np_, 7).cast("int").alias("tile"),
        F.round(
            F.when(np_ == 1, 0.0).otherwise((rn - 1) / (np_ - 1)), 9
        ).alias("pr"),
        F.round(rn / np_, 9).alias("cd"),
    )
    g = {r.uid: r for r in got_flat.collect()}
    e = {r.uid: r for r in want.collect()}
    assert set(g) == set(e)
    for uid in e:
        assert g[uid] == e[uid], (uid, g[uid], e[uid])


@pytest.mark.parametrize("seed,width", [(11, 5.0), (12, 1.0), (13, 1e9)])
def test_segmented_avg_rank_matches_native_tie_average(spark, seed, width):
    # avg rank with ties == rank() + (peer_count - 1)/2 under the native
    # group-partitioned window
    df = _random_df(spark, seed, 250, 20)  # value_range 20 -> dense ties
    got = RK.segmented_avg_rank(df, "grp", "val", width, "avg_rank")
    w = W.partitionBy("grp").orderBy("val")
    want = df.select(
        "uid",
        (
            F.rank().over(w)
            + (F.count("*").over(W.partitionBy("grp", "val")) - 1) / 2.0
        ).alias("avg_rank"),
    )
    g = {r.uid: r.avg_rank for r in got.select("uid", "avg_rank").collect()}
    e = {r.uid: r.avg_rank for r in want.collect()}
    assert g == e


def test_freq_avg_ranks_matches_native(spark):
    df = _random_df(spark, 21, 200, 10)
    got = RK.freq_avg_ranks(df.select("grp", "val"), "grp", "val")
    w = W.partitionBy("grp").orderBy("val")
    want = df.select(
        "grp",
        "val",
        (
            F.rank().over(w)
            + (F.count("*").over(W.partitionBy("grp", "val")) - 1) / 2.0
        ).alias("avg_rank"),
    ).distinct()
    g = {(r.grp, r.val): r.avg_rank for r in got.collect()}
    e = {(r.grp, r.val): r.avg_rank for r in want.collect()}
    assert g == e


# ---------------------------------------------------------------------------
# r12: _exact_deciles (q72) must reproduce F.percentile bit-for-bit on
# BOTH its size-adaptive paths — the sorted-array one-task path and the
# distributed rank-selection path (forced by shrinking the size gate).
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "data",
    [
        [1.0],
        [1.0, 2.0],
        [2.0] * 10 + [3.0] * 7,           # heavy ties
        [float(x) for x in range(11)],    # integer decile positions
        [float(x * x % 97) for x in range(500)],
    ],
)
def test_exact_deciles_match_builtin_percentile(spark, data, monkeypatch):
    from whale_sightings_spark.plans import queries_relational as QR

    df = spark.createDataFrame([(x,) for x in data], "v double")
    want = df.agg(
        F.percentile("v", F.lit(QR._DECILES)).alias("b")
    ).collect()[0][0]
    got_local = QR._exact_deciles(df, "v").collect()[0][0]
    assert got_local == want  # exact doubles, no tolerance
    # force the distributed rank-selection path
    monkeypatch.setattr(QR, "_DECILE_LOCAL_BYTES", -1)
    got_dist = QR._exact_deciles(df, "v").collect()[0][0]
    assert got_dist == want
