"""Unit tests for the convergence-mode connected components and the
as-of join tolerance — the two semantics the oracle queries exercise
only at their registered configurations."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from whale_sightings_spark.operators.asof import asof_join
from whale_sightings_spark.operators.dedup import (
    dedup_components,
    dedup_components_converged,
)


def test_converged_components_unify_long_chains(spark):
    """A 9-node path graph has diameter 8: fixed k=3 propagation MUST
    leave it split (documented q29 contract), convergence mode MUST
    collapse it to a single component labeled by the min node."""
    edges = [(i, i + 1) for i in range(8)]  # path 0-1-2-...-8
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")

    fixed = dedup_components(pairs, iterations=3)
    assert fixed.select("label").distinct().count() > 1

    conv = dedup_components_converged(pairs)
    rows = {r["doc_id"]: r["label"] for r in conv.collect()}
    assert set(rows) == set(range(9))
    assert set(rows.values()) == {0}


def test_converged_components_multiple_components(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
        "doc_a long, doc_b long",
    )
    conv = dedup_components_converged(pairs)
    rows = {r["doc_id"]: r["label"] for r in conv.collect()}
    assert {rows[v] for v in (1, 2, 3)} == {1}
    assert {rows[v] for v in (10, 11)} == {10}
    assert {rows[v] for v in (20, 21, 22, 23)} == {20}


def _ts(minute: int) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1, 12, minute)


def test_asof_tolerance_nulls_stale_matches(spark):
    left = spark.createDataFrame(
        [(1, 100, _ts(10)), (1, 101, _ts(50))], "k int, lid int, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, 900, _ts(5))], "k int, rid int, ts timestamp"
    )
    # no tolerance: both left rows match the minute-5 right row
    out = {
        r["lid"]: r["rid_asof"]
        for r in asof_join(
            left, right, on="k", ts_col="ts", right_cols=["rid"]
        ).collect()
    }
    assert out == {100: 900, 101: 900}
    # 30-minute tolerance: the minute-50 row's only candidate is 45
    # minutes stale -> NULL; the minute-10 row's match (5 min) survives
    out_tol = {
        r["lid"]: r["rid_asof"]
        for r in asof_join(
            left, right, on="k", ts_col="ts", right_cols=["rid"],
            tolerance="30 minutes",
        ).collect()
    }
    assert out_tol == {100: 900, 101: None}


def test_asof_tolerance_boundary_is_inclusive(spark):
    left = spark.createDataFrame([(1, 1, _ts(30))], "k int, lid int, ts timestamp")
    right = spark.createDataFrame([(1, 7, _ts(0))], "k int, rid int, ts timestamp")
    out = asof_join(
        left, right, on="k", ts_col="ts", right_cols=["rid"],
        tolerance="30 minutes",
    ).collect()
    assert out[0]["rid_asof"] == 7


def test_asof_join_matches_pandas_merge_asof(spark):
    """Seeded random differential against pandas.merge_asof — an
    independent implementation of the same semantics (backward search,
    inclusive bound, optional tolerance)."""
    import numpy as np
    import pandas as pd

    for seed in (0, 1, 2):
        rng = np.random.default_rng(seed)
        n_l, n_r = 120, 80
        base = datetime.datetime(2024, 3, 1)
        lpd = pd.DataFrame(
            {
                "k": rng.integers(0, 5, n_l),
                "lid": np.arange(n_l),
                "ts": [
                    base + datetime.timedelta(seconds=int(s))
                    for s in rng.integers(0, 3600, n_l)
                ],
            }
        )
        # unique (k, ts) on the right: the operator's documented
        # precondition (ties would be ambiguous in any engine)
        rpd = pd.DataFrame(
            {
                "k": rng.integers(0, 5, n_r),
                "rid": np.arange(n_r),
                "ts": [
                    base + datetime.timedelta(seconds=int(s))
                    for s in rng.integers(0, 3600, n_r)
                ],
            }
        ).drop_duplicates(subset=["k", "ts"])

        left = spark.createDataFrame(lpd)
        right = spark.createDataFrame(rpd)

        for tol_str, tol_pd in ((None, None), ("10 minutes", pd.Timedelta(minutes=10))):
            got = {
                r["lid"]: r["rid_asof"]
                for r in asof_join(
                    left, right, on="k", ts_col="ts", right_cols=["rid"],
                    tolerance=tol_str,
                ).collect()
            }
            exp_df = pd.merge_asof(
                lpd.sort_values("ts", kind="stable"),
                rpd.sort_values("ts", kind="stable"),
                on="ts",
                by="k",
                direction="backward",
                tolerance=tol_pd,
            )
            exp = {
                int(r.lid): (None if pd.isna(r.rid) else int(r.rid))
                for r in exp_df.itertuples()
            }
            assert got == exp, f"seed={seed} tol={tol_str}"


def test_asof_nearest_matches_pandas_composition(spark):
    """Seeded random differential for the NEAREST direction: expected =
    pandas backward + forward merge_asof composed with the operator's
    documented tie rule (equidistant -> backward). Composing two
    independent pandas searches avoids depending on pandas' own
    (unspecified) nearest tie-break."""
    import datetime

    import numpy as np
    import pandas as pd

    from whale_sightings_spark.operators.asof import asof_join_nearest

    for seed in (0, 1, 2):
        rng = np.random.default_rng(seed)
        n_l, n_r = 120, 80
        base = datetime.datetime(2024, 3, 1)
        lpd = pd.DataFrame(
            {
                "k": rng.integers(0, 5, n_l),
                "lid": np.arange(n_l),
                "ts": [
                    base + datetime.timedelta(seconds=int(s))
                    for s in rng.integers(0, 3600, n_l)
                ],
            }
        )
        rpd = pd.DataFrame(
            {
                "k": rng.integers(0, 5, n_r),
                "rid": np.arange(n_r) + 1000,
                "ts": [
                    base + datetime.timedelta(seconds=int(s))
                    for s in rng.integers(0, 3600, n_r)
                ],
            }
        ).drop_duplicates(subset=["k", "ts"])

        lsort = lpd.sort_values("ts", kind="stable")
        rsort = rpd.sort_values("ts", kind="stable")
        back = pd.merge_asof(lsort, rsort, on="ts", by="k",
                             direction="backward", suffixes=("", "_b"))
        fwd = pd.merge_asof(lsort, rsort, on="ts", by="k",
                            direction="forward", suffixes=("", "_f"))
        rts = {(int(r.k), int(r.rid)): r.ts for r in rpd.itertuples()}
        exp = {}
        for b, f in zip(back.itertuples(), fwd.itertuples()):
            assert b.lid == f.lid
            bid = None if pd.isna(b.rid) else int(b.rid)
            fid = None if pd.isna(f.rid) else int(f.rid)
            if bid is None and fid is None:
                exp[int(b.lid)] = None
            elif fid is None:
                exp[int(b.lid)] = bid
            elif bid is None:
                exp[int(b.lid)] = fid
            else:
                bd = b.ts - rts[(int(b.k), bid)]
                fd = rts[(int(f.k), fid)] - f.ts
                exp[int(b.lid)] = bid if bd <= fd else fid

        got = {
            r["lid"]: r["rid_near"]
            for r in asof_join_nearest(
                spark.createDataFrame(lpd), spark.createDataFrame(rpd),
                on="k", ts_col="ts", right_cols=["rid"],
            ).collect()
        }
        assert got == exp, f"seed={seed}"
