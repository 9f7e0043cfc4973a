"""Shared rebuild-drift core for the persisted-artifact audits.

Every persisted artifact family carries a maintenance audit of the
same shape (q243 labels, q251 pairs, q258 pagerank nodes, q259 LM
counts): recompute the artifact's content from first principles over
a HISTORY slice of the corpus, restrict the STORED full-corpus table
to the same slice, and price the drift between the two — how many
rows survived unchanged, changed value, appeared, or vanished. The
drift is real signal, not noise: hot-bucket caps, banding
interactions, and append-only streaming ingest all make the stored
table diverge from what a fresh rebuild would produce, and a
maintenance job reads these counts to decide when a rebuild is due.

Scale shape: ONE full-outer equi-join on the audit key and ONE
aggregation — both sides are artifact-scale (edge-set / node-set /
posting-set bounded), never corpus-scale, and the join keys are the
artifact's own layout keys so the shuffle partitions cleanly. All
outputs are integers (the q258 header convention): no float boundary
ever enters the oracle hash gate.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rebuild_drift(
    hist: DataFrame,
    stored: DataFrame,
    key_cols: list[str] | tuple[str, ...],
    value_col: str | None = None,
) -> DataFrame:
    """One-row drift profile of a first-principles HISTORY recompute
    vs the STORED artifact table restricted to the same slice.

    ``key_cols`` must uniquely key both inputs (the artifact's natural
    key). With ``value_col``, a key present on both sides only counts
    as stable when the values agree (null-safe); without it, presence
    alone is stability and ``n_changed`` is structurally 0.

    Returns (n_hist, n_stored, n_stable, n_changed, n_gained, n_lost):
    gained = stored-only keys (new data clustered / counted what the
    history slice had not), lost = history-only keys (the stored table
    dropped or never had what a rebuild would produce).
    """
    keys = list(key_cols)
    h_cols = [F.col(value_col).alias("__v_hist")] if value_col else []
    s_cols = [F.col(value_col).alias("__v_stored")] if value_col else []
    h = hist.select(*keys, *h_cols, F.lit(1).alias("__in_hist"))
    s = stored.select(*keys, *s_cols, F.lit(1).alias("__in_stored"))
    j = h.join(s, keys, "full_outer")
    ih = F.col("__in_hist") == 1
    isd = F.col("__in_stored") == 1
    both = ih & isd
    if value_col:
        same = F.col("__v_hist").eqNullSafe(F.col("__v_stored"))
        stable, changed = both & same, both & ~same
    else:
        stable, changed = both, F.lit(False)

    def _cnt(cond, name):
        # coalesce: sum over zero rows is NULL, and an empty artifact
        # must read as all-zero drift, not all-NULL
        return (
            F.coalesce(F.sum(F.when(cond, 1).otherwise(0)), F.lit(0))
            .cast("bigint")
            .alias(name)
        )

    return j.agg(
        _cnt(ih, "n_hist"),
        _cnt(isd, "n_stored"),
        _cnt(stable, "n_stable"),
        _cnt(changed, "n_changed"),
        _cnt(isd & ~ih.eqNullSafe(F.lit(True)), "n_gained"),
        _cnt(ih & ~isd.eqNullSafe(F.lit(True)), "n_lost"),
    )
