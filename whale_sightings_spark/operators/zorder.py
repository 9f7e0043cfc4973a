"""Z-order (Morton) clustering key — multi-dimensional data layout for
footer-stats skipping (net-new scale surface; the reference's
single-node pipeline has no layout management at all).

Range-sorting on one column gives perfect skipping on that column and
none on others. Interleaving the bits of several quantile-bucketed
columns gives a single sort key whose locality is shared across all of
them — scans filtering on ANY of the interleaved dimensions skip a
large fraction of files. This is the standard lakehouse OPTIMIZE
ZORDER BY layout, built from native expressions:

1. per-column quantile bucketing to [0, 2^bits): one single-row
   percentile_approx aggregate over all dimensions at once (bounded,
   broadcast — the same scalar-broadcast shape as q36/q72), then a
   row-local array predicate assigns each value its cell;
2. bit interleave of the cell ids via shifts/ors — row-local,
   whole-stage-codegen'd, no UDF.

Quantile bucketing (not min/max scaling) makes the key robust to skew:
each dimension contributes uniformly however its values are
distributed. No global window anywhere: the only wide op is the
1-row aggregate. Compose with ``sources.files.compact_parquet``
(cluster_by=["z_key"]) for the OPTIMIZE ZORDER maintenance pass.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: bits per dimension: 256 cells/dim — file-level skipping needs far
#: fewer distinct cells than files, and the boundary arrays stay small
#: enough to broadcast (2^bits - 1 doubles per dimension)
ZBITS = 8


def _interleave(cols: Sequence[Column], bits: int) -> Column:
    """Morton-interleave ``cols`` (already integer in [0, 2^bits)):
    output bit (i * n_dims + d) = bit i of cols[d]."""
    n = len(cols)
    parts = []
    for d, c in enumerate(cols):
        for i in range(bits):
            # bit i of this dimension, shifted to its interleaved slot
            parts.append(
                F.shiftleft(
                    F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1)),
                    i * n + d,
                )
            )
    return reduce(lambda a, b: a.bitwiseOR(b), parts)


def with_zorder_key(
    df: DataFrame, cols: Sequence[str], out: str = "z_key", bits: int = ZBITS
) -> DataFrame:
    """Append a Morton key over numeric/timestamp ``cols``; sort or
    range-partition by it to cluster the layout on all dimensions at
    once. Two passes over the data (boundary agg + keyed projection),
    one broadcast, zero shuffles of the fact itself."""
    n_cells = 2**bits
    probs = [i / n_cells for i in range(1, n_cells)]
    as_num = {c: F.col(c).cast("double") for c in cols}
    bounds = df.agg(
        *[
            F.percentile_approx(as_num[c], F.lit(probs), F.lit(10_000)).alias(
                f"_zb_{c}"
            )
            for c in cols
        ]
    )
    keyed = df.crossJoin(F.broadcast(bounds))
    cell_cols = []
    for c in cols:
        num = as_num[c]
        cell = F.size(F.filter(F.col(f"_zb_{c}"), lambda b: num > b))
        cell_cols.append(cell)
    keyed = keyed.withColumn(out, _interleave(cell_cols, bits))
    return keyed.drop(*[f"_zb_{c}" for c in cols])
