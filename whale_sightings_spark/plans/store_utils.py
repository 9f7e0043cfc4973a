"""Shared maintenance for the build-if-absent artifact caches under
`.index_cache/` (IVF-PQ index, BPE tokenizer, NB model, shingle index,
cluster labels+pairs, n-gram LM).

Every builder stages into `<artifact>.tmp.<pid>` and publishes via
atomic rename; an in-process build failure rmtree's its own staging,
but a hard kill (OOM, SIGKILL) still leaves a near-full-size partial
store behind — and the eviction sweeps deliberately skip `.tmp.` dirs
so they never race a LIVE builder. `reap_dead_staging` closes that
leak: a `.tmp.<pid>` dir whose pid no longer exists has no builder to
race, so it is garbage by construction and safe to remove."""
from __future__ import annotations

import os
import shutil


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True  # exists, owned by someone else
    return True


def reap_dead_staging(sf_root: str) -> list[str]:
    """Remove `*.tmp.<pid>` dirs under ``sf_root`` whose builder pid is
    dead. Called from every store's eviction sweep; returns the reaped
    names (for tests). Live pids — including our own — are left alone."""
    reaped: list[str] = []
    if not os.path.isdir(sf_root):
        return reaped
    for d in os.listdir(sf_root):
        head, sep, tail = d.rpartition(".tmp.")
        if not sep or not tail.isdigit():
            continue
        if _pid_alive(int(tail)):
            continue
        shutil.rmtree(os.path.join(sf_root, d), ignore_errors=True)
        reaped.append(d)
    return reaped


# ---------------------------------------------------------------------------
# Memoized artifact-table reads (round 11, VERDICT r10 #5): six stores
# x ~260 queries each re-ran `spark.read.parquet` per invocation, and
# the DataFrame construction itself is the fixed overhead — schema
# inference + partition-directory discovery cost ~90 ms on a bucket-
# partitioned table with no explicit schema, ~10 ms with one. A
# published artifact table is immutable between publishes, and EVERY
# mutation path rewrites its `_SUCCESS` marker (build, streaming
# append, compaction swap), so the marker's stat signature is a sound
# re-key: the memo serves the same DataFrame object while the marker
# is unchanged and re-reads the moment it moves (or vanishes — an
# invalidated derived table stats to nothing and misses).
# ---------------------------------------------------------------------------

def marker_sig(marker_path: str) -> str | None:
    """Stat signature of a table's ``_SUCCESS`` marker as a stable
    string (mtime_ns/ino/size), or None if it does not exist. Every
    mutation path of a published artifact rewrites its marker (build,
    streaming append, compaction swap), so this is the table's
    generation id — used both by the DataFrame memo below and by the
    derived-table ``_GEN`` freshness gate in ``cluster_store``."""
    try:
        st = os.stat(marker_path)
    except OSError:
        return None
    return f"{st.st_mtime_ns}_{st.st_ino}_{st.st_size}"


_DF_MEMO: dict = {}


def read_artifact_table(spark, path: str, schema=None):
    """`spark.read[.schema(schema)].parquet(path)` memoized on the
    table's `_SUCCESS` stat signature (mtime_ns, ino, size). Tables
    without a marker (mid-build, foreign dirs) are read uncached. The
    owning session rides in the memo value, so a recycled `id()` after
    session teardown can never serve another session's plan."""
    import os

    marker = os.path.join(path, "_SUCCESS")
    try:
        st = os.stat(marker)
        sig = (st.st_mtime_ns, st.st_ino, st.st_size)
    except OSError:
        sig = None
    # the declared schema joins the key: two readers of one path with
    # different schemas (or inferred vs declared) must not share a plan
    key = (os.path.abspath(path), str(schema))
    if sig is not None:
        hit = _DF_MEMO.get(key)
        if hit is not None and hit[0] == sig and hit[2] is spark:
            return hit[1]
    reader = spark.read.schema(schema) if schema is not None else spark.read
    df = reader.parquet(path)
    if sig is not None:
        _DF_MEMO[key] = (sig, df, spark)
    return df
