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
