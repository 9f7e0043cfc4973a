"""Per-batch timing smoke for the streaming operators (VERDICT r12 #7):
the micro-batch cores inherit the batch-operator optimizations, but no
streaming-side LATENCY number existed to check that inheritance. This
smoke drives a 2-file sf0.001 backlog through five representative
foreachBatch operators with a StreamingQueryListener attached and
records every batch's durationMs.

It is a SMOKE: it asserts each operator processed >= 1 batch and that
durations are finite/positive — it does not gate on wall time (this
host's noise would flake it). The numbers are printed (visible with
-s / on failure) and, when $SPARK_GRAFT_STREAM_TIMING_OUT is set,
written there as JSON so a round can commit the capture as evidence.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from whale_sightings_spark.schemas import load_table


class _Recorder:
    """Collect (name -> [per-batch durationMs]) via the listener API."""

    def __init__(self):
        self.progress = []


def _make_listener(rec):
    from pyspark.sql.streaming import StreamingQueryListener

    class L(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            p = event.progress
            rec.progress.append(
                {
                    "batchId": p.batchId,
                    "durationMs": dict(p.durationMs),
                    "numInputRows": p.numInputRows,
                }
            )

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    return L()


def test_streaming_batch_timing_smoke(spark, sf_dir, tmp_path_factory):
    from whale_sightings_spark.streaming import events as SE

    from whale_sightings_spark.operators import ngram_lm as LM
    from whale_sightings_spark.operators import shingles as SH

    base = tmp_path_factory.mktemp("stream_timing")
    split = 400
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    docs_dir, emb_dir = str(base / "docs"), str(base / "emb")
    for src, col, out in ((docs, "doc_id", docs_dir), (emb, "vec_id", emb_dir)):
        src.filter(F.col(col) < split).coalesce(1).write.parquet(
            out, mode="append"
        )
        src.filter(F.col(col) >= split).coalesce(1).write.parquet(
            out, mode="append"
        )
    # the store-ingest operators stream DELTAS into a pre-built
    # history artifact (the q172/q244 lifecycle)
    delta_dir = str(base / "delta_docs")
    docs.filter(F.col("doc_id") >= split).coalesce(1).write.parquet(
        delta_dir, mode="append"
    )
    shingle_art = str(base / "shingle_art")
    SH.build_shingle_artifact(docs.filter(F.col("doc_id") < split), shingle_art)
    lm_art = str(base / "lm_art")
    LM.build_lm_artifact(docs.filter(F.col("doc_id") < split), lm_art)

    rec = _Recorder()
    listener = _make_listener(rec)
    spark.streams.addListener(listener)
    timings: dict[str, dict] = {}
    try:
        ops = {
            "incremental_neardup": lambda tag: SE.streaming_incremental_neardup(
                spark, docs_dir, str(base / f"st_{tag}"), str(base / f"out_{tag}"),
                str(base / f"ck_{tag}")),
            "ivf_ingest": lambda tag: SE.streaming_ivf_ingest(
                spark, emb_dir, str(base / f"st_{tag}"), str(base / f"ck_{tag}")),
            "ivfpq_encode": lambda tag: SE.streaming_ivfpq_encode(
                spark, emb_dir, str(base / f"st_{tag}"), str(base / f"ck_{tag}")),
            "shingle_index_ingest": lambda tag: SE.streaming_shingle_index_ingest(
                spark, delta_dir, shingle_art, str(base / f"ck_{tag}")),
            "lm_ingest": lambda tag: SE.streaming_lm_ingest(
                spark, delta_dir, lm_art, str(base / f"ck_{tag}")),
        }
        for name, run in ops.items():
            n0 = len(rec.progress)
            t0 = time.perf_counter()
            run(name)
            wall = time.perf_counter() - t0
            # listener delivery is async; poll briefly for this run's events
            deadline = time.monotonic() + 10
            while len(rec.progress) == n0 and time.monotonic() < deadline:
                time.sleep(0.2)
            mine = rec.progress[n0:]
            batches = [
                p["durationMs"].get("triggerExecution") for p in mine
                if p["numInputRows"] or p["durationMs"].get("triggerExecution")
            ]
            timings[name] = {
                "wall_s": round(wall, 3),
                "n_batches": len(mine),
                "batch_trigger_ms": batches,
            }
            assert len(mine) >= 1, f"{name}: no batch progress recorded"
            assert all(
                b is None or b >= 0 for b in batches
            ), f"{name}: bad durations {batches}"
    finally:
        spark.streams.removeListener(listener)

    print("streaming per-batch timings:", json.dumps(timings, indent=1))
    out = os.environ.get("SPARK_GRAFT_STREAM_TIMING_OUT")
    if out:
        with open(out, "w") as fh:
            json.dump(timings, fh, indent=1)
