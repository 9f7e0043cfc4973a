"""Single maintenance entry point over the persisted-artifact audit
family (round 12, VERDICT r11 #5).

Twelve audits exist as registered queries — rebuild drift for all eight
persisted artifact families plus the signature/vector coverage gates — but a
maintenance job previously had to invoke them one by one. This script
runs the whole family against one sf_dir and emits a rebuild-due
table: one row per artifact with its drift pressure in integer units
and a ``rebuild_due`` verdict, plus ONE machine-readable JSON line.

Usage: python scripts/audit_artifacts.py [sf_dir] [--json-only]

Exit code 0 = no artifact due, 1 = at least one due (cron-friendly),
2 = an audit errored.

Drift units per family are the audit's own integer damage counts
(changed + gained + lost, missing + orphan + duplicated, disagreeing
merge rounds, ...). The NB classifier additionally uses an LLR review
threshold (`NB_DRIFT_LLR`): token-level log-likelihood movement below
it is normal refresh noise, above it is a model shift a team reviews.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: LLR movement (6dp-rounded, the q238 contract) above which a token's
#: shift counts as drift pressure rather than refresh noise.
NB_DRIFT_LLR = 1.0

#: q258's top-K centrality overlap window (mirrors _PRDRIFT_K).
PR_TOPK = 50


def _one(rows):
    assert len(rows) == 1, f"expected one summary row, got {len(rows)}"
    return rows[0].asDict()


def _sum_counts(rows, *cols):
    r = _one(rows)
    return sum(r[c] for c in cols), r


def _x_cluster(rows):
    return _sum_counts(
        rows, "n_label_changed", "n_newly_clustered", "n_declustered"
    )


def _x_pairs(rows):
    return _sum_counts(rows, "n_gained", "n_lost")


def _x_pagerank(rows):
    r = _one(rows)
    uncommon = (r["n_hist_nodes"] - r["n_common_nodes"]) + (
        r["n_full_held_nodes"] - r["n_common_nodes"]
    )
    k = min(PR_TOPK, r["n_hist_nodes"], r["n_full_held_nodes"])
    return uncommon + (k - r["topk_overlap"]), r


def _x_lm(rows):
    return _sum_counts(rows, "n_changed", "n_gained", "n_lost")


def _x_ivf(rows):
    return _sum_counts(rows, "n_cell_changed", "n_gained", "n_lost")


def _x_coverage(rows):
    return _sum_counts(rows, "n_missing", "n_orphan", "n_dup_keys")


def _x_bpe(rows):
    # per-merge-round table: drift pressure = rounds where history and
    # full-corpus training disagree on the chosen merge
    n = sum(0 if r["agree"] else 1 for r in rows)
    return n, {"n_rounds": len(rows), "n_disagree_rounds": n}


def _x_nb(rows):
    # per-token table ranked drift-desc: pressure = vocab growth plus
    # tokens whose (rounded) LLR moved past the review threshold
    new_toks = rows[0]["n_new_tokens"] if rows else 0
    moved = sum(1 for r in rows if r["drift"] >= NB_DRIFT_LLR)
    return new_toks + moved, {
        "n_new_tokens": new_toks,
        "n_tokens_moved": moved,
        "max_drift": rows[0]["drift"] if rows else 0.0,
    }


#: (artifact family, registered audit query, drift extractor)
AUDITS = [
    ("sig_coverage", "q263_sig_coverage_audit", _x_coverage),
    ("evec_coverage", "q265_evec_coverage_audit", _x_coverage),
    ("cluster_labels", "q243_cluster_rebuild_drift", _x_cluster),
    ("simhash_pairs", "q251_pair_rebuild_drift", _x_pairs),
    ("minhash_pairs", "q262_minhash_pair_rebuild_drift", _x_pairs),
    ("embed_pairs", "q264_embed_pair_rebuild_drift", _x_pairs),
    ("pagerank", "q258_pagerank_rebuild_drift", _x_pagerank),
    ("ngram_lm", "q259_lm_rebuild_drift", _x_lm),
    ("shingle_postings", "q260_shingle_rebuild_drift", _x_pairs),
    ("ivf_codes", "q261_ivf_codes_rebuild_drift", _x_ivf),
    ("bpe_tokenizer", "q188_bpe_drift", _x_bpe),
    ("nb_classifier", "q238_nb_retrain_drift", _x_nb),
]


def audit_artifacts(spark, sf_dir: str) -> list[dict]:
    """Run every artifact audit; one dict per family:
    {artifact, query, drift_units, rebuild_due, detail | error}."""
    from whale_sightings_spark.plans.queries import queries

    q = queries()
    out = []
    for artifact, name, extract in AUDITS:
        entry = {"artifact": artifact, "query": name}
        try:
            rows = q[name](spark, sf_dir).collect()
            drift, detail = extract(rows)
            entry.update(
                drift_units=int(drift),
                rebuild_due=bool(drift > 0),
                detail={
                    k: v for k, v in detail.items() if k != "detail"
                },
            )
        except Exception as e:  # surface, don't die: audit the rest
            entry.update(error=f"{type(e).__name__}: {e}")
        out.append(entry)
    return out


def main() -> int:
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    json_only = "--json-only" in sys.argv
    sf_dir = argv[0] if argv else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    from whale_sightings_spark.session import get_spark

    results = audit_artifacts(get_spark(app_name="audit_artifacts"), sf_dir)
    if not json_only:
        w = max(len(r["artifact"]) for r in results)
        for r in results:
            if "error" in r:
                line = f"ERROR  {r['error']}"
            else:
                due = "REBUILD DUE" if r["rebuild_due"] else "ok"
                line = f"{r['drift_units']:>8d}  {due}"
            print(f"{r['artifact']:<{w}}  {line}", file=sys.stderr)
    print(json.dumps({"sf_dir": sf_dir, "audits": results}))
    if any("error" in r for r in results):
        return 2
    return 1 if any(r["rebuild_due"] for r in results) else 0


if __name__ == "__main__":
    raise SystemExit(main())
