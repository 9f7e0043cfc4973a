"""End-to-end test of the single maintenance entry point over the
persisted-artifact audit family (`scripts/audit_artifacts.py`,
VERDICT r11 #5)."""
from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts",
    ),
)

from audit_artifacts import AUDITS, audit_artifacts  # noqa: E402


def test_audit_artifacts_covers_family_end_to_end(spark, sf_dir):
    """One call audits all twelve artifact families: every entry carries
    an integer drift pressure and a rebuild_due verdict, none errors,
    and the coverage gate (q263) reads clean on an intact store."""
    results = audit_artifacts(spark, sf_dir)
    assert [r["artifact"] for r in results] == [a for a, _, _ in AUDITS]
    for r in results:
        assert "error" not in r, f"{r['artifact']}: {r.get('error')}"
        assert isinstance(r["drift_units"], int) and r["drift_units"] >= 0
        assert isinstance(r["rebuild_due"], bool)
        assert r["rebuild_due"] == (r["drift_units"] > 0)
    by_name = {r["artifact"]: r for r in results}
    cov = by_name["sig_coverage"]
    assert cov["drift_units"] == 0
    assert cov["detail"]["n_covered"] == cov["detail"]["n_expected"] > 0


def test_audit_artifacts_cli_emits_one_json_line(sf_dir):
    """The CLI prints exactly one JSON object on stdout (the table
    goes to stderr) and exits 0/1 by rebuild-due, never 2 on an
    intact store."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(repo, "scripts", "audit_artifacts.py"),
            sf_dir,
            "--json-only",
        ],
        capture_output=True,
        text=True,
        timeout=900,
        cwd=repo,
    )
    assert proc.returncode in (0, 1), proc.stderr[-2000:]
    lines = [
        ln for ln in proc.stdout.splitlines() if ln.startswith("{")
    ]
    assert len(lines) == 1
    payload = json.loads(lines[0])
    assert payload["sf_dir"] == sf_dir
    assert len(payload["audits"]) == len(AUDITS)
    due = any(a["rebuild_due"] for a in payload["audits"])
    assert proc.returncode == (1 if due else 0)
