"""The committed PLANS.md inventory must cover the live registry
(VERDICT r11 #2: it lagged by one query when a registration landed
after the last manual regen; `scripts/round_gate.py` now regenerates
it every round and this test fails the suite on any disagreement)."""
from __future__ import annotations

import os
import re

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_plans_md_matches_registry():
    from whale_sightings_spark.plans.queries import queries

    with open(os.path.join(REPO, "PLANS.md")) as fh:
        rows = re.findall(r"^\| (q\d+_\w+) \|", fh.read(), re.M)
    assert sorted(rows) == sorted(queries()), (
        "PLANS.md is stale — regenerate with "
        "`python scripts/plan_report.py /root/testdata/sf0.001 > PLANS.md`"
    )


def test_plans_md_has_no_forbidden_shapes():
    with open(os.path.join(REPO, "PLANS.md")) as fh:
        lines = [
            ln for ln in fh if re.match(r"\| q\d", ln)
        ]
    assert lines
    for ln in lines:
        cells = [c.strip() for c in ln.strip().strip("|").split("|")]
        # columns: query, shuffles, broadcasts, windows, wgl,
        # arrow_py, map_pandas, CARTESIAN, ROW_PY
        assert cells[-1] == "0" and cells[-2] == "0", ln
