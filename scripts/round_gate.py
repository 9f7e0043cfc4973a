"""Round-end gate (the VERDICT r6 #1 convention): strict oracle
differential at BOTH sf0.001 and sf0.01, then the full pytest suite.
Rounding-boundary bugs are data-dependent — q196 shipped green at
sf0.01 and red at sf0.001 — so a single-scale gate is not a gate.

``--full`` adds a third tier: the strict sweep at sf0.1 (VERDICT r7
#2 — data-dependent contracts like hot-bucket caps, min-count floors
and 6dp rounding boundaries can diverge only above sf0.01; sf0.1 is
the scale the driver benches at, so it must also be the scale the
oracle has signed off on at least once per round — the r8 sweep
caught q186's FILTER-over-no-rows NULL divergence there). Every tier
writes its JSON verdict to STRICT_<sf>.json at the repo root so the
round has committed per-query artifacts at each gated scale.

Usage:
  python scripts/round_gate.py           (two-scale gate + pytest)
  python scripts/round_gate.py --full    (adds the sf0.1 strict tier)
Exit 0 = shippable.
"""
from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def main() -> int:
    full = "--full" in sys.argv[1:]
    rc = 0
    tiers = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    if full:
        tiers.append("/root/testdata/sf0.1")
    for sf_dir in tiers:
        print(f"=== strict oracle @ {sf_dir}", flush=True)
        base = os.path.basename(os.path.normpath(sf_dir))  # e.g. sf0.1
        out = os.path.join(REPO, f"STRICT_{base}.json")
        cmd = [
            sys.executable,
            os.path.join(HERE, "strict_oracle_check.py"),
            "--out",
            out,
        ]
        r = subprocess.run(cmd + [sf_dir], cwd=REPO)
        rc = rc or r.returncode
    # regenerate the committed plan inventory from the live registry
    # (VERDICT r11 #2: PLANS.md lagged the surface by one query when a
    # registration landed after the last manual regen; the gate now
    # rebuilds it every round, and tests/test_plans_inventory.py fails
    # the suite if the committed file ever disagrees with queries())
    print("=== plan inventory -> PLANS.md", flush=True)
    with open(os.path.join(REPO, "PLANS.md"), "w") as fh:
        r = subprocess.run(
            [
                sys.executable,
                os.path.join(HERE, "plan_report.py"),
                "/root/testdata/sf0.001",
            ],
            cwd=REPO,
            stdout=fh,
        )
    rc = rc or r.returncode
    print("=== pytest tests/", flush=True)
    r = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-q"], cwd=REPO
    )
    return rc or r.returncode


if __name__ == "__main__":
    raise SystemExit(main())
