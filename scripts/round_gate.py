"""Round-end gate (the VERDICT r6 #1 convention): strict oracle
differential at BOTH sf0.001 and sf0.01, then the full pytest suite.
Rounding-boundary bugs are data-dependent — q196 shipped green at
sf0.01 and red at sf0.001 — so a single-scale gate is not a gate.

Usage: python scripts/round_gate.py   (exit 0 = shippable)
"""
from __future__ import annotations

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def main() -> int:
    rc = 0
    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        print(f"=== strict oracle @ {sf_dir}", flush=True)
        r = subprocess.run(
            [sys.executable, os.path.join(HERE, "strict_oracle_check.py"), sf_dir],
            cwd=REPO,
        )
        rc = rc or r.returncode
    print("=== pytest tests/", flush=True)
    r = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-q"], cwd=REPO
    )
    return rc or r.returncode


if __name__ == "__main__":
    raise SystemExit(main())
