"""Pre-snapshot gate (round-5, VERDICT r4 item 1): the three hard
driver signals, checked locally BEFORE any end-of-round snapshot so a
stale plan assertion (round 4's red suite) or an oversized bench JSON
line (round 4's unparsed BENCH) can never ship again.

Checks, in order (fail-fast):
  1. ``pytest tests/ -x -q`` exits 0.
  2. ``tools/check_oracles.py`` at sf0.001 passes for every queries()
     entry (full exact DuckDB comparison; sf0.001 keeps it minutes).
  3. bench.py's FINAL stdout line parses as JSON, is <= 1,900 chars
     (driver tail buffer is 2,000), and carries the driver-contract
     keys (metric/value/unit/queries/sf).  Runs the real bench at
     sf0.001 with a single session so the check exercises the actual
     output path, not a mock.

Usage: python tools/preflight.py [--skip-bench] [--sf-dir DIR]
Exit 0 = safe to snapshot.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(title: str, cmd: list[str], env: dict | None = None,
         timeout: int = 3600) -> subprocess.CompletedProcess:
    print(f"== preflight: {title}: {' '.join(cmd)}", flush=True)
    t0 = time.time()
    r = subprocess.run(cmd, cwd=REPO, env=env, timeout=timeout)
    print(f"== preflight: {title}: exit {r.returncode} "
          f"in {time.time() - t0:.0f}s", flush=True)
    if r.returncode != 0:
        print(f"PREFLIGHT FAIL: {title}", flush=True)
        sys.exit(1)
    return r


def main() -> None:
    sf_dir = "/root/testdata/sf0.001"
    if "--sf-dir" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf-dir") + 1]

    _run("pytest", [sys.executable, "-m", "pytest", "tests/", "-x", "-q"])
    _run("oracles", [sys.executable, "tools/check_oracles.py", sf_dir])

    if "--skip-bench" not in sys.argv:
        env = os.environ.copy()
        env.update({
            "SPARK_GRAFT_SF_DIR": sf_dir,
            "SPARK_GRAFT_CPUS": "8",
            "SPARK_GRAFT_SESSIONS": "1",
            "SPARK_GRAFT_WARM": "0",
        })
        print("== preflight: bench parse self-check (sf0.001, 1 session)",
              flush=True)
        r = subprocess.run(
            [sys.executable, "bench.py"], cwd=REPO, env=env,
            capture_output=True, text=True, timeout=3600,
        )
        if r.returncode != 0:
            print(r.stderr[-2000:])
            print("PREFLIGHT FAIL: bench exited nonzero", flush=True)
            sys.exit(1)
        # EXACTLY what the driver does: keep the last 2,000 chars of
        # stdout, parse the final line as JSON.
        tail = r.stdout[-2000:]
        last = tail.strip().splitlines()[-1]
        try:
            head = json.loads(last)
        except json.JSONDecodeError as exc:
            print(f"PREFLIGHT FAIL: final bench line unparseable: {exc}\n"
                  f"line ({len(last)} chars): {last[:300]}...", flush=True)
            sys.exit(1)
        missing = [k for k in ("metric", "value", "unit", "queries", "sf")
                   if k not in head]
        if missing:
            print(f"PREFLIGHT FAIL: headline missing keys {missing}",
                  flush=True)
            sys.exit(1)
        if len(last) > 1900:
            print(f"PREFLIGHT FAIL: final line {len(last)} chars > 1900",
                  flush=True)
            sys.exit(1)
        print(f"== preflight: bench headline OK "
              f"({len(last)} chars, value={head['value']})", flush=True)

    print("PREFLIGHT PASS", flush=True)


if __name__ == "__main__":
    main()
