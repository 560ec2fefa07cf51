"""Push-button round-close certification (r13 VERDICT item 8): one
command that runs, in order, every check a round must leave green —

  1. the full pytest suite,
  2. the driver-verify replica (tools/driver_sim.py) at sf0.01, a
     schema-stability probe at sf0.001, AND a full replay at sf0.1
     (r14 VERDICT item 4: the config-sweep grid covers sf0.1
     hash-equality, but the sim's entry-smoke + journal path is one
     more latent-flap net at the bench SF — skippable with --quick),
  3. the partitioning-robustness grid (tools/config_sweep.py:
     every oracle-backed entry x sf{0.001,0.01} x shuffle_partitions
     {4,32}) plus the bench-SF cell (sf0.1 x 32 — the axis that
     surfaced six latent scale-dependent parity flaps in r14),
  4. an EXCLUSIVE bench run (bench.py at $SPARK_GRAFT_SF_DIR, which
     already records min-of-2 per row into bench_full.json) — skipped
     with --no-bench when the host is not quiet.

Each stage runs as a subprocess so one stage's Spark session/config
cannot leak into the next (the sweep mutates shuffle_partitions; the
bench wants a cold exclusive JVM). Stops at the first failing stage
with that stage's exit code. Prints a one-line PASS/FAIL summary per
stage and a final verdict.

Usage: python tools/round_close.py [--no-bench] [--quick]
  --quick   skips the sweep's sf0.001 half (keeps sf0.01 x {4,32})
            and the driver_sim sf0.1 replay
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

# Every stage command below is repo-root-relative ('tests/', 'bench.py',
# 'tools/driver_sim.py'), so anchor the subprocess cwd at the repo root
# instead of inheriting the caller's — running the certification from
# anywhere must behave identically (ADVICE r14: same failure class as
# the r13 CWD-relative glob in test_registry_counts.py).
REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

STAGES = [
    ("pytest", [sys.executable, "-m", "pytest", "tests/", "-q"]),
    ("driver_sim sf0.01", [sys.executable, "tools/driver_sim.py"]),
    (
        "driver_sim sf0.001",
        [sys.executable, "tools/driver_sim.py", "/root/testdata/sf0.001"],
    ),
]


def main() -> None:
    args = set(sys.argv[1:])
    sweep_dirs = (
        "/root/testdata/sf0.01"
        if "--quick" in args
        else "/root/testdata/sf0.001,/root/testdata/sf0.01"
    )
    stages = list(STAGES)
    if "--quick" not in args:
        # full replay at the bench SF (r14 VERDICT item 4) — entry
        # smoke + per-entry journal at the scale that surfaced the six
        # latent float-parity flaps; ~15 min
        stages.append((
            "driver_sim sf0.1",
            [sys.executable, "tools/driver_sim.py", "/root/testdata/sf0.1"],
        ))
    stages += [
        (
            "config_sweep",
            [
                sys.executable,
                "tools/config_sweep.py",
                f"--sf-dirs={sweep_dirs}",
                "--partitions=4,32",
            ],
        ),
        # the bench-SF cell (r14): the sweep axis that surfaced six
        # latent scale-dependent float-parity flaps the sf0.01 gate
        # could never hit — one cell at 32 partitions (~15 min)
        (
            "config_sweep sf0.1",
            [
                sys.executable,
                "tools/config_sweep.py",
                "--sf-dirs=/root/testdata/sf0.1",
                "--partitions=32",
            ],
        ),
    ]
    if "--no-bench" not in args:
        stages.append(("bench (exclusive)", [sys.executable, "bench.py"]))

    results = []
    for name, cmd in stages:
        t0 = time.time()
        print(f"=== {name}: {' '.join(cmd)}", flush=True)
        rc = subprocess.call(cmd, cwd=REPO_ROOT)
        dt = time.time() - t0
        status = "PASS" if rc == 0 else f"FAIL (exit {rc})"
        results.append((name, status, dt))
        print(f"=== {name}: {status} in {dt:.0f}s", flush=True)
        if rc != 0:
            break

    print("\n--- round-close summary ---")
    for name, status, dt in results:
        print(f"{name:24s} {status:12s} {dt:7.0f}s")
    ok = all(s == "PASS" for _, s, _ in results) and len(results) == len(stages)
    print("ROUND-CLOSE:", "GREEN" if ok else "RED")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
