#!/usr/bin/env python
"""Full-suite runner with per-file process isolation for the slow tier.

Why this exists (round-4 VERDICT item 3): the slow tier compiles huge
interpret-mode fused-kernel programs; accumulated XLA CPU executables in
ONE pytest process eventually push the compiler into SIGABRT (observed in
test_parallel at the tail of single-process full-suite runs).  The robust
fix is process isolation, not in-process cache accounting: this runner
executes

  1. the fast tier (`-m "not slow"`) in one pytest process (the normal
     dev loop, ~2.5 min on the reference box), then
  2. each test FILE that contains slow-marked tests in its OWN pytest
     subprocess (`-m slow`), discovered dynamically so renames can't
     silently drop a file.

Usage:
    python tests/run_suite.py              # fast tier + isolated slow tier
    python tests/run_suite.py --slow-only  # just the isolated slow tier
    python tests/run_suite.py --fast-only  # just the fast tier
    python tests/run_suite.py -j 2         # run 2 slow shards concurrently
                                           # (XLA compiles are multi-core;
                                           # >1 oversubscribes — timing runs
                                           # should use the default 1)

Exit status is nonzero if any phase fails.  Per-shard wall times are
printed so the documented suite runtimes stay measured, not guessed.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time

TESTS_DIR = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(TESTS_DIR)


def _run(args: list[str]) -> tuple[int, float]:
    t0 = time.perf_counter()
    rc = subprocess.call([sys.executable, "-m", "pytest", *args], cwd=REPO)
    return rc, time.perf_counter() - t0


def _slow_files() -> list[str]:
    """Discover test files containing slow-marked tests (collect-only)."""
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "-q", "-m", "slow",
         "--collect-only", "-p", "no:cacheprovider"],
        cwd=REPO, capture_output=True, text=True,
    )
    files: dict[str, None] = {}
    for line in out.stdout.splitlines():
        if "::" in line:
            files.setdefault(line.split("::")[0].strip(), None)
    if not files:
        print(out.stdout[-2000:], file=sys.stderr)
        raise SystemExit("slow-tier collection found no tests — collection broke?")
    return list(files)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast-only", action="store_true")
    ap.add_argument("--slow-only", action="store_true")
    ap.add_argument("-j", "--jobs", type=int, default=1,
                    help="concurrent slow shards (default 1; each shard's "
                    "XLA compiles already use all cores)")
    ap.add_argument("extra", nargs="*", help="extra pytest args (e.g. -x)")
    opts = ap.parse_args()

    failures: list[str] = []
    t_start = time.perf_counter()

    if not opts.slow_only:
        print("== fast tier (one process) ==", flush=True)
        rc, dt = _run(["tests/", "-q", "-m", "not slow", *opts.extra])
        print(f"== fast tier: rc={rc} in {dt/60:.1f} min ==", flush=True)
        if rc:
            failures.append("fast-tier")

    if not opts.fast_only:
        shards = _slow_files()
        print(f"== slow tier: {len(shards)} isolated shards ==", flush=True)
        running: list[tuple[str, subprocess.Popen, float]] = []
        pending = list(shards)

        def reap(block: bool) -> None:
            for i, (name, proc, t0) in enumerate(running):
                rc = proc.wait() if block else proc.poll()
                if rc is None:
                    continue
                dt = time.perf_counter() - t0
                print(f"== {name}: rc={rc} in {dt/60:.1f} min ==", flush=True)
                if rc:
                    failures.append(name)
                running.pop(i)
                return

        while pending or running:
            while pending and len(running) < opts.jobs:
                shard = pending.pop(0)
                print(f"-- starting {shard} (slow tests, own process)", flush=True)
                proc = subprocess.Popen(
                    [sys.executable, "-m", "pytest", shard, "-q", "-m", "slow",
                     *opts.extra],
                    cwd=REPO,
                )
                running.append((shard, proc, time.perf_counter()))
            reap(block=True)

    total = time.perf_counter() - t_start
    print(f"== suite total: {total/60:.1f} min, "
          f"{'FAIL: ' + ', '.join(failures) if failures else 'all green'} ==")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
