#!/usr/bin/env python
"""Abort-window-resilient test-suite runner (VERDICT r4 #2).

This VM occasionally enters a window (~20 min, sometimes longer) where
XLA:CPU executables abort/segfault at execute or during persistent-cache
get/put while the same tests pass standalone (CLAUDE.md "Environment
gotchas"; round-4 judge lost 5/5 full-suite runs to it, including one with
the compilation cache disabled).  pytest itself has no recovery from a
hard SIGABRT/SIGSEGV — the whole process dies mid-suite.

This runner restores "the suite is green" as a statement that can be made:

* shards the suite into sequential pytest subprocess groups (small blast
  radius, never two pytest processes at once — they share
  tests/.jax_test_cache and concurrent writes corrupt it);
* detects the crash signature (SIGABRT/SIGSEGV rc, or "Fatal Python
  error" in output) and distinguishes it from real test failures;
* captures a crash record — cache mode, last test position, faulthandler
  trace tail — to tests/.suite_crashes/ so the diagnosis can be pinned
  down across occurrences (the round-4 open question: one cache-DISABLED
  run crashed too, straining the "cache-loaded executables only" theory);
* retries the crashed group: first immediately with
  JAX_ENABLE_COMPILATION_CACHE=false (fresh compiles passed during every
  observed window), then after a backoff with the cache re-enabled, then a
  final cache-off attempt — real test FAILURES are never retried;
* prints a wall-time + outcome summary and writes suite_summary.json.

Usage:
  python script/run_suite.py                 # full suite
  python script/run_suite.py -m "not heavy"  # fast profile
  python script/run_suite.py --group-size 1  # one process per file
  python script/run_suite.py tests/test_rl.py tests/test_moe.py
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CRASH_DIR = os.path.join(REPO, "tests", ".suite_crashes")
SUMMARY = os.path.join(REPO, "tests", "suite_summary.json")

CRASH_RE = re.compile(
    r"Fatal Python error|Segmentation fault|Aborted \(core dumped\)")
# with -v, each finished test prints "tests/test_x.py::test_y PASSED"; the
# crash is in the test AFTER the last finished one
FILE_LINE_RE = re.compile(r"^(tests/[\w/]+\.py::\w+(?:\[[^\]]*\])?)", re.M)
# faulthandler "Current thread" dump names the crashing frame
CURRENT_RE = re.compile(r"Current thread.*?(?=\n\n|\Z)", re.S)


def is_crash(rc: int, out: str) -> bool:
    if rc < 0 and (-rc) in (signal.SIGABRT, signal.SIGSEGV, signal.SIGBUS):
        return True
    if rc in (134, 139, 135):
        return True
    return rc != 0 and bool(CRASH_RE.search(out))


def run_group(files, extra, cache_enabled: bool, timeout: int):
    env = dict(os.environ)
    env["PYTHONFAULTHANDLER"] = "1"
    env["JAX_ENABLE_COMPILATION_CACHE"] = "true" if cache_enabled else "false"
    # -v so crash logs can name the last finished test (the -q dot stream
    # carries no positions); the verbose stream is captured, never printed
    cmd = [sys.executable, "-m", "pytest", "-v", *extra, *files]
    t0 = time.monotonic()
    try:
        p = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                           text=True, timeout=timeout)
        rc, out = p.returncode, p.stdout + "\n" + p.stderr
    except subprocess.TimeoutExpired as e:
        rc = -signal.SIGKILL
        out = ((e.stdout or b"").decode(errors="replace")
               + "\n" + (e.stderr or b"").decode(errors="replace")
               + f"\n<runner: group timed out after {timeout}s>")
    return rc, out, time.monotonic() - t0


def record_crash(group_id, attempt, cache_enabled, rc, out):
    os.makedirs(CRASH_DIR, exist_ok=True)
    pos = FILE_LINE_RE.findall(out)
    trace = CURRENT_RE.search(out)
    path = os.path.join(
        CRASH_DIR, f"{time.strftime('%Y%m%d_%H%M%S')}_{group_id}_a{attempt}.log")
    with open(path, "w") as f:
        f.write(json.dumps({
            "group": group_id,
            "attempt": attempt,
            "cache_enabled": cache_enabled,
            "rc": rc,
            "last_test_finished": pos[-1] if pos else None,
            "ts": time.time(),
        }, indent=2))
        f.write("\n\n--- faulthandler current thread ---\n")
        f.write(trace.group(0) if trace else "<no faulthandler dump captured>")
        f.write("\n\n--- output tail ---\n")
        f.write(out[-8000:])
    return path


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("files", nargs="*", help="test files (default: tests/test_*.py)")
    ap.add_argument("-m", dest="marker", default=None, help="pytest -m expression")
    ap.add_argument("--group-size", type=int, default=3,
                    help="test files per pytest process (default 3)")
    ap.add_argument("--backoff", type=int, default=int(os.environ.get("RUN_SUITE_BACKOFF", "300")),
                    help="seconds to wait before the post-crash retry (default 300)")
    ap.add_argument("--timeout", type=int, default=2400,
                    help="per-group wall timeout in seconds")
    ap.add_argument("--retries", type=int, default=3,
                    help="max retries per crashed group (default 3: cache-off, "
                         "backoff+cache-on, cache-off)")
    ap.add_argument("--save-logs", action="store_true",
                    help="save each group's full pytest output to tests/.suite_logs/")
    args, passthru = ap.parse_known_args()

    files = args.files or sorted(
        os.path.relpath(f, REPO)
        for f in glob.glob(os.path.join(REPO, "tests", "test_*.py")))
    extra = list(passthru)
    if args.marker:
        extra += ["-m", args.marker]

    groups = [files[i:i + args.group_size]
              for i in range(0, len(files), args.group_size)]
    t_start = time.monotonic()
    results = []
    any_fail = any_crash_unresolved = False

    for gi, group in enumerate(groups):
        gid = f"g{gi:02d}"
        label = ",".join(os.path.basename(f) for f in group)
        # retry ladder: (cache_enabled, pre-sleep)
        ladder = [(True, 0), (False, 0), (True, args.backoff), (False, 0)]
        ladder = ladder[: 1 + args.retries]
        outcome = None
        for attempt, (cache_on, pre_sleep) in enumerate(ladder):
            if pre_sleep:
                print(f"[{gid}] backoff {pre_sleep}s before retry "
                      f"(abort window may pass)...", flush=True)
                time.sleep(pre_sleep)
            rc, out, dt = run_group(group, extra, cache_on, args.timeout)
            if args.save_logs:
                os.makedirs(os.path.join(REPO, "tests", ".suite_logs"), exist_ok=True)
                with open(os.path.join(REPO, "tests", ".suite_logs",
                                       f"{gid}_a{attempt}.log"), "w") as f:
                    f.write(out)
            if rc == 0:
                outcome = {"status": "pass", "attempts": attempt + 1, "secs": round(dt, 1)}
                break
            if rc == 5:  # no tests collected (marker filtered everything)
                outcome = {"status": "empty", "attempts": attempt + 1, "secs": round(dt, 1)}
                break
            if is_crash(rc, out):
                path = record_crash(gid, attempt, cache_on, rc, out)
                print(f"[{gid}] CRASH (rc={rc}, cache={'on' if cache_on else 'off'}) "
                      f"-> {os.path.relpath(path, REPO)}", flush=True)
                outcome = {"status": "crash", "attempts": attempt + 1,
                           "secs": round(dt, 1), "crash_log": path}
                continue  # next rung of the ladder
            # real test failure: report and stop retrying this group
            tail = "\n".join(out.strip().splitlines()[-15:])
            print(f"[{gid}] FAIL (rc={rc}):\n{tail}", flush=True)
            outcome = {"status": "fail", "attempts": attempt + 1, "secs": round(dt, 1)}
            break
        status = outcome["status"]
        if status == "fail":
            any_fail = True
        elif status == "crash":
            any_crash_unresolved = True
        print(f"[{gid}] {status.upper():5s} {outcome['secs']:7.1f}s  {label}",
              flush=True)
        results.append({"group": gid, "files": group, **outcome})

    wall = time.monotonic() - t_start
    summary = {
        "wall_secs": round(wall, 1),
        "groups": len(groups),
        "pass": sum(r["status"] == "pass" for r in results),
        "fail": sum(r["status"] == "fail" for r in results),
        "crash_unresolved": sum(r["status"] == "crash" for r in results),
        "retried": sum(r["attempts"] > 1 for r in results),
        "results": results,
    }
    with open(SUMMARY, "w") as f:
        json.dump(summary, f, indent=2)
    print(f"\nsuite: {summary['pass']}/{len(groups)} groups green, "
          f"{summary['fail']} failed, {summary['crash_unresolved']} crashed-unresolved, "
          f"{summary['retried']} needed retries, wall {wall/60:.1f} min "
          f"-> {os.path.relpath(SUMMARY, REPO)}", flush=True)
    return 1 if (any_fail or any_crash_unresolved) else 0


if __name__ == "__main__":
    sys.exit(main())
