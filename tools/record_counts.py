#!/usr/bin/env python3
"""Measure the ScalaTest suite/test counts AT the current HEAD and emit
them as JSON — the round record's counts must come from this output
byte-for-byte, never hand-copied (VERDICT r11 "What's wrong" #3: a
committed record claimed counts measured at a different HEAD).

Runs the full `sbt -batch test`, parses the aggregate summary lines,
and writes target/test_counts.json:

  {"head": "<sha>", "dirty": false, "exit": 0,
   "suites_completed": N, "suites_aborted": N,
   "tests_succeeded": N, "tests_failed": N, "ran_at": "..."}

`dirty` true means the worktree differs from HEAD — the counts then
describe the worktree, NOT the commit, and must not be pasted into a
record for that sha.

Usage: python3 tools/record_counts.py [--out target/test_counts.json]
"""
import datetime
import json
import re
import subprocess
import sys


def main():
    out_path = "target/test_counts.json"
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]
    head = subprocess.run(["git", "rev-parse", "HEAD"],
                          capture_output=True, text=True).stdout.strip()
    dirty = subprocess.run(["git", "status", "--porcelain"],
                           capture_output=True, text=True).stdout.strip() != ""
    p = subprocess.run(["sbt", "-batch", "test"],
                       capture_output=True, text=True)
    suites = re.search(r"Suites: completed (\d+), aborted (\d+)", p.stdout)
    tests = re.search(
        r"Tests: succeeded (\d+), failed (\d+), canceled (\d+), ignored (\d+)",
        p.stdout)
    rec = {
        "head": head,
        "dirty": dirty,
        "exit": p.returncode,
        "suites_completed": int(suites.group(1)) if suites else None,
        "suites_aborted": int(suites.group(2)) if suites else None,
        "tests_succeeded": int(tests.group(1)) if tests else None,
        "tests_failed": int(tests.group(2)) if tests else None,
        "ran_at": datetime.datetime.now(datetime.timezone.utc)
                  .isoformat(timespec="seconds"),
    }
    with open(out_path, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))
    if p.returncode != 0:
        tail = "\n".join(p.stdout.splitlines()[-30:])
        print(tail, file=sys.stderr)
    sys.exit(0 if p.returncode == 0 else 1)


if __name__ == "__main__":
    main()
