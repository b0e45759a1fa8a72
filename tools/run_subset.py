#!/usr/bin/env python3
"""Check a SUBSET of queries from an existing Verify out dir against
their oracles — same compare as check_oracle.py but filtered by name,
for fast iteration on new queries.

Usage: python3 tools/run_subset.py <sfDir> <verifyOutDir> <name> [name...]
"""
import sys
import json
import subprocess

names = sys.argv[3:]
out = json.load(open(f"{sys.argv[2]}/oracle_sql.json"))
sub = {k: v for k, v in out.items() if k in names}
json.dump(sub, open(f"{sys.argv[2]}/oracle_sql.json", "w"))
try:
    rc = subprocess.run([sys.executable, "tools/check_oracle.py",
                         sys.argv[1], sys.argv[2]]).returncode
finally:
    json.dump(out, open(f"{sys.argv[2]}/oracle_sql.json", "w"), indent=1)
sys.exit(rc)
