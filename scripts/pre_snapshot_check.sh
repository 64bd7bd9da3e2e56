#!/bin/sh
# Pre-snapshot gate (VERDICT r4 item 6): run before EVERY end-of-round
# commit. Round 4 shipped two regressed driver artifacts that this catches
# in minutes:
#   1. the quick test tier (no model compiles / process spawns), and
#   2. the driver's own multichip dry-run hook (tests/test_graft_entry.py)
#      — slow cold, fast on a warm persistent compile cache.
set -e
cd "$(dirname "$0")/.."
echo "== quick tier =="
python -m pytest tests -m "not slow" -q
echo "== driver hooks (graft entry) =="
python -m pytest tests/test_graft_entry.py -q
echo "pre-snapshot gate: OK"
