#!/bin/bash
# Run the test suite one file per process.  A single `pytest tests/` run
# occasionally dies with a segfault inside XLA's CPU compiler (observed
# twice at tests/test_fuzz.py::test_fuzz_decode_block's mutated-geometry
# compiles, with plenty of free RAM; the same file passes deterministically
# in isolation) — per-file processes sidestep the flake and bound each
# process's compile-cache footprint.
set -u
fail=0
for f in tests/test_*.py; do
  log="/tmp/suite_$(basename "$f").log"
  python -m pytest "$f" -x -q > "$log" 2>&1
  rc=$?
  tailline=$(grep -E "passed|failed|error" "$log" | tail -1)
  echo "$f: rc=$rc  $tailline"
  [ $rc -ne 0 ] && fail=1
done
echo "SUITE_DONE fail=$fail"
exit $fail
