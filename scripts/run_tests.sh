#!/usr/bin/env bash
# Per-file test runner with one retry per file.
#
# XLA:CPU's in-process JIT segfaults intermittently in this image (the crash
# probability grows with the number of compiles per process; see
# tests/conftest.py for the related persistent-cache note). Running each test
# file in its own process bounds compiler state, and one retry absorbs the
# rare crash. A file failing twice is a real failure.
set -u
cd "$(dirname "$0")/.."
fail=0
# Optional CPU-yield gate: with YIELD_WHILE=<file> set, pause between test
# files while <file> exists (one CPU core — don't starve a TPU measurement
# pass that just got the tunnel; see CLAUDE.md).
gate() {
  [ -n "${YIELD_WHILE:-}" ] || return 0
  while [ -e "$YIELD_WHILE" ]; do sleep 60; done
}
for f in tests/test_*.py; do
  gate
  for attempt in 1 2; do
    python -m pytest "$f" -q --no-header -p no:cacheprovider
    code=$?
    if [ $code -eq 0 ]; then
      break
    fi
    if [ $attempt -eq 2 ]; then
      echo "FAILED twice: $f (exit $code)"
      fail=1
    else
      echo "retrying $f (exit $code)..."
    fi
  done
done
exit $fail
