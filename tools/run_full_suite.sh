#!/bin/bash
# One green full-suite record (VERDICT r3 #6): every test, fast + slow, in
# a single pass, log committed as docs/test_run_r4.txt.
# CPU-only (tests/conftest.py forces JAX_PLATFORMS=cpu), warm XLA cache
# helps repeat runs. Expect ~45-90 min cold.
set -u -o pipefail
cd /root/repo
OUT=${OUT:-docs/test_run_r5.txt}
{
  echo "# Full test-suite record, round 5"
  echo "# date: $(date -u +%Y-%m-%dT%H:%M:%SZ)"
  echo "# host: $(uname -a)"
  echo "# commit: $(git rev-parse HEAD)"
  echo "# cmd: python -m pytest tests/ -q"
  echo
  python -m pytest tests/ -q 2>&1
  rc=$?
  echo
  echo "# exit: $rc"
  exit $rc
} | tee "$OUT"
exit ${PIPESTATUS[0]}
