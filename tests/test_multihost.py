"""Multi-host init certification (VERDICT r3 #7): multi-process
jax.distributed CPU run of parallel/mesh.py::initialize_multihost with a
cross-process psum and a sharded env step (tools/multihost_smoke.py).

Runs real OS processes (~2 min); marked slow.  Writes its artifact to a
tmp path — the tracked MULTIHOST_SMOKE.json belongs to the tool run, the
suite must leave the work tree clean (VERDICT r4 weak #7).
"""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_two_process_distributed_smoke(tmp_path):
    out = tmp_path / "multihost_smoke.json"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "multihost_smoke.py"),
         "--nproc", "2", "--out", str(out)],
        capture_output=True, timeout=600, text=True)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    rec = json.loads(out.read_text())
    assert rec["ok"] and rec["processes"] == 2
    assert 0.0 <= rec["collective_overhead_fraction"] < 1.0
