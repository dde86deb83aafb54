"""Multi-host init certification (VERDICT r3 #7): 2-process
jax.distributed CPU run of parallel/mesh.py::initialize_multihost with a
cross-process psum and a sharded env step (tools/multihost_smoke.py).

Runs real OS processes (~2 min); marked slow.
"""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_two_process_distributed_smoke():
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "multihost_smoke.py")],
        capture_output=True, timeout=600, text=True)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    with open(os.path.join(REPO, "MULTIHOST_SMOKE.json")) as f:
        rec = json.load(f)
    assert rec["ok"] and rec["processes"] == 2
