"""Multi-process coverage: the 2-process smoke script must pass (it forms
a real jax.distributed runtime over two OS processes — the multi-node
capability of scripts/mpi_combined.sh — via the ACG_* env contract of
parallel/multihost.py)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.timeout(600)
def test_two_process_distributed_solve():
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "multihost_smoke.py")],
        env=env, capture_output=True, text=True, timeout=540)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "MULTIHOST-OK" in r.stdout
