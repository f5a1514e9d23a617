"""Subprocess compile checks split from tests/test_multichip.py for
xdist worker balance (--dist loadfile schedules whole modules; the entry
compile + multi-device mesh runs are worker-dominating)."""

import os
import subprocess
import sys

import pytest

from tests.test_multichip import REPO, _cpu_env

@pytest.mark.parametrize("n_dev", [
    2,
    pytest.param(4, marks=pytest.mark.slow),
    pytest.param(8, marks=pytest.mark.slow),
])
def test_mesh_fabric_multi_device(n_dev):
    """The FULL fabric (share -> mul -> inverse -> folded deferred check,
    honest + corrupted-MAC + unaligned-batch raise) on real 2/4/8-device
    virtual CPU meshes (VERDICT r2 item 6).  Fresh interpreter per size:
    device count is fixed at backend init."""
    env = _cpu_env()
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "tests", "_mesh_fabric_prog.py"),
         str(n_dev)],
        capture_output=True, text=True, timeout=900, env=env, cwd=REPO,
    )
    assert res.returncode == 0, (res.stderr[-2000:], res.stdout[-500:])
    assert f"MESH_FABRIC_OK {n_dev}" in res.stdout




def test_entry_compiles_single_device():
    env = _cpu_env()
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "__graft_entry__.py")],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "entry OK" in res.stdout
