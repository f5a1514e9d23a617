"""Multi-chip sharding validation via subprocess (8 virtual CPU devices).

Device count is fixed at backend init, so the sharded step runs in a fresh
interpreter (the same path the driver exercises through
`__graft_entry__.dryrun_multichip`).
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_subprocess():
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""  # disable the axon plugin (stalls)
    env["JAX_PLATFORMS"] = "cpu"
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "__graft_entry__.py"),
         "--dryrun", "8"],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "dryrun_multichip OK" in res.stdout


def test_entry_compiles_single_device():
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "__graft_entry__.py")],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "entry OK" in res.stdout
