"""Two-process integration runner over real TCP, spawned from pytest.

VERDICT round-1 item 9: the analog of the reference's registered-test
integration harness (`integration/src/main.rs:101-224`) running in CI.
Party 1 listens, party 0 dials (`network/quic.rs` king-role convention);
both execute the full `ark_mpc_tpu.integration` registry over one socket,
including the malicious-abort cases.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PORT = 9617


def _env():
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""  # disable the axon plugin (stalls)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    return env


def _run_pair(extra, timeout, port):
    cmd = [sys.executable, "-m", "ark_mpc_tpu.integration",
           "--port", str(port), "--quiet"] + extra
    p1 = subprocess.Popen(cmd + ["--party", "1"], env=_env(), cwd=REPO,
                          stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                          text=True)
    try:
        p0 = subprocess.run(cmd + ["--party", "0"], env=_env(), cwd=REPO,
                            capture_output=True, text=True, timeout=timeout)
        out1, err1 = p1.communicate(timeout=120)
    finally:
        if p1.poll() is None:
            p1.kill()
    assert p0.returncode == 0, f"party0 failed:\n{p0.stdout}\n{p0.stderr[-3000:]}"
    assert p1.returncode == 0, f"party1 failed:\n{out1}\n{err1[-3000:]}"
    r0 = json.loads(p0.stdout.strip().splitlines()[-1])
    r1 = json.loads(out1.strip().splitlines()[-1])
    assert r0 == r1
    bad = {k: v for k, v in r0.items() if v != "ok"}
    assert not bad, f"failing integration tests: {bad}"
    return r0


@pytest.mark.slow
def test_lowgear_e2e_over_tcp():
    """The dealer-free LowGear offline -> online flow as a registered
    integration case over the real wire (reference
    `integration/src/lowgear.rs:48-51` test_setup_and_run_circuit)."""
    r = _run_pair(["--tests", "lowgear_dealer_free_e2e"], 1500, PORT + 1)
    assert set(r) == {"lowgear_dealer_free_e2e"}


@pytest.mark.slow  # two-process full registry: the reference's
# integration tier is likewise separate from `cargo test --lib`
def test_integration_registry_over_tcp():
    cmd = [sys.executable, "-m", "ark_mpc_tpu.integration",
           "--port", str(PORT), "--quiet"]
    p1 = subprocess.Popen(cmd + ["--party", "1"], env=_env(), cwd=REPO,
                          stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                          text=True)
    try:
        p0 = subprocess.run(cmd + ["--party", "0"], env=_env(), cwd=REPO,
                            capture_output=True, text=True, timeout=1800)
        out1, err1 = p1.communicate(timeout=120)
    finally:
        if p1.poll() is None:
            p1.kill()

    assert p0.returncode == 0, f"party0 failed:\n{p0.stdout}\n{p0.stderr[-3000:]}"
    assert p1.returncode == 0, f"party1 failed:\n{out1}\n{err1[-3000:]}"
    r0 = json.loads(p0.stdout.strip().splitlines()[-1])
    r1 = json.loads(out1.strip().splitlines()[-1])
    assert r0 == r1
    assert len(r0) >= 15, f"registry shrank: {len(r0)} tests"
    bad = {k: v for k, v in r0.items() if v != "ok"}
    assert not bad, f"failing integration tests: {bad}"
