"""Multi-chip sharding validation via subprocess (8 virtual CPU devices).

Device count is fixed at backend init, so the sharded step runs in a fresh
interpreter (the same path the driver exercises through
`__graft_entry__.dryrun_multichip`).
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cpu_env():
    """Subprocess env: CPU backend + the SAME persistent XLA compile cache
    the suite uses (tests/conftest.py) — without it every subprocess test
    repays its full LLVM compile set on every run."""
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""  # disable the axon plugin (stalls)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(REPO, "tests",
                                                    ".jax_cache")
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0.5"
    env["JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES"] = "-1"
    return env


def test_dryrun_multichip_subprocess():
    env = _cpu_env()
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "__graft_entry__.py"),
         "--dryrun", "8"],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "dryrun_multichip OK" in res.stdout
    # the offline stage (sharded (U, L, phi) ciphertext-stack ct x pt
    # product, decrypt-verified) must have executed over the whole mesh
    assert "offline ct*pt stack sharded over 8 devices OK" in res.stdout


import pytest


def test_mesh_fabric_in_process():
    """The mesh-attached fabric end-to-end on a 1-device mesh (same code
    path as N devices: placement, separate d/e exchange, folded deferred
    MAC check with public-coin RLC + psum fold)."""
    import random

    import jax
    from jax.sharding import Mesh

    from ark_mpc_tpu import Scalar
    from ark_mpc_tpu.algebra.fields import CURVE25519_ORDER as L
    from ark_mpc_tpu.fabric.simulator import execute_mock_mpc_dealer

    mesh = Mesh(jax.devices()[:1], ("batch",))
    rng = random.Random(31)
    xs = [rng.randrange(1, L) for _ in range(8)]
    ys = [rng.randrange(1, L) for _ in range(8)]

    def prog(fabric):
        sx = fabric.share_values(
            Scalar.from_ints(xs) if fabric.party_id == 0 else None,
            sender=0, n=8)
        sy = fabric.share_values(
            Scalar.from_ints(ys) if fabric.party_id == 1 else None,
            sender=1, n=8)
        p = fabric.mul(sx, sy)
        inv = fabric.inverse(sy, defer_check=True)
        chk = fabric.mul(p, inv)  # == sx
        o1 = fabric.open_authenticated(p, defer=True)
        o2 = fabric.open_authenticated(chk, defer=True)
        fabric.verify_deferred()  # folded (mesh attached)
        return o1.to_ints(), o2.to_ints()

    (p0, c0), (p1, c1) = execute_mock_mpc_dealer(prog, mesh=mesh)
    want_p = [(a * b) % L for a, b in zip(xs, ys)]
    assert p0 == p1 == want_p
    assert c0 == c1 == xs


def test_folded_deferred_check_rejects_bad_mac():
    """The public-coin RLC fold must still catch a corrupted MAC."""
    import random

    import pytest

    from ark_mpc_tpu import AuthenticationError, Scalar, ScalarShare
    from ark_mpc_tpu.algebra.fields import CURVE25519_ORDER as L
    from ark_mpc_tpu.fabric.simulator import execute_mock_mpc_dealer

    rng = random.Random(32)
    xs = [rng.randrange(1, L) for _ in range(4)]

    def prog(fabric):
        sx = fabric.share_values(
            Scalar.from_ints(xs) if fabric.party_id == 0 else None,
            sender=0, n=4)
        if fabric.party_id == 1:
            sx = ScalarShare(sx.share, sx.mac + Scalar.from_ints([1] * 4))
        fabric.open_authenticated(sx, defer=True)
        fabric.verify_deferred(fold=True)
        return True

    with pytest.raises(AuthenticationError):
        execute_mock_mpc_dealer(prog)


def test_folded_deferred_check_no_mesh():
    """fold=True without a mesh: single-device RLC fold + O(1) check."""
    import random

    from ark_mpc_tpu import Scalar
    from ark_mpc_tpu.algebra.fields import CURVE25519_ORDER as L
    from ark_mpc_tpu.fabric.simulator import execute_mock_mpc_dealer

    rng = random.Random(33)
    xs = [rng.randrange(1, L) for _ in range(6)]
    ys = [rng.randrange(1, L) for _ in range(6)]

    def prog(fabric):
        sx = fabric.share_values(
            Scalar.from_ints(xs) if fabric.party_id == 0 else None,
            sender=0, n=6)
        sy = fabric.share_values(
            Scalar.from_ints(ys) if fabric.party_id == 1 else None,
            sender=1, n=6)
        o = fabric.open_authenticated(fabric.mul(sx, sy), defer=True)
        fabric.verify_deferred(fold=True)
        return o.to_ints()

    r0, r1 = execute_mock_mpc_dealer(prog)
    assert r0 == r1 == [(a * b) % L for a, b in zip(xs, ys)]
