"""Subprocess body for the multi-device mesh-fabric tests.

Run as `python tests/_mesh_fabric_prog.py N_DEVICES`: creates an
N-device virtual CPU mesh (device count is fixed at backend init, hence
the fresh interpreter), runs the FULL fabric protocol stack on it —
share -> Beaver mul -> masked-open inverse -> folded deferred MAC check —
for both honest parties, then reruns with a corrupted MAC and asserts the
mutual abort.  Prints "MESH_FABRIC_OK <n>" on success.

Reference role: executor parity across device counts
(`fabric/executor/multi_threaded/executor.rs:37-291` runs the same suite
as the serial executor; here the same fabric program must be correct on
any mesh size).
"""

import os
import random
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

n_dev = int(sys.argv[1])

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", n_dev)

from jax.sharding import Mesh

from ark_mpc_tpu import AuthenticationError, Scalar, ScalarShare
from ark_mpc_tpu.algebra.fields import CURVE25519_ORDER as L
from ark_mpc_tpu.fabric.simulator import execute_mock_mpc_dealer

assert len(jax.devices()) == n_dev, jax.devices()
mesh = Mesh(jax.devices(), ("batch",))

n = 2 * n_dev  # divides the mesh
rng = random.Random(500 + n_dev)
xs = [rng.randrange(1, L) for _ in range(n)]
ys = [rng.randrange(1, L) for _ in range(n)]


def honest(fabric):
    sx = fabric.share_values(
        Scalar.from_ints(xs) if fabric.party_id == 0 else None,
        sender=0, n=n)
    sy = fabric.share_values(
        Scalar.from_ints(ys) if fabric.party_id == 1 else None,
        sender=1, n=n)
    p = fabric.mul(sx, sy)
    inv = fabric.inverse(sy, defer_check=True)
    chk = fabric.mul(p, inv)  # == sx
    o1 = fabric.open_authenticated(p, defer=True)
    o2 = fabric.open_authenticated(chk, defer=True)
    fabric.verify_deferred()  # folded psum path (mesh attached)
    return o1.to_ints(), o2.to_ints()


(p0, c0), (p1, c1) = execute_mock_mpc_dealer(honest, mesh=mesh)
want = [(a * b) % L for a, b in zip(xs, ys)]
assert p0 == p1 == want, (p0, want)
assert c0 == c1 == xs, (c0, xs)


def corrupt(fabric):
    sx = fabric.share_values(
        Scalar.from_ints(xs) if fabric.party_id == 0 else None,
        sender=0, n=n)
    if fabric.party_id == 1:
        sx = ScalarShare(sx.share, sx.mac + Scalar.from_ints([1] * n))
    fabric.open_authenticated(sx, defer=True)
    fabric.verify_deferred()
    return True


try:
    execute_mock_mpc_dealer(corrupt, mesh=mesh)
except AuthenticationError:
    pass
else:
    raise SystemExit("corrupted MAC was NOT detected on the mesh")

# unaligned batch: placement must raise, not silently skip sharding
if n_dev > 1:
    def unaligned(fabric):
        fabric.share_values(
            Scalar.from_ints(xs + [1]) if fabric.party_id == 0 else None,
            sender=0, n=n + 1)
        return True

    try:
        execute_mock_mpc_dealer(unaligned, mesh=mesh)
    except ValueError as e:
        assert "mesh" in str(e), e
    else:
        raise SystemExit("unaligned batch did not raise on the mesh")

print(f"MESH_FABRIC_OK {n_dev}")
