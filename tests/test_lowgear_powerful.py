"""Dealer-free LowGear on the PRODUCTION ring code path.

Same end-to-end flow as test_lowgear_full_bgv, but the BGV pipeline runs on
a `PowerfulRing` (powerful-basis / eval-form double-CRT, word-form ZKPoK at
2^-64 soundness, drowning sec 128) — the same code that runs at m = 118965,
exercised at m = 35 so CI stays fast.  Reference analog: the whole
`offline-phase/src/lowgear/` flow over MP-SPDZ BGV at production security.
"""

import random

import numpy as np
import pytest

from ark_mpc_tpu import MpcFabric, Scalar
from ark_mpc_tpu.algebra.fields import CURVE25519_ORDER as L
from ark_mpc_tpu.fabric.simulator import execute_mock_mpc
from ark_mpc_tpu.offline.bgv.powerful import PowerfulRing
from ark_mpc_tpu.offline.lowgear.core import LowGear
from ark_mpc_tpu.offline.structs import OfflineSizingParams

rng = random.Random(201)


def _run_e2e(make_ring):
    sizing = OfflineSizingParams(
        num_triples=4, num_inverse_pairs=2, num_bits=2,
        num_randomness=4, num_input_masks=4,
    )
    x = [rng.randrange(L) for _ in range(2)]
    y = [rng.randrange(L) for _ in range(2)]

    def prog(fabric):
        pid = fabric.party_id
        lg = LowGear(pid, fabric.transport, mode="bgv", ring=make_ring(),
                     allow_insecure_ring=True,
                     rng=np.random.default_rng(80 + pid))
        lg.run_offline_phase(sizing)
        prep = lg.get_offline_result()

        online = MpcFabric(pid, fabric.transport, prep,
                           rng=np.random.default_rng(90 + pid))
        sx = online.share_values(
            Scalar.from_ints(x) if pid == 0 else None, sender=0, n=2)
        sy = online.share_values(
            Scalar.from_ints(y) if pid == 1 else None, sender=1, n=2)
        sz = online.mul(sx, sy)
        zv = online.open_authenticated(sz, defer=True)
        online.verify_deferred()
        return zv.to_ints()

    z0, z1 = execute_mock_mpc(prog)
    want = [(a * b) % L for a, b in zip(x, y)]
    assert z0 == z1 == want


@pytest.mark.slow  # ~5 min of CPU jit compiles even at m=35
def test_lowgear_on_powerful_ring():
    _run_e2e(lambda: PowerfulRing(35))


@pytest.mark.slow
def test_lowgear_on_medium_ring():
    from ark_mpc_tpu.offline.bgv.bgv_l import medium_ring

    _run_e2e(medium_ring)
