"""Fully dealer-free LowGear: run_offline_phase(mode="bgv") end-to-end.

Every store — triples (pair-sacrificed), inverse tuples, bits, randomness,
input masks — is produced by the BGV-over-l pipeline; the online fabric
then shares real inputs through the masks and Beaver-multiplies them."""

import random

import numpy as np

from ark_mpc_tpu import MpcFabric, Scalar
from ark_mpc_tpu.algebra.fields import CURVE25519_ORDER as L
from ark_mpc_tpu.fabric.simulator import execute_mock_mpc
from ark_mpc_tpu.offline.lowgear.core import LowGear
from ark_mpc_tpu.offline.structs import OfflineSizingParams

import pytest

pytestmark = pytest.mark.slow  # full BGV/ZK pipeline: minutes on CPU

rng = random.Random(101)


def test_full_bgv_offline_then_online():
    sizing = OfflineSizingParams(
        num_triples=8, num_inverse_pairs=2, num_bits=2,
        num_randomness=4, num_input_masks=45,  # > the toy ring's 40 slots:
    )                                          # exercises mask chunking
    x = [rng.randrange(L) for _ in range(2)]
    y = [rng.randrange(L) for _ in range(2)]

    def prog(fabric):
        pid = fabric.party_id
        from ark_mpc_tpu.offline.bgv.bgv_l import default_ring

        lg = LowGear(pid, fabric.transport, mode="bgv",
                     ring=default_ring(), allow_insecure_ring=True,
                     rng=np.random.default_rng(40 + pid))
        lg.run_offline_phase(sizing)
        prep = lg.get_offline_result()

        online = MpcFabric(pid, fabric.transport, prep,
                           rng=np.random.default_rng(50 + pid))
        sx = online.share_values(
            Scalar.from_ints(x) if pid == 0 else None, sender=0, n=2)
        sy = online.share_values(
            Scalar.from_ints(y) if pid == 1 else None, sender=1, n=2)
        sz = online.mul(sx, sy)
        zv = online.open_authenticated(sz, defer=True)
        bits = online.random_shared_bits(2)
        bv = online.open_authenticated(bits, defer=True)
        r, r_inv = online.random_inverse_pairs(2)
        prod = online.mul(r, r_inv)
        pv = online.open_authenticated(prod, defer=True)
        online.verify_deferred()
        return zv.to_ints(), bv.to_ints(), pv.to_ints()

    (z0, b0, p0), (z1, b1, p1) = execute_mock_mpc(prog)
    want = [(a * b) % L for a, b in zip(x, y)]
    assert z0 == z1 == want
    assert b0 == b1 and all(v in (0, 1) for v in b0)
    assert p0 == p1 == [1, 1]
