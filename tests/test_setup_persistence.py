"""LowGear setup persistence: `get_setup_params` / `from_setup_params`.

Mirrors the reference's reconnect-between-phases flow
(`lowgear/mod.rs:92-127`, used at `integration/src/lowgear.rs:19-24`): a
party runs the key exchange once, serializes the setup state, then rebuilds
a `LowGear` over a FRESH transport (no second key exchange) and generates
triples whose MACs verify cross-party under the persisted MAC key.
"""

import numpy as np
import pytest

from ark_mpc_tpu.algebra.fields import CURVE25519_ORDER as L
from ark_mpc_tpu.fabric.simulator import execute_mock_mpc
from ark_mpc_tpu.offline.lowgear.core import LowGear


@pytest.mark.slow
def test_setup_roundtrip_and_resume():
    def prog(fabric):
        pid = fabric.party_id
        from ark_mpc_tpu.offline.bgv.bgv_l import default_ring

        lg = LowGear(pid, fabric.transport, mode="bgv",
                     ring=default_ring(), allow_insecure_ring=True,
                     rng=np.random.default_rng(80 + pid))
        blob = lg.get_setup_params()
        assert isinstance(blob, bytes) and len(blob) > 0

        # "fresh transport": the same lockstep channel stands in for a
        # reconnected network — the point is that NO key-exchange messages
        # flow during reconstruction (the lockstep transport would deadlock
        # if only one party tried to exchange).
        lg2 = LowGear.from_setup_params(
            pid, fabric.transport, blob, allow_insecure_ring=True,
            rng=np.random.default_rng(90 + pid))

        assert lg2.ring.m == lg.ring.m
        assert lg2.ring.q_primes == lg.ring.q_primes
        assert lg2.mac_key_share.to_int() == lg.mac_key_share.to_int()

        lg2.generate_triples(lg2.ring.slots)
        a, b, c = lg2.prep.triples.take(len(lg2.prep.triples))
        return (lg2.mac_key_share.to_int(),
                [s.to_ints() for s in (a.share, a.mac)],
                [s.to_ints() for s in (b.share, b.mac)],
                [s.to_ints() for s in (c.share, c.mac)])

    (k0, a0, b0, c0), (k1, a1, b1, c1) = execute_mock_mpc(prog)
    key = (k0 + k1) % L
    for (s0, m0), (s1, m1) in ((a0, a1), (b0, b1), (c0, c1)):
        for v0, v1, mm0, mm1 in zip(s0, s1, m0, m1):
            assert (mm0 + mm1) % L == key * ((v0 + v1) % L) % L
    # the triples themselves multiply correctly
    for va, vb, vc in zip(
            [(x + y) % L for x, y in zip(a0[0], a1[0])],
            [(x + y) % L for x, y in zip(b0[0], b1[0])],
            [(x + y) % L for x, y in zip(c0[0], c1[0])]):
        assert (va * vb) % L == vc


@pytest.mark.slow
def test_powerful_ring_setup_roundtrip():
    """PowerfulRing reconstruction path (production ring class) — metadata
    and RNS basis survive the byte round trip."""
    from ark_mpc_tpu.offline.bgv.bgv_l import medium_ring

    ring = medium_ring()

    def prog(fabric):
        pid = fabric.party_id
        lg = LowGear(pid, fabric.transport, mode="bgv", ring=ring,
                     allow_insecure_ring=True,
                     rng=np.random.default_rng(180 + pid))
        blob = lg.get_setup_params()
        lg2 = LowGear.from_setup_params(
            pid, fabric.transport, blob, allow_insecure_ring=True,
            rng=np.random.default_rng(190 + pid))
        assert type(lg2.ring).__name__ == "PowerfulRing"
        assert lg2.ring.m == ring.m
        assert list(lg2.ring.q_primes) == list(ring.q_primes)
        assert lg2.ring.drown_sec == ring.drown_sec
        assert lg2.mac_key_share.to_int() == lg.mac_key_share.to_int()
        # decryptability of the persisted counterparty MAC ciphertext is
        # exercised by generating one batch of authenticated randomness
        # (homomorphic MAC against other_mac_enc)
        lg2.generate_shared_randomness(lg2.ring.slots)
        r = lg2.prep.randomness.take(len(lg2.prep.randomness))
        return lg2.mac_key_share.to_int(), r.share.to_ints(), r.mac.to_ints()

    (k0, s0, m0), (k1, s1, m1) = execute_mock_mpc(prog)
    key = (k0 + k1) % L
    for v0, v1, mm0, mm1 in zip(s0, s1, m0, m1):
        assert (mm0 + mm1) % L == key * ((v0 + v1) % L) % L
