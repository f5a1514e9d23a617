"""The round-1 capstone: BGV-generated triples over the REAL share field
power the actual online phase.

Two parties run the l-field LowGear pipeline (key exchange, enc(a) exchange,
homomorphic cross products + MACs), bank the output in a `LowGearPrep`, and
then an online `MpcFabric` consumes it: Beaver multiplication of
authenticated random shares, MAC-checked opens — the full stack with ZERO
dealer involvement."""

import jax
import numpy as np

from ark_mpc_tpu import MpcFabric
from ark_mpc_tpu.algebra.fields import CURVE25519_ORDER as L
from ark_mpc_tpu.fabric.simulator import execute_mock_mpc
from ark_mpc_tpu.offline.bgv.bgv_l import default_ring
from ark_mpc_tpu.offline.lowgear.triplets_l import (
    generate_authenticated_randomness_l,
    generate_triples_l,
    key_exchange_l,
)
from ark_mpc_tpu.offline.structs import LowGearPrep

import pytest

pytestmark = pytest.mark.slow  # full BGV/ZK pipeline: minutes on CPU

RING = default_ring()


def test_bgv_l_triples_drive_online_phase():
    def prog(fabric):
        pid = fabric.party_id
        rng = np.random.default_rng(500 + pid)
        st = key_exchange_l(fabric.transport, RING, rng,
                            jax.random.PRNGKey(600 + pid))

        a, b, c = generate_triples_l(fabric.transport, st, rng,
                                     jax.random.PRNGKey(700 + pid))
        r1 = generate_authenticated_randomness_l(
            fabric.transport, st, rng, jax.random.PRNGKey(800 + pid))
        r2 = generate_authenticated_randomness_l(
            fabric.transport, st, rng, jax.random.PRNGKey(900 + pid))

        prep = LowGearPrep(mac_key_share=st.mac_key_share)
        prep.triples.add(a, b, c)
        prep.randomness.add(r1)

        online = MpcFabric(pid, fabric.transport, prep, rng=rng)
        # multiply two authenticated-random vectors with the BGV triples
        x, y = r1, r2
        n = RING.phi
        z = online.mul(x[:n], y[:n])
        zv = online.open_authenticated(z, defer=True)
        xv = online.open_authenticated(x[:n], defer=True)
        yv = online.open_authenticated(y[:n], defer=True)
        online.verify_deferred()  # ONE MAC check for everything
        return zv.to_ints(), xv.to_ints(), yv.to_ints()

    (z0, x0, y0), (z1, x1, y1) = execute_mock_mpc(prog)
    assert z0 == z1 and x0 == x1 and y0 == y1
    assert z0 == [(xv * yv) % L for xv, yv in zip(x0, y0)]


def test_batched_proof_triple_pairs():
    """Multiple slot-batches of Fig.7 pairs under ONE amortized ZK proof
    (`generate_triple_pairs_batch_l`, the `params.rs:65-67` batch
    structure): pair relations c=ab, c'=ab' hold across the batch seam and
    MACs authenticate under the combined key."""
    from ark_mpc_tpu.offline.lowgear.triplets_l import (
        generate_triple_pairs_batch_l,
    )

    def prog(fabric):
        pid = fabric.party_id
        rng = np.random.default_rng(520 + pid)
        st = key_exchange_l(fabric.transport, RING, rng,
                            jax.random.PRNGKey(620 + pid))
        a, b, c, b2, c2 = generate_triple_pairs_batch_l(
            fabric.transport, st, 2, rng, jax.random.PRNGKey(720 + pid))

        prep = LowGearPrep(mac_key_share=st.mac_key_share)
        online = MpcFabric(pid, fabric.transport, prep, rng=rng)
        outs = [online.open_authenticated(s, defer=True)
                for s in (a, b, c, b2, c2)]
        online.verify_deferred()
        return [o.to_ints() for o in outs]

    r0, r1 = execute_mock_mpc(prog)
    av, bv, cv, b2v, c2v = r0
    assert r0 == r1
    assert len(av) == 2 * RING.slots
    assert cv == [(x * y) % L for x, y in zip(av, bv)]
    assert c2v == [(x * y) % L for x, y in zip(av, b2v)]
