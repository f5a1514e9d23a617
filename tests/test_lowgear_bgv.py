"""Two-party BGV LowGear pipeline test: key exchange -> triple generation
with homomorphic cross products and authentication (over the BGV test
plaintext field)."""

import jax
import numpy as np

from ark_mpc_tpu.fabric.simulator import execute_mock_mpc
from ark_mpc_tpu.offline.bgv import test_params as small_params
from ark_mpc_tpu.offline.lowgear.setup import run_key_exchange
from ark_mpc_tpu.offline.lowgear.triplets_bgv import (
    generate_triple_pairs,
    generate_triples,
)

P = small_params(n=256)

import pytest

pytestmark = pytest.mark.slow  # full BGV/ZK pipeline: minutes on CPU


def test_bgv_triple_pairs_share_a():
    """Fig. 7 pair: (a,b,c) and (a,b',c'=a*b') with the SAME a."""

    def prog(fabric):
        pid = fabric.party_id
        ks = np.full(P.n, 5 + pid, dtype=np.uint32)
        st = run_key_exchange(fabric.transport, P, ks,
                              jax.random.PRNGKey(300 + pid))
        trip, pair = generate_triple_pairs(
            fabric.transport, st, np.uint32(5 + pid),
            jax.random.PRNGKey(400 + pid))
        get = lambda o: {k: np.asarray(jax.device_get(getattr(o, k)))
                         for k in ("a", "b", "c")}
        return get(trip), get(pair)

    (t0, p0), (t1, p1) = execute_mock_mpc(prog)
    t = P.t
    a = (t0["a"].astype(object) + t1["a"]) % t
    assert (p0["a"].astype(object) + p1["a"]).tolist() == (
        t0["a"].astype(object) + t1["a"]).tolist()
    b2 = (p0["b"].astype(object) + p1["b"]) % t
    c2 = (p0["c"].astype(object) + p1["c"]) % t
    assert c2.tolist() == ((a * b2) % t).tolist()


def test_bgv_triples_end_to_end():
    def prog(fabric):
        pid = fabric.party_id
        key_val = 12345 + 99 * pid  # per-party MAC key share (scalar)
        key_slots = np.full(P.n, key_val, dtype=np.uint32)
        st = run_key_exchange(fabric.transport, P, key_slots,
                              jax.random.PRNGKey(100 + pid))
        trip = generate_triples(fabric.transport, st,
                                np.uint32(key_val),
                                jax.random.PRNGKey(200 + pid))
        return {k: np.asarray(jax.device_get(getattr(trip, k)))
                for k in ("a", "b", "c", "a_mac", "b_mac", "c_mac")}, key_val

    (t0, k0), (t1, k1) = execute_mock_mpc(prog)
    t = P.t
    key = (k0 + k1) % t
    a = (t0["a"].astype(object) + t1["a"]) % t
    b = (t0["b"].astype(object) + t1["b"]) % t
    c = (t0["c"].astype(object) + t1["c"]) % t
    assert c.tolist() == ((a * b) % t).tolist(), "c != a*b"
    for name, vals in (("a", a), ("b", b), ("c", c)):
        macs = (t0[f"{name}_mac"].astype(object) + t1[f"{name}_mac"]) % t
        assert macs.tolist() == ((vals * key) % t).tolist(), f"mac({name})"
