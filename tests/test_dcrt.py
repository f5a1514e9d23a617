"""Double-CRT (evaluation-form) ring pathway: equivalence with the
coefficient-form multiply."""

import random

import numpy as np

from ark_mpc_tpu.offline.bgv.cyclotomic import CyclotomicRing

rng = random.Random(121)


def _rand_elem(ring):
    import jax.numpy as jnp

    rows = []
    for spec in ring.q_specs:
        rows.append(np.array([rng.randrange(spec.q) for _ in range(ring.phi)],
                             dtype=np.uint32))
    return jnp.asarray(np.stack(rows))


def test_dcrt_mul_matches_coeff_mul():
    ring = CyclotomicRing(132, n_q_primes=3)
    a, b = _rand_elem(ring), _rand_elem(ring)
    want = np.asarray(ring.mul(a, b))
    got = np.asarray(ring.from_eval(
        ring.mul_eval(ring.to_eval(a), ring.to_eval(b))))
    assert got.tolist() == want.tolist()


def test_dcrt_roundtrip_and_add():
    ring = CyclotomicRing(35, n_q_primes=3)  # d=2 index too
    a, b = _rand_elem(ring), _rand_elem(ring)
    back = np.asarray(ring.from_eval(ring.to_eval(a)))
    assert back.tolist() == np.asarray(a).tolist()
    # addition commutes with the representation
    want = np.asarray(ring.add(a, b))
    got = np.asarray(ring.from_eval(
        ring.add(ring.to_eval(a), ring.to_eval(b))))
    assert got.tolist() == want.tolist()
