"""NTT and 32-bit modular kernel tests vs exact python ints."""

import random

import jax.numpy as jnp
import numpy as np

from ark_mpc_tpu.ops.modular32 import (
    PrimeSpec,
    find_primes,
    from_mont32,
    mont_mul32,
    to_mont32,
)
from ark_mpc_tpu.ops.ntt import NttPlan, ntt, poly_mul_mod

rng = random.Random(61)


def test_find_primes_and_mont32():
    (q,) = find_primes(1, order=1 << 13, bits=30)
    assert q % (1 << 13) == 1
    spec = PrimeSpec(q)
    a = np.array([rng.randrange(q) for _ in range(64)], dtype=np.uint32)
    b = np.array([rng.randrange(q) for _ in range(64)], dtype=np.uint32)
    am = to_mont32(spec, jnp.asarray(a))
    bm = to_mont32(spec, jnp.asarray(b))
    got = np.asarray(from_mont32(spec, mont_mul32(spec, am, bm)))
    want = (a.astype(object) * b.astype(object)) % q
    assert got.astype(object).tolist() == want.tolist()


def _ref_negacyclic_mul(a, b, q):
    n = len(a)
    out = [0] * n
    for i, x in enumerate(a):
        for j, y in enumerate(b):
            k = i + j
            if k < n:
                out[k] = (out[k] + x * y) % q
            else:
                out[k - n] = (out[k - n] - x * y) % q
    return out


def test_ntt_roundtrip_and_mul():
    n = 64
    (q,) = find_primes(1, order=2 * n, bits=30)
    plan = NttPlan(q, n, negacyclic=True)
    a = np.array([rng.randrange(q) for _ in range(n)], dtype=np.uint32)
    b = np.array([rng.randrange(q) for _ in range(n)], dtype=np.uint32)

    back = np.asarray(ntt(plan, ntt(plan, jnp.asarray(a)), inverse=True))
    assert back.tolist() == a.tolist()

    got = np.asarray(poly_mul_mod(plan, jnp.asarray(a), jnp.asarray(b)))
    want = _ref_negacyclic_mul(a.astype(object), b.astype(object), q)
    assert got.astype(object).tolist() == want


def test_ntt_batched():
    n = 32
    (q,) = find_primes(1, order=2 * n, bits=29)
    plan = NttPlan(q, n, negacyclic=True)
    batch = np.array(
        [[rng.randrange(q) for _ in range(n)] for _ in range(5)],
        dtype=np.uint32,
    )
    f = ntt(plan, jnp.asarray(batch))
    back = np.asarray(ntt(plan, f, inverse=True))
    assert back.tolist() == batch.tolist()
