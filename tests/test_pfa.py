"""Good-Thomas PFA DFT vs dense DFT golden tests."""

import random

import jax.numpy as jnp
import numpy as np
import pytest

from ark_mpc_tpu.ops.modular32 import find_primes, primitive_root_of_unity
from ark_mpc_tpu.ops.pfa import PfaPlan, pfa_dft

rng = random.Random(77)


@pytest.mark.parametrize("m", [132, 105, 15])
def test_pfa_matches_dense_dft(m):
    (q,) = find_primes(1, order=m, bits=29)
    plan = PfaPlan(q, m)
    w = primitive_root_of_unity(q, m)
    x = np.array([rng.randrange(q) for _ in range(m)], dtype=np.uint32)

    got = np.asarray(pfa_dft(plan, jnp.asarray(x)))
    want = [sum(int(x[n]) * pow(w, (n * k) % m, q) for n in range(m)) % q
            for k in range(m)]
    # the PFA's per-axis roots derive from the same w (primitive_root_of_
    # unity is deterministic), so outputs must match exactly
    assert got.tolist() == want

    back = np.asarray(pfa_dft(plan, jnp.asarray(got), inverse=True))
    assert back.tolist() == x.tolist()


def test_pfa_batched():
    m = 105
    (q,) = find_primes(1, order=m, bits=28)
    plan = PfaPlan(q, m)
    x = np.array([[rng.randrange(q) for _ in range(m)] for _ in range(4)],
                 dtype=np.uint32)
    f = pfa_dft(plan, jnp.asarray(x))
    back = np.asarray(pfa_dft(plan, f, inverse=True))
    assert back.tolist() == x.tolist()
