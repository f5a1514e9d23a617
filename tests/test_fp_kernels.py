"""Pallas kernel math validation (interpreter mode on CPU)."""

import random

import jax.numpy as jnp
import numpy as np

from ark_mpc_tpu.algebra import limbs as lb
from ark_mpc_tpu.algebra.fields import SCALAR_FIELD as spec
from ark_mpc_tpu.ops.fp_kernels import BLOCK, mont_mul_pallas

rng = random.Random(71)
L = spec.modulus


def _pack(vals):
    return lb.pack_ints(spec, vals, mont=False)


def test_mont_mul_pallas_matches():
    n = BLOCK  # one tile
    a = [rng.randrange(L) for _ in range(n)]
    b = [rng.randrange(L) for _ in range(n)]
    xa, xb = _pack(a), _pack(b)
    got = lb.unpack_ints(spec, mont_mul_pallas(spec, xa, xb), mont=False)
    r_inv = pow(1 << 256, -1, L)
    want = [(u * v * r_inv) % L for u, v in zip(a, b)]
    assert got == want


def test_mont_mul_pallas_multi_tile():
    n = 2 * BLOCK
    a = [rng.randrange(L) for _ in range(n)]
    b = [rng.randrange(L) for _ in range(n)]
    got = lb.unpack_ints(spec, mont_mul_pallas(spec, _pack(a), _pack(b)),
                         mont=False)
    r_inv = pow(1 << 256, -1, L)
    assert got == [(u * v * r_inv) % L for u, v in zip(a, b)]
