"""RNS polynomial arithmetic for the BGV ciphertext ring.

Replacement for MP-SPDZ's C++ ring arithmetic (`mp-spdz-rs` FHE Math
sources): a polynomial in R_q = Z_q[X]/(X^N + 1) is a uint32 array of shape
(L, N) — one residue row per RNS prime — and every operation is an
element-wise or NTT-based batched kernel.  A batch of polynomials is
(B, L, N); all ops broadcast over leading axes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ...ops import modular32 as m32
from ...ops.ntt import ntt
from .params import BgvParams

U32 = jnp.uint32


def zero(params: BgvParams, batch: tuple = ()) -> jnp.ndarray:
    return jnp.zeros(batch + (len(params.q_primes), params.n), U32)


def rns_add(params: BgvParams, a, b):
    out = []
    for i, spec in enumerate(params.q_specs):
        out.append(m32.add32(spec, a[..., i, :], b[..., i, :]))
    return jnp.stack(out, axis=-2)


def rns_sub(params: BgvParams, a, b):
    out = []
    for i, spec in enumerate(params.q_specs):
        out.append(m32.sub32(spec, a[..., i, :], b[..., i, :]))
    return jnp.stack(out, axis=-2)


def rns_neg(params: BgvParams, a):
    return rns_sub(params, zero(params, a.shape[:-2]), a)


def rns_mul(params: BgvParams, a, b):
    """Negacyclic polynomial product per RNS prime (NTT pointwise)."""
    out = []
    for i, (spec, plan) in enumerate(zip(params.q_specs, params.q_plans)):
        fa = ntt(plan, a[..., i, :])
        fb = ntt(plan, b[..., i, :])
        prod = m32.mont_mul32(spec, fa, fb)
        prod = m32.mont_mul32(spec, prod, jnp.full_like(prod, U32(spec.r2)))
        out.append(ntt(plan, prod, inverse=True))
    return jnp.stack(out, axis=-2)


def rns_scalar_mul(params: BgvParams, a, scalar: int):
    """Multiply by a public integer scalar (e.g. the plaintext modulus t)."""
    out = []
    for i, spec in enumerate(params.q_specs):
        s = scalar % spec.q
        sm = (s * spec.r) % spec.q  # Montgomery form of s
        out.append(m32.mont_mul32(spec, a[..., i, :],
                                  jnp.full_like(a[..., i, :], U32(sm))))
    return jnp.stack(out, axis=-2)


# ---------------------------------------------------------------------------
# lifting / sampling (host + device)
# ---------------------------------------------------------------------------


def from_signed_coeffs(params: BgvParams, coeffs) -> jnp.ndarray:
    """Small signed integer coefficients (..., N) int32 -> RNS residues."""
    coeffs = jnp.asarray(coeffs, jnp.int32)
    out = []
    for spec in params.q_specs:
        r = jnp.where(coeffs < 0, coeffs + jnp.int32(spec.q), coeffs)
        out.append(r.astype(U32) % U32(spec.q))
    return jnp.stack(out, axis=-2)


def from_plaintext(params: BgvParams, pt) -> jnp.ndarray:
    """Plaintext coefficients (..., N) uint32 (< t) -> RNS residues.

    Centered lift: values > t/2 are mapped to value - t (negative), which
    keeps the embedded message small — required for noise growth bounds.
    """
    pt = jnp.asarray(pt, U32)
    half = U32(params.t // 2)
    out = []
    for spec in params.q_specs:
        pos = pt % U32(spec.q)
        # value - t mod q  (for the "negative" half)
        neg = (pt + U32(spec.q) - U32(params.t % spec.q)) % U32(spec.q)
        out.append(jnp.where(pt > half, neg, pos))
    return jnp.stack(out, axis=-2)


def sample_uniform(params: BgvParams, key, batch: tuple = ()) -> jnp.ndarray:
    """Uniform element of R_q (per-prime uniform residues)."""
    keys = jax.random.split(key, len(params.q_primes))
    out = []
    for i, spec in enumerate(params.q_specs):
        bits = jax.random.randint(keys[i], batch + (params.n,),
                                  0, spec.q, dtype=jnp.int32)
        out.append(bits.astype(U32))
    return jnp.stack(out, axis=-2)


def sample_ternary(params: BgvParams, key, batch: tuple = ()) -> jnp.ndarray:
    """Ternary {-1, 0, 1} secret/encryption randomness, lifted to RNS."""
    v = jax.random.randint(key, batch + (params.n,), -1, 2, dtype=jnp.int32)
    return from_signed_coeffs(params, v)


def sample_cbd(params: BgvParams, key, batch: tuple = (),
               scale: int = 1) -> jnp.ndarray:
    """Centered-binomial noise (sigma ~ sqrt(k/2)), optionally scaled
    (drowning uses scale = 2^drown_sec)."""
    k = params.cbd_k
    a = jax.random.bernoulli(key, 0.5, (2 * k,) + batch + (params.n,))
    v = (a[:k].sum(0).astype(jnp.int32) - a[k:].sum(0).astype(jnp.int32))
    return from_signed_coeffs(params, v * jnp.int32(scale))


def sample_uniform_bounded(params: BgvParams, key, bound_bits: int,
                           batch: tuple = ()) -> jnp.ndarray:
    """Uniform signed coefficients in [-2^bound_bits, 2^bound_bits] for
    drowning noise; bound_bits <= 30 per draw, composed from 30-bit words."""
    total_words = (bound_bits + 29) // 30
    acc = None
    for w in range(total_words):
        key, sub = jax.random.split(key)
        bits = min(30, bound_bits - 30 * w)
        v = jax.random.randint(sub, batch + (params.n,),
                               -(1 << bits), (1 << bits) + 1, dtype=jnp.int32)
        r = from_signed_coeffs(params, v)
        if w:
            r = rns_scalar_mul(params, r, 1 << (30 * w))
        acc = r if acc is None else rns_add(params, acc, r)
    return acc


# ---------------------------------------------------------------------------
# host-side CRT (tests / decode)
# ---------------------------------------------------------------------------


def to_ints(params: BgvParams, poly) -> list[int]:
    """CRT-recompose (L, N) residues to centered ints in (-q/2, q/2]."""
    arr = np.asarray(jax.device_get(poly))
    assert arr.ndim == 2
    q = params.q
    out = []
    for j in range(params.n):
        v = 0
        for i, p in enumerate(params.q_primes):
            v += params.q_hat[i] * (params.q_hat_inv[i] * int(arr[i, j]) % p)
        v %= q
        if v > q // 2:
            v -= q
        out.append(v)
    return out
