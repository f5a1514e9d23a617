"""Number-theoretic transforms over RNS primes.

The polynomial engine of the (in-progress) TPU BGV offline phase — the
replacement for MP-SPDZ's C++ FFT (`mp-spdz-rs/build.rs` FHE sources) — and
the share-level FFT capability of the reference (`scalar/share.rs:168-191`,
`scalar_result.rs:340-403`) for NTT-friendly moduli.  (Curve25519's scalar
field has 2-adicity 2, so share-FFT over *that* field does not exist in the
reference's generic sense either; BGV RNS primes are chosen q ≡ 1 mod 2N.)

Two implementations, both batch-first over shape (..., N) uint32 residues:
  - radix-2 iterative Cooley-Tukey with reshape/stack butterflies
    (log N stages of full-width VPU ops);
  - negacyclic wrapper (X^N + 1) via the 2N-th-root twist, the BGV ring.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .modular32 import (
    PrimeSpec,
    add32,
    from_mont32,
    mont_mul32,
    primitive_root_of_unity,
    sub32,
    to_mont32,
)

U32 = jnp.uint32


class NttPlan:
    """Precomputed twiddles for a (q, N, negacyclic) transform."""

    def __init__(self, q: int, n: int, negacyclic: bool = True):
        assert n & (n - 1) == 0, "N must be a power of two"
        order = 2 * n if negacyclic else n
        assert (q - 1) % order == 0, "q must be 1 mod order"
        self.spec = PrimeSpec(q)
        self.n = n
        self.negacyclic = negacyclic
        w = primitive_root_of_unity(q, n)
        r = (1 << 32) % q

        def mont(x):
            return x * r % q

        # per-stage twiddle tables (Montgomery form), bit-reversed DIT order
        self.stage_tw = []
        self.stage_tw_inv = []
        w_inv = pow(w, q - 2, q)
        for stage in range(n.bit_length() - 1):
            m = 2 << stage
            base = pow(w, n // m, q)
            base_inv = pow(w_inv, n // m, q)
            tws = np.array([mont(pow(base, j, q)) for j in range(m // 2)],
                           dtype=np.uint32)
            tws_i = np.array([mont(pow(base_inv, j, q)) for j in range(m // 2)],
                             dtype=np.uint32)
            self.stage_tw.append(jnp.asarray(tws))
            self.stage_tw_inv.append(jnp.asarray(tws_i))
        self.n_inv = jnp.asarray(np.uint32(mont(pow(n, q - 2, q))))
        if negacyclic:
            psi = primitive_root_of_unity(q, 2 * n)
            psi_inv = pow(psi, q - 2, q)
            self.psi_pows = jnp.asarray(
                np.array([mont(pow(psi, j, q)) for j in range(n)], np.uint32))
            self.psi_inv_pows = jnp.asarray(
                np.array([mont(pow(psi_inv, j, q)) for j in range(n)],
                         np.uint32))

    def __hash__(self):
        return hash((self.spec.q, self.n, self.negacyclic))

    def __eq__(self, other):
        return (isinstance(other, NttPlan) and other.spec.q == self.spec.q
                and other.n == self.n and other.negacyclic == self.negacyclic)


def _bit_reverse_perm(n: int) -> np.ndarray:
    bits = n.bit_length() - 1
    idx = np.arange(n)
    rev = np.zeros(n, dtype=np.int64)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev


@functools.partial(jax.jit, static_argnums=(0, 2))
def ntt(plan: NttPlan, x, inverse: bool = False):
    """Forward/inverse NTT over the last axis (values < q, standard domain;
    twiddles applied in Montgomery domain internally)."""
    spec = plan.spec
    n = plan.n
    assert x.shape[-1] == n

    if plan.negacyclic and not inverse:
        x = mont_mul32(spec, x, jnp.broadcast_to(plan.psi_pows, x.shape))

    # decimation-in-time: bit-reverse then log2(n) butterfly stages
    perm = jnp.asarray(_bit_reverse_perm(n))
    x = x[..., perm]
    tables = plan.stage_tw_inv if inverse else plan.stage_tw
    for stage, tw in enumerate(tables):
        m = 2 << stage
        half = m // 2
        shape = x.shape[:-1] + (n // m, m)
        y = x.reshape(shape)
        lo = y[..., :half]
        hi = y[..., half:]
        hi_t = mont_mul32(spec, hi, jnp.broadcast_to(tw, hi.shape))
        x = jnp.concatenate(
            [add32(spec, lo, hi_t), sub32(spec, lo, hi_t)], axis=-1
        ).reshape(x.shape[:-1] + (n,))

    if inverse:
        x = mont_mul32(spec, x, jnp.broadcast_to(plan.n_inv, x.shape))
        if plan.negacyclic:
            x = mont_mul32(spec, x,
                           jnp.broadcast_to(plan.psi_inv_pows, x.shape))
    return x


def poly_mul_mod(plan: NttPlan, a, b):
    """Polynomial product in Z_q[X]/(X^N + 1) (negacyclic) or /(X^N - 1):
    NTT -> pointwise Montgomery product -> INTT.  Batched over leading axes."""
    fa = ntt(plan, a)
    fb = ntt(plan, b)
    prod = mont_mul32(plan.spec, fa, fb)
    # fa*fb in eval domain carries an extra R^-1; fix by scaling with R^2...
    # mont_mul32(fa, fb) = fa*fb/R; multiply by R (mont form of 1*R = R^2/R)
    r2 = jnp.full_like(prod, U32(plan.spec.r2))
    prod = mont_mul32(plan.spec, prod, r2)
    return ntt(plan, prod, inverse=True)
