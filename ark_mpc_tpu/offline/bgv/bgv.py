"""BGV encryption over the RNS ring.

TPU-native analog of the reference's BGV FFI surface
(`mp-spdz-rs/src/fhe/{keys.rs,plaintext.rs,ciphertext.rs}` over MP-SPDZ
C++): keypair generation, slot-packed plaintexts, encryption, decryption,
ciphertext addition, ciphertext x plaintext products, and drowning
rerandomization — everything LowGear's triple generation consumes.

Scheme (standard BGV, plaintext in the low bits):
    sk: ternary s.            pk: (b, a) with a uniform, b = -(a*s) + t*e.
    enc(m): u ternary, e0/e1 CBD noise:
        c0 = b*u + t*e0 + m,  c1 = a*u + t*e1.
    dec: (c0 + c1*s mod q) centered, then mod t.
    ct x pt: multiply both components by the plaintext ring element.
    drown: add enc(0) whose noise is ~2^sec larger than the ct's noise
    (`ciphertext.rs` rerandomize / LowGear's statistical masking).

Plaintext slots: t = 1 mod 2N, so the negacyclic NTT over Z_t is the slot
isomorphism — `encode` is an inverse NTT of the slot vector, `decode` the
forward NTT, and ring products act slot-wise (`plaintext.rs` slot get/set).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ...ops import modular32 as m32
from ...ops.ntt import ntt
from . import rns
from .params import BgvParams

U32 = jnp.uint32


@dataclass
class Ciphertext:
    """(c0, c1) in R_q x R_q; arrays (L, N) or batched (B, L, N)."""

    c0: jnp.ndarray
    c1: jnp.ndarray

    def __add__(self, other: "Ciphertext"):
        raise TypeError("use bgv.add_ct(params, a, b)")


@dataclass
class Keypair:
    params: BgvParams
    sk: jnp.ndarray  # (L, N) RNS of ternary s
    pk_a: jnp.ndarray
    pk_b: jnp.ndarray


def keygen(params: BgvParams, key) -> Keypair:
    ka, ks, ke = jax.random.split(key, 3)
    s = rns.sample_ternary(params, ks)
    a = rns.sample_uniform(params, ka)
    e = rns.sample_cbd(params, ke)
    b = rns.rns_sub(params, rns.rns_scalar_mul(params, e, params.t),
                    rns.rns_mul(params, a, s))
    return Keypair(params, s, a, b)


# -- plaintext packing ------------------------------------------------------


def encode_slots(params: BgvParams, slots) -> jnp.ndarray:
    """Slot values (..., N) uint32 (< t) -> plaintext ring coefficients.

    Inverse negacyclic NTT over Z_t; slot-wise products of encodings
    correspond to ring products.
    """
    slots = jnp.asarray(slots, U32)
    return ntt(params.t_plan, slots, inverse=True)


def decode_slots(params: BgvParams, coeffs) -> jnp.ndarray:
    return ntt(params.t_plan, jnp.asarray(coeffs, U32))


# -- core operations --------------------------------------------------------


def encrypt_with_randomness(params: BgvParams, pk_a, pk_b, m_rns,
                            u_rns, e0_rns, e1_rns) -> Ciphertext:
    """Deterministic encryption from explicit randomness (all operands
    already lifted to RNS).  The ZKPoK verifier re-runs this equation."""
    c0 = rns.rns_add(
        params,
        rns.rns_add(params, rns.rns_mul(params, pk_b, u_rns),
                    rns.rns_scalar_mul(params, e0_rns, params.t)),
        m_rns,
    )
    c1 = rns.rns_add(params, rns.rns_mul(params, pk_a, u_rns),
                     rns.rns_scalar_mul(params, e1_rns, params.t))
    return Ciphertext(c0, c1)


def encrypt(params: BgvParams, pk_a, pk_b, pt_coeffs, key,
            return_randomness: bool = False):
    """Encrypt plaintext ring coefficients (..., N) uint32 < t."""
    ku, k0, k1 = jax.random.split(key, 3)
    batch = jnp.asarray(pt_coeffs).shape[:-1]
    # raw signed randomness (kept for proofs), lifted to RNS for encryption
    u_raw = jax.random.randint(ku, batch + (params.n,), -1, 2, jnp.int32)
    k = params.cbd_k
    bits0 = jax.random.bernoulli(k0, 0.5, (2 * k,) + batch + (params.n,))
    bits1 = jax.random.bernoulli(k1, 0.5, (2 * k,) + batch + (params.n,))
    e0_raw = (bits0[:k].sum(0) - bits0[k:].sum(0)).astype(jnp.int32)
    e1_raw = (bits1[:k].sum(0) - bits1[k:].sum(0)).astype(jnp.int32)
    m = rns.from_plaintext(params, pt_coeffs)
    ct = encrypt_with_randomness(
        params, pk_a, pk_b, m,
        rns.from_signed_coeffs(params, u_raw),
        rns.from_signed_coeffs(params, e0_raw),
        rns.from_signed_coeffs(params, e1_raw),
    )
    if return_randomness:
        return ct, (u_raw, e0_raw, e1_raw)
    return ct


def decrypt(params: BgvParams, sk, ct: Ciphertext) -> np.ndarray:
    """-> plaintext coefficients (N,) uint32 (host-side CRT + centering)."""
    phase = rns.rns_add(params, ct.c0, rns.rns_mul(params, ct.c1, sk))
    ints = rns.to_ints(params, phase)  # centered in (-q/2, q/2]
    t = params.t
    return np.array([v % t for v in ints], dtype=np.uint32)


def add_ct(params: BgvParams, x: Ciphertext, y: Ciphertext) -> Ciphertext:
    return Ciphertext(rns.rns_add(params, x.c0, y.c0),
                      rns.rns_add(params, x.c1, y.c1))


def add_pt(params: BgvParams, x: Ciphertext, pt_coeffs) -> Ciphertext:
    m = rns.from_plaintext(params, pt_coeffs)
    return Ciphertext(rns.rns_add(params, x.c0, m), x.c1)


def mul_pt(params: BgvParams, x: Ciphertext, pt_coeffs) -> Ciphertext:
    """ct x plaintext ring element (`ciphertext.rs` mul_plaintext)."""
    m = rns.from_plaintext(params, pt_coeffs)
    return Ciphertext(rns.rns_mul(params, x.c0, m),
                      rns.rns_mul(params, x.c1, m))


def rerandomize(params: BgvParams, pk_a, pk_b, ct: Ciphertext,
                key, drown_bits: int | None = None) -> Ciphertext:
    """Drowning rerandomization (`ciphertext.rs` rerandomize): add a fresh
    encryption of zero whose noise statistically hides the ciphertext's —
    uniform noise of ~2^(drown_sec) x the post-product noise bound."""
    drown_bits = drown_bits if drown_bits is not None else (
        params.drown_sec + 20
    )
    ku, k0, k1 = jax.random.split(key, 3)
    batch = ct.c0.shape[:-2]
    u = rns.sample_ternary(params, ku, batch)
    e0 = rns.sample_uniform_bounded(params, k0, drown_bits, batch)
    e1 = rns.sample_cbd(params, k1, batch)
    z0 = rns.rns_add(params, rns.rns_mul(params, pk_b, u),
                     rns.rns_scalar_mul(params, e0, params.t))
    z1 = rns.rns_add(params, rns.rns_mul(params, pk_a, u),
                     rns.rns_scalar_mul(params, e1, params.t))
    return Ciphertext(rns.rns_add(params, ct.c0, z0),
                      rns.rns_add(params, ct.c1, z1))


# -- convenience: slot-level API -------------------------------------------


def encrypt_slots(params: BgvParams, pk_a, pk_b, slot_values, key):
    return encrypt(params, pk_a, pk_b, encode_slots(params, slot_values), key)


def decrypt_slots(params: BgvParams, sk, ct: Ciphertext) -> np.ndarray:
    return np.asarray(jax.device_get(
        decode_slots(params, decrypt(params, sk, ct))
    ))
