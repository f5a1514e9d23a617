"""BGV with the Curve25519 group order as plaintext modulus.

The instantiation LowGear actually needs: plaintext slots are elements of
the MPC share field F_l, so homomorphic slot products produce the
cross-terms of real SPDZ triples.  Built on `cyclotomic.CyclotomicRing`
(general-m ring, DFT-by-matmul transforms, limb-engine plaintext lifts).

Noise budget (coefficient magnitudes): fresh phase ~ t * E_fresh with
E_fresh ~ cbd_k * phi; after ct x pt: * (t/2) * phi; drowning multiplies by
2^sec.  With t = l ~ 2^253, phi = 40, sec = 40 the phase stays under
~2^580; the default RNS basis (21 x 30-bit primes, q ~ 2^630) decrypts
correctly.  (The big-m production sets re-derive these bounds —
docs/bgv_design.md.)
"""

from __future__ import annotations

from dataclasses import dataclass

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ...algebra import limbs as lb
from ...algebra.fields import SCALAR_FIELD
from ...algebra.scalar import Scalar
from ...ops.modular32 import mont_mul32
from .cyclotomic import CyclotomicRing

U32 = jnp.uint32
L_MOD = SCALAR_FIELD.modulus


@dataclass
class CiphertextL:
    c0: jnp.ndarray  # (..., L, phi)
    c1: jnp.ndarray


jax.tree_util.register_pytree_node(
    CiphertextL,
    lambda c: ((c.c0, c.c1), None),
    lambda aux, ch: CiphertextL(*ch),
)


@dataclass
class KeypairL:
    ring: CyclotomicRing
    sk: jnp.ndarray
    pk_a: jnp.ndarray
    pk_b: jnp.ndarray


def default_ring(m: int = 132, n_q_primes: int = 21) -> CyclotomicRing:
    return CyclotomicRing(m, n_q_primes=n_q_primes)


def production_ring(n_q_primes: int | None = None):
    """The RLWE-secure production ring: m = 118965 (phi = 48960, 24480
    GF(l^2) slots), powerful-basis representation, drown sec 128, RNS
    basis auto-sized to the noise budget.  Parameter justification:
    docs/security_params.md; reference analog
    `mp-spdz-rs/src/fhe/params.rs:41-67` (modulus-targeted generation)."""
    from .powerful import PowerfulRing

    return PowerfulRing(118965, n_q_primes=n_q_primes, drown_sec=128)


def medium_ring(n_q_primes: int | None = None):
    """Mid-size ring with the production code paths (powerful basis,
    d = 2): m = 1155 = 3*5*7*11, phi = 480, 240 slots.  For tests/CI."""
    from .powerful import PowerfulRing

    return PowerfulRing(1155, n_q_primes=n_q_primes, drown_sec=128)


def rlwe_secure_128(ring) -> bool:
    """Conservative classical 128-bit RLWE security check (ternary secret,
    HomomorphicEncryption.org standard tables): allow log2(q) up to
    25 bits per 1024 ring dimensions — below every table row (e.g.
    n = 32768 permits log2 q <= 829; 25 * 32 = 800).  The production ring
    (phi = 48960, log2 q ~ 810) passes; the m = 132 prototype and m = 1155
    medium rings do NOT (docs/security_params.md §2).  The reference cannot
    even construct insecure parameter sets — MP-SPDZ generates them from
    the modulus (`fhe/params.rs:41-52`); this check is the equivalent
    guard for our explicit-parameter constructors."""
    phi = getattr(ring, "phi", 0)
    log2_q = getattr(ring, "log2_q", None)
    if log2_q is None:
        log2_q = sum(int(p).bit_length() for p in ring.q_primes)
    return 1024 * log2_q <= 25 * phi


# -- sampling ---------------------------------------------------------------


def _sample_ternary(ring, key, batch=()):
    v = jax.random.randint(key, batch + (ring.phi,), -1, 2, jnp.int32)
    return ring.lift_signed(v), v


def _sample_cbd(ring, key, batch=()):
    k = ring.cbd_k
    a = jax.random.bernoulli(key, 0.5, (2 * k,) + batch + (ring.phi,))
    v = (a[:k].sum(0) - a[k:].sum(0)).astype(jnp.int32)
    return ring.lift_signed(v), v


def _sample_wide_uniform(ring, key, bound_bits: int, batch=()):
    """Uniform signed noise with |e| < 2^bound_bits, composed from 24-bit
    words through per-prime powers of 2^24 (drowning noise).  Words are
    accumulated as per-prime COEFFICIENT residues and lifted to the ring's
    canonical representation once (one transform, not one per word)."""
    words = (bound_bits + 23) // 24
    acc = None
    for w in range(words):
        key, sub = jax.random.split(key)
        bits = min(24, bound_bits - 24 * w)
        v = jax.random.randint(sub, batch + (ring.phi,),
                               -(1 << bits), (1 << bits) + 1, jnp.int32)
        parts = []
        for i, spec in enumerate(ring.q_specs):
            r = jnp.where(v < 0, v + jnp.int32(spec.q), v).astype(U32) \
                % U32(spec.q)
            if w:
                c = (pow(2, 24 * w, spec.q) * spec.r) % spec.q
                r = mont_mul32(spec, r, jnp.full_like(r, U32(c)))
            parts.append(r)
        part = jnp.stack(parts, axis=-2)
        acc = part if acc is None else ring.add(acc, part)
    return ring.lift_residues(acc)


# -- scheme -----------------------------------------------------------------


def keygen_l(ring: CyclotomicRing, key) -> KeypairL:
    # Eager by choice: keygen runs once per session and the remote-compile
    # tunnel takes tens of minutes for the keygen-sized fused graph while
    # the eager per-prime op compiles are each small and cache well
    # (same pathology as the fused offline stages — see
    # `triplets_l._masked_products_l`).
    s, a, b = _keygen_arrays.__wrapped__(ring, key)
    return KeypairL(ring, s, a, b)



def _ring_jit(nargs: int):
    """Jit a `fn(ring, *arrays)` op with the ring static when the ring is
    fully device-traceable (`ring.supports_jit`, the production
    `PowerfulRing`).  Eager dispatch of these ops costs one host round
    trip per primitive — through the tunneled TPU that made encrypt_l
    ~7 s at m=118965; jitted it is ~136 ms (54x).  The prototype
    `CyclotomicRing` keeps eager paths (host-side bigint CRT in decrypt).
    Calls with kwargs or extra positionals (e.g. return_randomness,
    drown_bits) bypass the jitted form."""

    def deco(fn):
        jitted = jax.jit(fn, static_argnums=0)

        @functools.wraps(fn)
        def wrapper(ring, *args, **kwargs):
            if (kwargs or len(args) != nargs
                    or not getattr(ring, "supports_jit", False)):
                return fn(ring, *args, **kwargs)
            # build lazy host state OUTSIDE the trace (a constant built
            # during tracing would be stored on the ring as a leaked tracer)
            prep = getattr(ring, "prepare_for_trace", None)
            if prep is not None:
                prep()
            return jitted(ring, *args)

        return wrapper

    return deco


@_ring_jit(1)
def _keygen_arrays(ring, key):
    """Keygen compute as ONE program: eager per-prime ring ops are
    hundreds of tiny dispatches, each a cold remote compile when the RNS
    basis changes (measured: minutes through the compile tunnel)."""
    ka, ks, ke = jax.random.split(key, 3)
    s, _ = _sample_ternary(ring, ks)
    e, _ = _sample_cbd(ring, ke)
    a = jnp.stack(
        [jax.random.randint(jax.random.fold_in(ka, i), (ring.phi,),
                            0, spec.q, jnp.int32).astype(U32)
         for i, spec in enumerate(ring.q_specs)], axis=-2)
    b = ring.sub(ring.scalar_mul_t(e), ring.mul(a, s))
    return s, a, b


@_ring_jit(1)
def encode_slots_l(ring, slots: Scalar) -> Scalar:
    """F_l slot values (..., ring.slots) -> plaintext coefficients
    (..., phi).  Dispatches to the ring's transform-based maps
    (PowerfulRing per-axis GF(l^2) transforms) or the prototype dense
    matrices (CyclotomicRing)."""
    if hasattr(ring, "encode_slots"):
        return ring.encode_slots(slots)
    if len(slots.shape) > 1:  # prototype ring: loop leading batch dims
        flat = slots.reshape(-1, ring.slots)
        return Scalar.concatenate(
            [encode_slots_l(ring, flat[i]).reshape(1, ring.phi)
             for i in range(flat.shape[0])]).reshape(*slots.shape[:-1],
                                                     ring.phi)
    return (ring.encode_mat @ slots.reshape(ring.slots, 1)).reshape(ring.phi)


@_ring_jit(1)
def decode_slots_l(ring, coeffs: Scalar) -> Scalar:
    if hasattr(ring, "decode_slots"):
        return ring.decode_slots(coeffs)
    if len(coeffs.shape) > 1:  # prototype ring: loop leading batch dims
        flat = coeffs.reshape(-1, ring.phi)
        return Scalar.concatenate(
            [decode_slots_l(ring, flat[i]).reshape(1, ring.slots)
             for i in range(flat.shape[0])]).reshape(*coeffs.shape[:-1],
                                                     ring.slots)
    return (ring.decode_mat @ coeffs.reshape(ring.phi, 1)).reshape(ring.slots)


def _pt_to_rns(ring: CyclotomicRing, coeffs: Scalar):
    """Plaintext coefficient Scalar (phi,) -> centered RNS residues."""
    canon = lb.from_mont(SCALAR_FIELD, coeffs.limbs)  # (16, phi)
    return ring.lift_plaintext_limbs(canon)


@_ring_jit(6)
def encrypt_with_randomness_l(ring, pk_a, pk_b, m_rns, u_rns, e0_rns,
                              e1_rns) -> CiphertextL:
    """Deterministic encryption from explicit RNS-lifted randomness (the
    ZKPoK verifier re-runs this equation)."""
    c0 = ring.add(ring.add(ring.mul(pk_b, u_rns), ring.scalar_mul_t(e0_rns)),
                  m_rns)
    c1 = ring.add(ring.mul(pk_a, u_rns), ring.scalar_mul_t(e1_rns))
    return CiphertextL(c0, c1)


@_ring_jit(4)
def encrypt_l(ring: CyclotomicRing, pk_a, pk_b, pt_coeffs: Scalar,
              key, return_randomness: bool = False):
    """Encrypt plaintext coefficients (..., phi); leading batch dims get
    independent randomness in ONE dispatch (the offline pipeline encrypts
    whole slot-batch STACKS — `triplets.rs:69-81` amortization)."""
    batch = tuple(pt_coeffs.limbs.shape[1:-1])
    ku, k0, k1 = jax.random.split(key, 3)
    u, u_raw = _sample_ternary(ring, ku, batch)
    e0, e0_raw = _sample_cbd(ring, k0, batch)
    e1, e1_raw = _sample_cbd(ring, k1, batch)
    m = _pt_to_rns(ring, pt_coeffs)
    ct = encrypt_with_randomness_l(ring, pk_a, pk_b, m, u, e0, e1)
    if return_randomness:
        return ct, (u_raw, e0_raw, e1_raw)
    return ct


@_ring_jit(4)
def encrypt_returning_randomness_l(ring, pk_a, pk_b, pt_coeffs: Scalar,
                                   key):
    """`encrypt_l(..., return_randomness=True)` in jittable positional
    form — the ZKPoK prover encrypts U + V ciphertexts per proof batch
    (`zkpok_words.encrypt_and_prove_batch`), which at the production ring
    is ~7 s each eager vs ~0.14 s jitted."""
    return encrypt_l.__wrapped__(ring, pk_a, pk_b, pt_coeffs, key, True)


@_ring_jit(2)
def decrypt_l(ring, sk, ct: CiphertextL) -> Scalar:
    """-> plaintext coefficients as a Scalar (..., phi); leading batch
    dims decrypt stacked ciphertexts (one dispatch on jit-capable rings)."""
    phase = ring.add(ct.c0, ring.mul(ct.c1, sk))
    if hasattr(ring, "phase_to_pt"):
        # device-side exact RNS -> F_l conversion (no host bigint CRT)
        return ring.phase_to_pt(phase)
    if phase.ndim > 2:  # prototype ring: loop leading batch dims
        flat = phase.reshape((-1,) + phase.shape[-2:])
        outs = [Scalar.from_ints(
            [v % L_MOD for v in ring.to_centered_ints(flat[i])]
        ).reshape(1, ring.phi) for i in range(flat.shape[0])]
        return Scalar.concatenate(outs).reshape(*phase.shape[:-2], ring.phi)
    ints = ring.to_centered_ints(phase)
    return Scalar.from_ints([v % L_MOD for v in ints])


@_ring_jit(2)
def add_ct_l(ring, x: CiphertextL, y: CiphertextL) -> CiphertextL:
    return CiphertextL(ring.add(x.c0, y.c0), ring.add(x.c1, y.c1))


@_ring_jit(2)
def add_pt_l(ring, x: CiphertextL, pt_coeffs: Scalar) -> CiphertextL:
    return CiphertextL(ring.add(x.c0, _pt_to_rns(ring, pt_coeffs)), x.c1)


@_ring_jit(2)
def mul_pt_l(ring, x: CiphertextL, pt_coeffs: Scalar) -> CiphertextL:
    m = _pt_to_rns(ring, pt_coeffs)
    return CiphertextL(ring.mul(x.c0, m), ring.mul(x.c1, m))


@_ring_jit(4)
def rerandomize_l(ring, pk_a, pk_b, ct: CiphertextL, key,
                  drown_bits: int | None = None) -> CiphertextL:
    """Drowning: add enc(0) whose noise statistically hides the
    ciphertext's post-product noise (bound ~ 2^sec * E_mult)."""
    if drown_bits is None:
        drown_bits = getattr(ring, "drown_bits", None)
        if drown_bits is not None and not getattr(ring, "budget_ok", True):
            raise ValueError(
                f"RNS basis too small for drowning at this security level: "
                f"log2(q) = {ring.log2_q} < 253 + {drown_bits} + 18; add "
                f"primes (n_q_primes) or lower drown_sec/zk_sec")
    if drown_bits is None:
        # E_mult ~ phi * (t/2) * cbd_k * phi  -> ~ 253 + 2*log2(phi) + 4
        import math

        drown_bits = (ring.drown_sec + 253
                      + 2 * int(math.log2(ring.phi)) + 8)
    batch = tuple(ct.c0.shape[:-2])  # leading dims: independent drownings
    ku, k0, k1 = jax.random.split(key, 3)
    u, _ = _sample_ternary(ring, ku, batch)
    e0 = _sample_wide_uniform(ring, k0, drown_bits, batch)
    e1, _ = _sample_cbd(ring, k1, batch)
    z0 = ring.add(ring.mul(pk_b, u), ring.scalar_mul_t(e0))
    z1 = ring.add(ring.mul(pk_a, u), ring.scalar_mul_t(e1))
    return CiphertextL(ring.add(ct.c0, z0), ring.add(ct.c1, z1))


# -- ciphertext x ciphertext (relinearized) ----------------------------------
# The reference FFI exposes homomorphic ciphertext multiplication with the
# public key (`mp-spdz-rs/src/fhe/ciphertext.rs:121-146`, bridged at
# `src/ffi.rs:118-131`).  LowGear itself never multiplies two ciphertexts,
# but the capability is part of the surface.  TPU-native design: the
# degree-2 tensor product is three pointwise eval-form products; the s^2
# component is relinearized with the RNS-digit key-switching of
# Halevi-Polyakov-Shoup (one digit per RNS prime: D_i(c) = [c*qhat_i^-1]_{q_i}
# lifted back to the full basis, with Sum_i D_i * qhat_i == c (mod q) by CRT).
# Noise: ~ t * v1 * v2 * gamma + L * q_i * t * e * gamma — hundreds of bits
# below the drowning-sized modulus for fresh/lightly-noised operands (the
# intended regime, matching the reference's usage); multiplying a DROWNED
# ciphertext exceeds the budget by design.


@dataclass
class RelinKeyL:
    """Key-switching key for s^2 -> s: row i encrypts qhat_i * s^2 under s
    (b_i + a_i*s = t*e_i + qhat_i*s^2)."""

    b: jnp.ndarray  # (L, L, phi) eval form
    a: jnp.ndarray  # (L, L, phi)


jax.tree_util.register_pytree_node(
    RelinKeyL,
    lambda k: ((k.b, k.a), None),
    lambda aux, ch: RelinKeyL(*ch),
)


@_ring_jit(2)
def gen_relin_key_l(ring, sk, key) -> RelinKeyL:
    """Generate the relinearization key (PowerfulRing rings; requires the
    ring's RNS CRT constants).  One (b_i, a_i) pair per RNS prime, all
    rows generated in ONE batched pass over the digit axis (a per-digit
    Python loop traces an L^2-sized graph — the known XLA:CPU superlinear
    compile pathology)."""
    from ...ops import modular32 as m32

    n_q = len(ring.q_specs)
    s2 = ring.mul(sk, sk)
    ka, ke = jax.random.split(key)
    # uniform a: (L_dig, L, phi) — one randint per prime, batched over digits
    a = jnp.stack(
        [jax.random.randint(jax.random.fold_in(ka, j), (n_q, ring.phi),
                            0, spec.q, jnp.int32).astype(U32)
         for j, spec in enumerate(ring.q_specs)], axis=-2)
    e, _ = _sample_cbd(ring, ke, batch=(n_q,))
    # qhat_i * s^2 in RNS form: qhat_i = q/q_i is divisible by every q_j
    # except q_i, so digit i's row only survives at prime i, scaled by
    # qhat_i mod q_i — a diagonal placement over (digit, prime)
    diag = jnp.stack(
        [m32.mont_mul32(
            spec, s2[..., i, :],
            jnp.full((ring.phi,),
                     U32((ring.q_hat[i] % spec.q) * spec.r % spec.q)))
         for i, spec in enumerate(ring.q_specs)])            # (L, phi)
    idx = jnp.arange(n_q)
    qhat_s2 = jnp.zeros((n_q, n_q, ring.phi), U32).at[idx, idx, :].set(diag)
    b = ring.sub(ring.add(ring.scalar_mul_t(e), qhat_s2),
                 ring.mul(a, sk))
    return RelinKeyL(b, a)


def _rns_digits(ring, c):
    """RNS digit decomposition of an eval-form element (..., L, phi):
    digit i is [c * qhat_i^-1]_{q_i} as an integer polynomial < q_i,
    re-lifted to the full RNS basis in eval form; returns (..., L, L, phi)
    with the digit index at axis -3.  Exact by CRT:
    Sum_i digit_i * qhat_i == c (mod q).

    Digit extraction rides the ring's OWN from_eval (row i inverse-
    transformed at prime i is exactly per-digit extraction) and ONE
    batched to_eval over the digit axis — 2L prime-transforms total; the
    naive per-digit loop traces L^2 transforms and compiles for minutes."""
    from ...ops import modular32 as m32

    rows = [
        m32.mont_mul32(spec, c[..., i, :],
                       jnp.full_like(c[..., i, :],
                                     U32(ring.qhatinv_mont[i])))
        for i, spec in enumerate(ring.q_specs)
    ]
    coeff = ring.from_eval(jnp.stack(rows, axis=-2))  # (..., L, phi)
    digs = jnp.stack(
        [jnp.stack([coeff[..., i, :] % U32(spec_j.q)
                    for spec_j in ring.q_specs], axis=-2)
         for i in range(len(ring.q_specs))], axis=-3)  # (..., L, L, phi)
    return ring.to_eval(digs)


@_ring_jit(3)
def mul_ct_l(ring, rlk: RelinKeyL, x: CiphertextL,
             y: CiphertextL) -> CiphertextL:
    """Homomorphic ciphertext x ciphertext with relinearization
    (`fhe/ciphertext.rs:121-146` `mul_ciphertext` analog)."""
    e0 = ring.mul(x.c0, y.c0)
    e1 = ring.add(ring.mul(x.c0, y.c1), ring.mul(x.c1, y.c0))
    e2 = ring.mul(x.c1, y.c1)
    digits = _rns_digits(ring, e2)                     # (..., L, L, phi)
    c0 = ring.add(e0, _sum_digit_axis(ring, ring.mul(digits, rlk.b)))
    c1 = ring.add(e1, _sum_digit_axis(ring, ring.mul(digits, rlk.a)))
    return CiphertextL(c0, c1)


def _sum_digit_axis(ring, x):
    """Modular tree-sum over the digit axis (-3): log2(L) ring adds
    instead of an L-long sequential loop (compile-size control)."""
    while x.shape[-3] > 1:
        half = x.shape[-3] // 2
        s = ring.add(x[..., :half, :, :], x[..., half:2 * half, :, :])
        if x.shape[-3] % 2:
            s = jnp.concatenate([s, x[..., 2 * half:, :, :]], axis=-3)
        x = s
    return x[..., 0, :, :]
