"""Vectorized ZK proof of plaintext knowledge (word-form responses).

The same amortized sigma protocol as the round-1 `zkpok_l` (commit to V
masking encryptions, binary Fiat-Shamir challenge matrix W in {0,1}^(V x U),
respond with z = y + W*m over the integers, verifier re-runs the encryption
equation on the lifted responses) — but ALL big-integer math is replaced by
a fixed 48-bit word-plane representation:

  - a response vector is an int64 array (..., phi, W) of signed base-2^48
    digits (lazy: digits may exceed 2^47 after accumulation; magnitudes stay
    < 2^55 so int64 matmuls are exact);
  - the prover's z = y + W @ m is ONE numpy int64 einsum per word plane —
    no Python bigints at any phi;
  - masking vectors are sampled as balanced digits, giving EXACTLY uniform
    values in [-2^(48*W-1), 2^(48*W-1));
  - lifting a word array into the ring's RNS is `ring.lift_words` (modular
    weighted sum, vectorized).

Soundness: 2^-V per proof (binary challenges; V defaults to 128 =
`triplets_l.ZK_ROWS`, matching the reference's sec = 128
NonInteractiveProof).  Zero-knowledge slack: the masking bound B exceeds
the witness contribution by >= 2^zk_sec (zk_sec = 128 on production
rings; the prototype `CyclotomicRing` falls back to 64 via the getattr
default — it is a test harness, not a security surface).  Honest-verifier
statistical distance <= U * bound / B <= 2^-zk_sec.  Reference analog:
`mp-spdz-rs/src/fhe/keys.rs:55-100` (encrypt_and_prove / verify_proof).

Works with both ring backends (`PowerfulRing` eval-form, prototype
`CyclotomicRing`); the only ring surface used is lift_words /
encrypt_with_randomness / add.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ...algebra import limbs as lb
from ...algebra.fields import SCALAR_FIELD
from ...algebra.scalar import Scalar
from ...ops import modular32 as m32
from .bgv_l import (
    CiphertextL,
    encrypt_l,
    encrypt_returning_randomness_l,
    encrypt_with_randomness_l,
)
from .powerful import zk_word_counts

L_MOD = SCALAR_FIELD.modulus
W_PT = 6           # plaintext words: 16 x 16-bit limbs -> [3,3,3,3,3,1]
_HALF_L = L_MOD // 2
U32 = jnp.uint32


def _v_chunk(ring, v: int) -> int:
    """Challenge rows per device dispatch, sized to the ring: target
    ~350 MB of (chunk, L, phi) u32 ciphertext pair per dispatch (one
    (V=128, L, phi) array at the production ring is ~2.9 GB; at the
    medium/test rings the whole proof fits in one dispatch and chunking
    only multiplies dispatch+readback round trips)."""
    row_bytes = len(ring.q_specs) * ring.phi * 4 * 2
    c = max(1, min(v, (350 << 20) // row_bytes))
    # power of two: chunk sizes that don't divide V would compile several
    # tail shapes (V is 128 or a small power of two in practice)
    return 1 << (c.bit_length() - 1)


# ---------------------------------------------------------------------------
# word-plane helpers
# ---------------------------------------------------------------------------


def scalar_to_words(pt: Scalar, centered: bool = True) -> np.ndarray:
    """Scalar (...,) -> centered signed word planes (..., W_PT) int64."""
    canon = np.asarray(jax.device_get(
        lb.from_mont(SCALAR_FIELD, pt.limbs))).astype(np.int64)  # (16, ...)
    groups = [canon[3 * w:3 * w + 3] for w in range(5)] + [canon[15:16]]
    words = np.stack(
        [sum(g[i] << (16 * i) for i in range(g.shape[0])) for g in groups],
        axis=-1)  # (..., 6)
    if centered:
        # v > l/2 -> v - l (float64 classification: both branches satisfy
        # the bound near the threshold, so rare misclassification is safe)
        scale = np.float64(2.0) ** (48 * np.arange(W_PT))
        approx = (words.astype(np.float64) * scale).sum(-1)
        l_words = _int_to_words(L_MOD, W_PT)
        words = np.where(approx[..., None] > float(_HALF_L), words - l_words,
                         words)
    return words


def _int_to_words(v: int, n: int) -> np.ndarray:
    out = np.zeros(n, dtype=np.int64)
    for w in range(n):
        out[w] = (v >> (48 * w)) & ((1 << 48) - 1)
    return out


def small_to_words(arr: np.ndarray) -> np.ndarray:
    """Small signed ints (...,) -> single-word planes (..., 1)."""
    return np.asarray(arr, dtype=np.int64)[..., None]


def sample_balanced_words(rng, shape: tuple, n_words: int) -> np.ndarray:
    """Uniform over [-2^(48n-1), 2^(48n-1)) as balanced base-2^48 digits
    (independent digits in [-2^47, 2^47) == exactly uniform value)."""
    n = int(np.prod(shape)) * n_words
    raw = np.frombuffer(rng.bytes(8 * n), dtype=np.uint64).astype(np.int64)
    digits = (raw & ((1 << 48) - 1)) - (1 << 47)
    return digits.reshape(shape + (n_words,))


def words_magnitude(words: np.ndarray) -> np.ndarray:
    """Approximate |value| as float64 (relative error < 2^-50; used for
    bound checks whose bounds already carry 2^zk_sec slack)."""
    scale = np.float64(2.0) ** (48 * np.arange(words.shape[-1]))
    return np.abs((words.astype(np.float64) * scale).sum(-1))


# Exact-lift digit range: `PowerfulRing.lift_words` biases each signed
# digit by 2^55 into uint64, so digits < -2^55 would wrap and lift to a
# DIFFERENT ring element.  Honest (normalized) digits are <= ~2^48; the
# verifier rejects anything at or beyond 2^54 so every accepted digit
# lifts exactly with a 2x margin.
DIGIT_BOUND = 1 << 54


def normalize_words(words: np.ndarray) -> np.ndarray:
    """Carry-propagate lazy signed base-2^48 digits into balanced form:
    digits 0..W-2 land in [-2^47, 2^47), the remainder lands in the last
    word.  Value-preserving.  Keeps honest response digits ~2^48 regardless
    of the number of amortized ciphertexts U (the raw z = y + W@m digits
    grow as U * 2^48 and would escape the exact device-lift range
    [-2^55, ...) once U >= ~128)."""
    w = words.shape[-1]
    out = np.empty_like(words)
    carry = np.zeros(words.shape[:-1], dtype=np.int64)
    half = np.int64(1) << 47
    mask = (np.int64(1) << 48) - 1
    for i in range(w - 1):
        t = words[..., i] + carry
        lo = ((t + half) & mask) - half
        out[..., i] = lo
        carry = (t - lo) >> 48  # exact: t - lo is a multiple of 2^48
    out[..., -1] = words[..., -1] + carry
    return out


# ---------------------------------------------------------------------------
# the proof
# ---------------------------------------------------------------------------


@dataclass
class CiphertextWithProofW:
    cts: CiphertextL    # (U, L, phi)
    comm: CiphertextL   # (V, L, phi)
    z: np.ndarray       # (V, phi, Wz) int64
    zu: np.ndarray      # (V, phi, Wu)
    ze0: np.ndarray
    ze1: np.ndarray


def _statement_tag(ring, pk_a, pk_b, v: int, u: int) -> bytes:
    """Bind the Fiat-Shamir challenge to the FULL statement: both public
    keys, the ring identity/parameters, and the proof dimensions (V, U) —
    not only the ciphertexts.  Matches MP-SPDZ's NonInteractiveProof
    context binding (`fhe/keys.rs:55-100`); prevents transplanting a proof
    under a different key or ring."""
    h = hashlib.sha3_256()
    qs = ",".join(str(s.q) for s in ring.q_specs)
    h.update(
        f"ark-mpc-tpu-zkpok-v1|{type(ring).__name__}|m={ring.m}"
        f"|phi={ring.phi}|slots={ring.slots}|k={ring.cbd_k}"
        f"|q={qs}|V={v}|U={u}".encode())
    for a in (pk_a, pk_b):
        h.update(np.asarray(jax.device_get(a)).tobytes())
    return h.digest()


def _challenge(cts: CiphertextL, comm: CiphertextL, v: int, u: int,
               tag: bytes):
    h = hashlib.sha3_256(tag)
    for a in (cts.c0, cts.c1, comm.c0, comm.c1):
        h.update(np.asarray(jax.device_get(a)).tobytes())
    seed = h.digest()
    n_blocks = -(-(v * u) // 256)
    raw = b"".join(
        hashlib.sha3_256(seed + ctr.to_bytes(4, "little")).digest()
        for ctr in range(n_blocks))
    bits = np.unpackbits(np.frombuffer(raw, np.uint8), bitorder="little")
    return bits[: v * u].astype(np.int64).reshape(v, u)


def encrypt_and_prove_batch(ring, pk_a, pk_b, pt_coeff_list, key,
                            v: int = 128, sec: int | None = None,
                            host_rng=None) -> CiphertextWithProofW:
    """Encrypt U plaintext-coefficient Scalars (phi,) and prove plaintext
    knowledge, amortized over the batch."""
    if host_rng is None:
        from ...utils.csprng import default_crypto_rng

        host_rng = default_crypto_rng()
    sec = sec if sec is not None else getattr(ring, "zk_sec", 64)
    u_count = len(pt_coeff_list)
    phi = ring.phi
    k = ring.cbd_k
    wz, wu = zk_word_counts(sec, max(u_count, 2), k)

    # ONE batched encryption of the whole (U, phi) plaintext stack — the
    # per-ciphertext loop was U eager dispatches (U+V dominate proof cost)
    pts = Scalar(jnp.stack([p.reshape(phi).limbs for p in pt_coeff_list],
                           axis=1))                         # (U, phi)
    key, sub = jax.random.split(key)
    cts, (u_raw, e0_raw, e1_raw) = encrypt_returning_randomness_l(
        ring, pk_a, pk_b, pts, sub)

    m_words = scalar_to_words(pts)                          # (U, phi, 6)
    u_words = small_to_words(np.asarray(jax.device_get(u_raw)))
    e0_words = small_to_words(np.asarray(jax.device_get(e0_raw)))
    e1_words = small_to_words(np.asarray(jax.device_get(e1_raw)))

    y = sample_balanced_words(host_rng, (v, phi), wz)
    su = sample_balanced_words(host_rng, (v, phi), wu)
    se0 = sample_balanced_words(host_rng, (v, phi), wu)
    se1 = sample_balanced_words(host_rng, (v, phi), wu)

    # commitment encryptions streamed in V-chunks: at the production ring
    # one (V, L, phi) array is ~2.9 GB — the full-width encryption would
    # hold several at once.  Chunk results land on HOST.
    cc0, cc1 = [], []
    vc = _v_chunk(ring, v)
    for beg in range(0, v, vc):
        end = min(beg + vc, v)
        ch = encrypt_with_randomness_l(
            ring, pk_a, pk_b,
            ring.lift_words(y[beg:end]), ring.lift_words(su[beg:end]),
            ring.lift_words(se0[beg:end]), ring.lift_words(se1[beg:end]))
        cc0.append(np.asarray(jax.device_get(ch.c0)))
        cc1.append(np.asarray(jax.device_get(ch.c1)))
    comm = CiphertextL(np.concatenate(cc0), np.concatenate(cc1))

    tag = _statement_tag(ring, pk_a, pk_b, v, u_count)
    w = _challenge(cts, comm, v, u_count, tag)              # (V, U) binary

    def respond(mask, witness, w_mask):
        # (V, U) @ (U, phi, W) -> (V, phi, W), padded to the mask's width
        acc = np.einsum("vu,upw->vpw", w, witness).astype(np.int64)
        if acc.shape[-1] < w_mask:
            acc = np.pad(acc, ((0, 0), (0, 0), (0, w_mask - acc.shape[-1])))
        # balanced-digit form: keeps every digit inside the verifier's
        # DIGIT_BOUND (and the exact device-lift range) for any U
        return normalize_words(mask + acc)

    return CiphertextWithProofW(
        cts, comm,
        respond(y, m_words, wz),
        respond(su, u_words, wu),
        respond(se0, e0_words, wu),
        respond(se1, e1_words, wu),
    )


def verify_proof(ring, pk_a, pk_b, proof: CiphertextWithProofW,
                 sec: int | None = None, v: int = 128,
                 expected_u: int | None = None) -> bool:
    """Verify an amortized proof.  `v` is the REQUIRED challenge-row count
    (soundness 2^-v) — enforced against the proof, never read from it: a
    malicious prover shipping fewer rows than the protocol demands is
    rejected outright.  `expected_u` pins the ciphertext count when the
    caller knows it (it always should on a protocol exchange)."""
    sec = sec if sec is not None else getattr(ring, "zk_sec", 64)
    phi = ring.phi
    u_count = int(proof.cts.c0.shape[0])
    if expected_u is not None and u_count != expected_u:
        return False
    k = ring.cbd_k
    wz, wu = zk_word_counts(sec, max(u_count, 2), k)
    ct_tail = tuple(proof.cts.c0.shape[1:])  # (L, phi) / ring layout
    if (proof.z.shape != (v, phi, wz)
            or proof.zu.shape != (v, phi, wu)
            or proof.ze0.shape != (v, phi, wu)
            or proof.ze1.shape != (v, phi, wu)
            or tuple(proof.cts.c1.shape) != (u_count,) + ct_tail
            or tuple(proof.comm.c0.shape) != (v,) + ct_tail
            or tuple(proof.comm.c1.shape) != (v,) + ct_tail):
        return False
    # per-digit exact-lift range (see DIGIT_BOUND): the value-level bound
    # below cannot see wrapping digit patterns that cancel in float64
    for arr in (proof.z, proof.zu, proof.ze0, proof.ze1):
        if int(np.abs(arr).max()) >= DIGIT_BOUND:
            return False
    b_y = 2.0 ** (48 * wz - 1)
    b_u = 2.0 ** (48 * wu - 1)
    eps = 1.0 + 2.0 ** -40
    if words_magnitude(proof.z).max() > (b_y + u_count * float(_HALF_L)) * eps:
        return False
    if words_magnitude(proof.zu).max() > (b_u + u_count) * eps:
        return False
    if max(words_magnitude(proof.ze0).max(),
           words_magnitude(proof.ze1).max()) > (b_u + u_count * k) * eps:
        return False

    tag = _statement_tag(ring, pk_a, pk_b, v, u_count)
    w = _challenge(proof.cts, proof.comm, v, u_count, tag)
    cts_c0 = jnp.asarray(proof.cts.c0)
    cts_c1 = jnp.asarray(proof.cts.c1)
    comm_c0 = np.asarray(jax.device_get(proof.comm.c0))
    comm_c1 = np.asarray(jax.device_get(proof.comm.c1))
    # stream the verification equation in V-chunks (memory: see prover)
    vc = _v_chunk(ring, v)
    for beg in range(0, v, vc):
        end = min(beg + vc, v)
        lhs = encrypt_with_randomness_l(
            ring, pk_a, pk_b,
            ring.lift_words(proof.z[beg:end]),
            ring.lift_words(proof.zu[beg:end]),
            ring.lift_words(proof.ze0[beg:end]),
            ring.lift_words(proof.ze1[beg:end]))
        w_dev = jnp.asarray(w[beg:end], jnp.uint32)
        eq = _fold_check(ring, w_dev, cts_c0, cts_c1,
                         jnp.asarray(comm_c0[beg:end]),
                         jnp.asarray(comm_c1[beg:end]),
                         lhs.c0, lhs.c1)
        if not bool(eq):
            return False
    return True


@partial(jax.jit, static_argnums=0)
def _fold_check(ring, w_u32, cts_c0, cts_c1, comm_c0, comm_c1, lhs0, lhs1):
    """comm + W @ cts == lhs for one V-chunk, ONE dispatch."""
    fold0, fold1 = _fold_cts.__wrapped__(ring, w_u32, cts_c0, cts_c1)
    rhs0 = ring.add(comm_c0, fold0)
    rhs1 = ring.add(comm_c1, fold1)
    return jnp.all(lhs0 == rhs0) & jnp.all(lhs1 == rhs1)


@partial(jax.jit, static_argnums=0)
def _fold_cts(ring, w_u32, c0, c1):
    """W @ ct-stack per RNS prime in ONE dispatch.  Exact integer path:
    residues split into 16-bit halves, selected halves accumulated as raw
    u32 sums under a `lax.scan` over U (overflow-free for U <= 2^16), then
    reduced mod each prime once.  The earlier form unrolled U x L modular
    select-adds — at U >= ~130 that graph segfaulted XLA:CPU (the repo's
    known superlinear-unroll pathology); an even earlier f32-matmul form
    was exact on CPU but WRONG on TPU (bf16 downcast of matmul inputs)."""
    v = w_u32.shape[0]
    u_count = w_u32.shape[1]
    assert u_count <= (1 << 16), "fold accumulator overflows past U = 2^16"
    shape = (v,) + c0.shape[1:]                       # (V, L, phi)

    def fold(arr):
        lo = arr & jnp.uint32(0xFFFF)
        hi = arr >> 16

        def body(acc, xs):
            w_col, lo_u, hi_u = xs                    # (V,), (L, phi)
            sel = (w_col == 1)[:, None, None]
            zero = jnp.uint32(0)
            return (acc[0] + jnp.where(sel, lo_u[None], zero),
                    acc[1] + jnp.where(sel, hi_u[None], zero)), None

        init = (jnp.zeros(shape, jnp.uint32), jnp.zeros(shape, jnp.uint32))
        (slo, shi), _ = jax.lax.scan(body, init, (w_u32.T, lo, hi))
        out = []
        for i, spec in enumerate(ring.q_specs):
            l_r = slo[:, i, :] % U32(spec.q)
            h_r = shi[:, i, :] % U32(spec.q)
            h_shift = m32.mont_mul32(
                spec, m32.to_mont32(spec, h_r),
                jnp.full_like(h_r, U32(1 << 16)))
            out.append(m32.add32(spec, h_shift, l_r))
        return jnp.stack(out, axis=-2)

    return fold(c0), fold(c1)


# ---------------------------------------------------------------------------
# wire serialization (plain numpy arrays; the messages codec handles dtypes)
# ---------------------------------------------------------------------------


def proof_to_arrays(proof: CiphertextWithProofW) -> list:
    g = lambda x: np.asarray(jax.device_get(x))  # noqa: E731
    return [g(proof.cts.c0), g(proof.cts.c1), g(proof.comm.c0),
            g(proof.comm.c1), proof.z, proof.zu, proof.ze0, proof.ze1]


def proof_from_arrays(items: list) -> CiphertextWithProofW:
    c0, c1, a0, a1, z, zu, ze0, ze1 = items
    return CiphertextWithProofW(
        CiphertextL(jnp.asarray(c0), jnp.asarray(c1)),
        # comm stays HOST-side: verify streams it in V-chunks (the full
        # (V, L, phi) pair is ~6 GB at the production ring)
        CiphertextL(np.asarray(a0), np.asarray(a1)),
        np.asarray(z, np.int64), np.asarray(zu, np.int64),
        np.asarray(ze0, np.int64), np.asarray(ze1, np.int64),
    )
