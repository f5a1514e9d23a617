"""Zero-knowledge proof of plaintext knowledge for BGV ciphertext batches.

Analog of MP-SPDZ's `encrypt_and_prove_batch` / `verify_proof_of_knowledge`
(`mp-spdz-rs/src/ffi.rs:155-166`, `fhe/keys.rs:55-160`): the amortized
SPDZ/TopGear-style sigma protocol, made non-interactive with Fiat-Shamir.
LowGear gates every exchanged `enc(a)` on this proof so a malicious party
cannot submit malformed ciphertexts (`lowgear/triplets.rs:69-81`).

Protocol (binary challenge matrix, statistical blinding by 2^sec slack):
  statement:  C_i = Enc(m_i; u_i, e0_i, e1_i), i < U, with
              ||m||_inf <= t/2 and ternary/CBD randomness.
  prover:     sample maskings y_k (|y| <= 2^sec * (t/2) * U) and masking
              randomness s*_k (2^sec * bound * U); A_k = Enc(y_k; s*_k).
              W = H(C, A) in {0,1}^{V x U};
              z_k = y_k + sum_i W_ki m_i   (over the integers)
              zu/ze0/ze1 similarly over the randomness.
  verifier:   recompute W; check the bounds; check
              Enc(z_k; zu_k, ze0_k, ze1_k) == A_k + sum_i W_ki C_i  in R_q^2.

Soundness ~2^-V per batch; zero-knowledge is statistical (the 2^sec slack
drowns the witness contribution).  Response coefficients are big integers
handled host-side as numpy object arrays (the proof is an offline-phase,
per-batch cost); ciphertext-side algebra runs in RNS on device.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ...ops import modular32 as m32
from . import rns
from .bgv import Ciphertext, encrypt, encrypt_with_randomness
from .params import BgvParams

U32 = jnp.uint32


@dataclass
class CiphertextWithProof:
    """Batch of ciphertexts + proof (`CiphertextPoK` analog)."""

    cts: Ciphertext          # (U, L, N) arrays
    comm: Ciphertext         # A_k commitments, (V, L, N)
    z: np.ndarray            # (V, N) object ints — plaintext responses
    zu: np.ndarray           # (V, N) int64 — ternary-randomness responses
    ze0: np.ndarray          # (V, N) int64
    ze1: np.ndarray          # (V, N) int64


def _lift_object_to_rns(params: BgvParams, arr) -> jnp.ndarray:
    """(..., N) python-int numpy array -> (..., L, N) uint32 residues."""
    out = []
    for spec in (params.q_specs):
        out.append(np.asarray(
            np.mod(arr, spec.q), dtype=np.uint32))
    return jnp.asarray(np.stack(out, axis=-2))


def _challenge_matrix(params: BgvParams, cts: Ciphertext, comm: Ciphertext,
                      v: int, u: int, pk_a=None, pk_b=None) -> np.ndarray:
    """Fiat-Shamir binary challenge W in {0,1}^{V x U}, bound to the full
    statement (public keys + ring params + dimensions, not only the
    ciphertexts — MP-SPDZ NonInteractiveProof-style context binding)."""
    h = hashlib.sha3_256()
    qs = ",".join(str(s.q) for s in params.q_specs)
    h.update(f"ark-mpc-tpu-zkpok-proto-v1|n={params.n}|t={params.t}"
             f"|k={params.cbd_k}|q={qs}|V={v}|U={u}".encode())
    for a in (pk_a, pk_b):
        if a is not None:
            h.update(np.asarray(jax.device_get(a)).tobytes())
    for a in (cts.c0, cts.c1, comm.c0, comm.c1):
        h.update(np.asarray(jax.device_get(a)).tobytes())
    seed = h.digest()
    bits = []
    ctr = 0
    while len(bits) < v * u:
        d = hashlib.sha3_256(seed + ctr.to_bytes(4, "little")).digest()
        for byte in d:
            for j in range(8):
                bits.append((byte >> j) & 1)
        ctr += 1
    return np.array(bits[: v * u], dtype=np.int64).reshape(v, u)


def _centered(params: BgvParams, pt: np.ndarray) -> np.ndarray:
    """uint32 slots/coeffs < t -> centered signed python ints."""
    pt = np.asarray(pt, dtype=np.int64)
    half = params.t // 2
    return np.where(pt > half, pt - params.t, pt).astype(object)


def encrypt_and_prove_batch(params: BgvParams, pk_a, pk_b, pt_batch,
                            key, sec: int = 40, v: int = 32,
                            host_rng: np.random.Generator | None = None
                            ) -> CiphertextWithProof:
    """Encrypt a batch of U plaintext coefficient vectors and prove
    knowledge (`fhe/keys.rs` encrypt_and_prove_batch; sec mirrors the
    reference's statistical parameter)."""
    if host_rng is None:
        from ...utils.csprng import default_crypto_rng

        host_rng = default_crypto_rng()
    pt_batch = np.asarray(pt_batch, dtype=np.uint32)
    u_count, n = pt_batch.shape
    tau = params.t // 2
    k = params.cbd_k

    cts, (u_raw, e0_raw, e1_raw) = encrypt(
        params, pk_a, pk_b, jnp.asarray(pt_batch), key,
        return_randomness=True)
    m_signed = _centered(params, pt_batch)  # (U, N) object

    b_plain = (1 << sec) * tau * u_count
    b_u = (1 << sec) * 1 * u_count
    b_e = (1 << sec) * k * u_count
    # maskings (host): y big ints; randomness maskings fit int64 for sec<=40
    y = np.array(
        [[int(host_rng.integers(-b_plain, b_plain + 1, dtype=np.int64))
          if b_plain < (1 << 62) else
          int.from_bytes(host_rng.bytes(16), "little") % (2 * b_plain + 1) - b_plain
          for _ in range(n)] for _ in range(v)], dtype=object)
    su = host_rng.integers(-b_u, b_u + 1, size=(v, n)).astype(np.int64)
    se0 = host_rng.integers(-b_e, b_e + 1, size=(v, n)).astype(np.int64)
    se1 = host_rng.integers(-b_e, b_e + 1, size=(v, n)).astype(np.int64)

    comm = encrypt_with_randomness(
        params, pk_a, pk_b,
        _lift_object_to_rns(params, y),
        _lift_object_to_rns(params, su.astype(object)),
        _lift_object_to_rns(params, se0.astype(object)),
        _lift_object_to_rns(params, se1.astype(object)),
    )

    w = _challenge_matrix(params, cts, comm, v, u_count,
                          pk_a, pk_b)  # (V, U)

    u_np = np.asarray(jax.device_get(u_raw), dtype=np.int64)
    e0_np = np.asarray(jax.device_get(e0_raw), dtype=np.int64)
    e1_np = np.asarray(jax.device_get(e1_raw), dtype=np.int64)
    z = y + w @ m_signed
    zu = su + w @ u_np
    ze0 = se0 + w @ e0_np
    ze1 = se1 + w @ e1_np
    return CiphertextWithProof(cts, comm, z, zu, ze0, ze1)


_Z_BYTES = 16  # fixed-width signed coefficient encoding on the wire


def proof_to_arrays(proof: CiphertextWithProof) -> list:
    """Wire form: [c0, c1, A0, A1, z_bytes, zu, ze0, ze1]."""
    v, n = proof.z.shape
    zb = b"".join(
        int(proof.z[i, j]).to_bytes(_Z_BYTES, "little", signed=True)
        for i in range(v) for j in range(n)
    )
    import jax as _jax

    g = lambda x: np.asarray(_jax.device_get(x))  # noqa: E731
    return [g(proof.cts.c0), g(proof.cts.c1), g(proof.comm.c0),
            g(proof.comm.c1), zb,
            np.asarray(proof.zu, np.int64),
            np.asarray(proof.ze0, np.int64),
            np.asarray(proof.ze1, np.int64)]


def proof_from_arrays(items: list, v: int, n: int) -> CiphertextWithProof:
    c0, c1, a0, a1, zb, zu, ze0, ze1 = items
    z = np.empty((v, n), dtype=object)
    off = 0
    for i in range(v):
        for j in range(n):
            z[i, j] = int.from_bytes(zb[off : off + _Z_BYTES], "little",
                                     signed=True)
            off += _Z_BYTES
    return CiphertextWithProof(
        Ciphertext(jnp.asarray(c0), jnp.asarray(c1)),
        Ciphertext(jnp.asarray(a0), jnp.asarray(a1)),
        z, zu, ze0, ze1,
    )


def verify_proof(params: BgvParams, pk_a, pk_b,
                 proof: CiphertextWithProof, sec: int = 40) -> bool:
    """`verify_proof_of_knowledge` analog: bounds + the linear encryption
    relation for every challenge row."""
    v, n = proof.z.shape
    u_count = proof.cts.c0.shape[0]
    tau = params.t // 2
    k = params.cbd_k
    b_plain = (1 << sec) * tau * u_count
    b_u = (1 << sec) * u_count
    b_e = (1 << sec) * k * u_count

    # 1. bounds (slack: masking bound + witness contribution)
    if int(np.max(np.abs(proof.z))) > b_plain + u_count * tau:
        return False
    if (np.abs(proof.zu).max() > b_u + u_count
            or np.abs(proof.ze0).max() > b_e + u_count * k
            or np.abs(proof.ze1).max() > b_e + u_count * k):
        return False

    # 2. recompute the challenge
    w = _challenge_matrix(params, proof.cts, proof.comm, v, u_count,
                          pk_a, pk_b)

    # 3. Enc(z; zu, ze0, ze1) == A + W * C  (in R_q x R_q)
    lhs = encrypt_with_randomness(
        params, pk_a, pk_b,
        _lift_object_to_rns(params, proof.z),
        _lift_object_to_rns(params, proof.zu.astype(object)),
        _lift_object_to_rns(params, proof.ze0.astype(object)),
        _lift_object_to_rns(params, proof.ze1.astype(object)),
    )
    rhs0 = proof.comm.c0
    rhs1 = proof.comm.c1
    w_dev = jnp.asarray(w)
    for i in range(u_count):
        sel = (w_dev[:, i] == 1)[:, None, None]
        rhs0 = jnp.where(sel, rns.rns_add(params, rhs0,
                                          proof.cts.c0[i][None]), rhs0)
        rhs1 = jnp.where(sel, rns.rns_add(params, rhs1,
                                          proof.cts.c1[i][None]), rhs1)
    ok0 = bool(jnp.all(lhs.c0 == rhs0))
    ok1 = bool(jnp.all(lhs.c1 == rhs1))
    return ok0 and ok1
