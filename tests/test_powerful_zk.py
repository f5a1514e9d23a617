"""Word-form amortized ZKPoK over the production-path BGV ring.

Split from tests/test_powerful.py so the xdist fast tier schedules the
proof-heavy tests (prove/verify compiles dominate a worker) on their own
worker (module = distribution unit under --dist loadfile).  Same tiny
ring/keypair setup; reference analogs `fhe/keys.rs:55-100`.
"""

import random

import jax
import numpy as np
import pytest

from ark_mpc_tpu.algebra.fields import CURVE25519_ORDER as L
from ark_mpc_tpu.algebra.scalar import Scalar
from ark_mpc_tpu.offline.bgv.bgv_l import (
    CiphertextL,
    decode_slots_l,
    decrypt_l,
    encode_slots_l,
    keygen_l,
)
from ark_mpc_tpu.offline.bgv.powerful import PowerfulRing
from ark_mpc_tpu.offline.bgv.zkpok_words import (
    encrypt_and_prove_batch,
    proof_from_arrays,
    proof_to_arrays,
    verify_proof,
)

rng = random.Random(91)
RING = PowerfulRing(35)
KP = keygen_l(RING, jax.random.PRNGKey(0))


def rand_slots(ring=RING):
    return Scalar.from_ints([rng.randrange(L) for _ in range(ring.slots)])





def _proof_copy(proof):
    """Deep copy for mutation tests (proof_to_arrays passes the response
    arrays by reference; the module-level proof is shared)."""
    items = [np.array(a, copy=True) for a in proof_to_arrays(proof)]
    return proof_from_arrays(items)

_PROVE_CACHE = {}


def _prove(v=64):
    # one proof per module run, shared across the tamper/transplant tests —
    # tests that mutate do so on proof_to_arrays/from_arrays COPIES
    if v not in _PROVE_CACHE:
        host = np.random.default_rng(7)
        pts = [encode_slots_l(RING, rand_slots()) for _ in range(3)]
        proof = encrypt_and_prove_batch(
            RING, KP.pk_a, KP.pk_b, pts, jax.random.PRNGKey(8), v=v,
            host_rng=host
        )
        _PROVE_CACHE[v] = (pts, proof)
    return _PROVE_CACHE[v]


@pytest.mark.slow
def test_zkpok_words_verifies():
    pts, proof = _prove()
    assert proof.z.shape[0] == 64  # soundness 2^-64
    assert verify_proof(RING, KP.pk_a, KP.pk_b, proof, v=64)
    # the proven ciphertexts decrypt to the committed plaintexts
    got = decode_slots_l(
        RING,
        decrypt_l(RING, KP.sk, CiphertextL(proof.cts.c0[0], proof.cts.c1[0])),
    )
    assert got.to_ints() == decode_slots_l(RING, pts[0]).to_ints()


def test_zkpok_words_wire_roundtrip():
    _, proof = _prove(v=16)
    p2 = proof_from_arrays(proof_to_arrays(proof))
    assert verify_proof(RING, KP.pk_a, KP.pk_b, p2, v=16)


@pytest.mark.parametrize(
    "attr,idx",
    [("z", (0, 0, 0)), ("zu", (1, 1, 0)), ("ze0", (2, 0, 0)), ("ze1", (3, 2, 0))],
)
def test_zkpok_words_tamper_rejected(attr, idx):
    _, proof = _prove(v=16)
    bad = _proof_copy(proof)
    getattr(bad, attr)[idx] += 1
    assert not verify_proof(RING, KP.pk_a, KP.pk_b, bad, v=16)


def test_zkpok_words_oversize_response_rejected():
    """Responses exceeding the ZK bound must fail the magnitude check even
    if the encryption equation is forced to hold (soundness-side bound)."""
    _, proof = _prove(v=16)
    bad = _proof_copy(proof)
    bad.z[0, 0, -1] = 1 << 62
    assert not verify_proof(RING, KP.pk_a, KP.pk_b, bad, v=16)


def test_zkpok_words_short_proof_rejected():
    """A malicious prover shipping fewer challenge rows than the protocol
    requires (shrinking soundness to 2^-rows) must be rejected: V is pinned
    by the verifier, never read from the proof."""
    from ark_mpc_tpu.offline.bgv.zkpok_words import CiphertextWithProofW

    _, proof = _prove(v=16)
    short = CiphertextWithProofW(
        proof.cts,
        CiphertextL(
            np.asarray(jax.device_get(proof.comm.c0))[:1],
            np.asarray(jax.device_get(proof.comm.c1))[:1],
        ),
        proof.z[:1], proof.zu[:1], proof.ze0[:1], proof.ze1[:1],
    )
    assert not verify_proof(RING, KP.pk_a, KP.pk_b, short, v=16)


def test_zkpok_words_wrong_u_rejected():
    _, proof = _prove(v=16)
    assert verify_proof(RING, KP.pk_a, KP.pk_b, proof, v=16, expected_u=3)
    assert not verify_proof(RING, KP.pk_a, KP.pk_b, proof, v=16,
                            expected_u=2)


def test_zkpok_words_transplanted_pk_rejected():
    """The Fiat-Shamir challenge binds the public keys: a proof valid under
    KP must not verify under a different keypair even though the encryption
    relation is key-homomorphic in neither direction we check here — the
    challenge itself changes (VERDICT r3 item 7)."""
    _, proof = _prove(v=16)
    kp2 = keygen_l(RING, jax.random.PRNGKey(99))
    assert not verify_proof(RING, kp2.pk_a, kp2.pk_b, proof, v=16)


def test_zkpok_words_wrapping_digit_rejected():
    """Digits at/below -2^54 can wrap the biased uint64 device lift to a
    DIFFERENT ring element while the float64 value-magnitude check still
    passes.  The per-digit range check must reject them (ADVICE r3)."""
    _, proof = _prove(v=16)
    bad = _proof_copy(proof)
    # value-preserving digit rewrite: d0 -= 2^56, d1 += 2^8 — same integer,
    # same float magnitude, but digit 0 is below -2^55 where the biased
    # uint64 lift wraps; DIGIT_BOUND (2^54) must reject it before the lift
    bad.z[0, 0, 0] -= np.int64(1) << 56
    bad.z[0, 0, 1] += np.int64(1) << 8
    assert not verify_proof(RING, KP.pk_a, KP.pk_b, bad, v=16)


def test_zkpok_words_large_u_normalized():
    """U >= 128 amortized ciphertexts: raw responses z = y + W@m have
    digits up to U * 2^48 (outside the exact lift range); the prover's
    balanced-digit normalization keeps honest proofs verifying."""
    from ark_mpc_tpu.offline.bgv.zkpok_words import DIGIT_BOUND

    host = np.random.default_rng(17)
    pts = [encode_slots_l(RING, rand_slots()) for _ in range(130)]
    proof = encrypt_and_prove_batch(
        RING, KP.pk_a, KP.pk_b, pts, jax.random.PRNGKey(18), v=8,
        host_rng=host
    )
    assert int(np.abs(proof.z).max()) < DIGIT_BOUND
    assert verify_proof(RING, KP.pk_a, KP.pk_b, proof, v=8, expected_u=130)


