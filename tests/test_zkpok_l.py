"""l-field ZKPoK tests (completeness + rejection)."""

import jax
import numpy as np

from ark_mpc_tpu.algebra.scalar import Scalar
from ark_mpc_tpu.offline.bgv.bgv_l import (
    decode_slots_l,
    decrypt_l,
    default_ring,
    encode_slots_l,
    keygen_l,
)
from ark_mpc_tpu.offline.bgv.zkpok_l import (
    CiphertextL,
    CiphertextWithProofL,
    encrypt_and_prove_batch_l,
    proof_from_arrays_l,
    proof_to_arrays_l,
    verify_proof_l,
)

RING = default_ring()
KP = keygen_l(RING, jax.random.PRNGKey(0))
rng = np.random.default_rng(13)

import pytest

pytestmark = pytest.mark.slow  # full BGV/ZK pipeline: minutes on CPU


def _prove(u=2):
    slots = [Scalar.random(RING.phi, rng) for _ in range(u)]
    coeffs = [encode_slots_l(RING, s) for s in slots]
    proof = encrypt_and_prove_batch_l(
        RING, KP.pk_a, KP.pk_b, coeffs, jax.random.PRNGKey(7),
        v=16, host_rng=np.random.default_rng(8))
    return slots, proof


def test_zkpok_l_completeness_roundtrip_and_serde():
    slots, proof = _prove()
    assert verify_proof_l(RING, KP.pk_a, KP.pk_b, proof)
    # wire round-trip verifies too
    back = proof_from_arrays_l(proof_to_arrays_l(proof), 16, RING.phi)
    assert verify_proof_l(RING, KP.pk_a, KP.pk_b, back)
    # proven ciphertexts decrypt to the committed slots
    for i, s in enumerate(slots):
        ct = CiphertextL(proof.cts.c0[i], proof.cts.c1[i])
        got = decode_slots_l(RING, decrypt_l(RING, KP.sk, ct))
        assert got.to_ints() == s.to_ints()


def test_zkpok_l_rejects_tampering():
    _, proof = _prove()
    bad = CiphertextWithProofL(
        CiphertextL(proof.cts.c0.at[0, 0, 0].add(1), proof.cts.c1),
        proof.comm, proof.z, proof.zu, proof.ze0, proof.ze1)
    assert not verify_proof_l(RING, KP.pk_a, KP.pk_b, bad)
