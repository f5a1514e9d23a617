"""ZKPoK completeness + soundness smoke tests."""

import jax
import jax.numpy as jnp
import numpy as np

from ark_mpc_tpu.offline.bgv import decrypt, keygen
from ark_mpc_tpu.offline.bgv import test_params as small_params
from ark_mpc_tpu.offline.bgv.zkpok import (
    Ciphertext,
    CiphertextWithProof,
    encrypt_and_prove_batch,
    verify_proof,
)

P = small_params(n=256)
KP = keygen(P, jax.random.PRNGKey(0))
rng = np.random.default_rng(11)


def _prove(u=3):
    pts = rng.integers(0, P.t, size=(u, P.n), dtype=np.uint32)
    proof = encrypt_and_prove_batch(
        P, KP.pk_a, KP.pk_b, pts, jax.random.PRNGKey(1),
        sec=40, v=16, host_rng=np.random.default_rng(2))
    return pts, proof


def test_zkpok_completeness_and_decrypt():
    pts, proof = _prove()
    assert verify_proof(P, KP.pk_a, KP.pk_b, proof, sec=40)
    # the proven ciphertexts decrypt to the committed plaintexts
    for i in range(pts.shape[0]):
        ct = Ciphertext(proof.cts.c0[i], proof.cts.c1[i])
        assert decrypt(P, KP.sk, ct).tolist() == pts[i].tolist()


def test_zkpok_rejects_tampered_ciphertext():
    _, proof = _prove()
    bad_c0 = proof.cts.c0.at[0, 0, 0].add(jnp.uint32(1))
    bad = CiphertextWithProof(
        Ciphertext(bad_c0, proof.cts.c1), proof.comm,
        proof.z, proof.zu, proof.ze0, proof.ze1)
    assert not verify_proof(P, KP.pk_a, KP.pk_b, bad, sec=40)


def test_zkpok_rejects_tampered_response():
    _, proof = _prove()
    z = proof.z.copy()
    z[0, 0] = int(z[0, 0]) + 1
    bad = CiphertextWithProof(proof.cts, proof.comm, z,
                              proof.zu, proof.ze0, proof.ze1)
    assert not verify_proof(P, KP.pk_a, KP.pk_b, bad, sec=40)


def test_zkpok_rejects_out_of_bound_witness():
    """A 'plaintext' far beyond t/2 slack must fail the bound check."""
    _, proof = _prove()
    z = proof.z.copy()
    z[0, 0] = (1 << 40) * (P.t // 2) * 100  # way past the allowed slack
    bad = CiphertextWithProof(proof.cts, proof.comm, z,
                              proof.zu, proof.ze0, proof.ze1)
    assert not verify_proof(P, KP.pk_a, KP.pk_b, bad, sec=40)
