"""BGV scheme tests: roundtrip, homomorphisms, slots, drowning."""

import jax
import numpy as np

from ark_mpc_tpu.offline.bgv import (
    add_ct,
    add_pt,
    decrypt,
    decrypt_slots,
    encode_slots,
    encrypt,
    encrypt_slots,
    keygen,
    mul_pt,
    rerandomize,
)
from ark_mpc_tpu.offline.bgv import test_params as small_params

P = small_params(n=256)
KEY = jax.random.PRNGKey(0)
KP = keygen(P, KEY)
rng = np.random.default_rng(3)


def rand_slots():
    return rng.integers(0, P.t, size=P.n, dtype=np.uint32)


def test_encrypt_decrypt_roundtrip():
    pt = rng.integers(0, P.t, size=P.n, dtype=np.uint32)
    ct = encrypt(P, KP.pk_a, KP.pk_b, pt, jax.random.PRNGKey(1))
    got = decrypt(P, KP.sk, ct)
    assert got.tolist() == pt.tolist()


def test_slot_roundtrip_and_add():
    a, b = rand_slots(), rand_slots()
    ca = encrypt_slots(P, KP.pk_a, KP.pk_b, a, jax.random.PRNGKey(2))
    cb = encrypt_slots(P, KP.pk_a, KP.pk_b, b, jax.random.PRNGKey(3))
    s = decrypt_slots(P, KP.sk, add_ct(P, ca, cb))
    want = (a.astype(np.uint64) + b) % P.t
    assert s.tolist() == want.tolist()


def test_ct_pt_slotwise_product():
    a, b = rand_slots(), rand_slots()
    ca = encrypt_slots(P, KP.pk_a, KP.pk_b, a, jax.random.PRNGKey(4))
    prod = mul_pt(P, ca, encode_slots(P, b))
    got = decrypt_slots(P, KP.sk, prod)
    want = (a.astype(object) * b.astype(object)) % P.t
    assert got.astype(object).tolist() == want.tolist()


def test_add_pt_and_rerandomize():
    a, b = rand_slots(), rand_slots()
    ca = encrypt_slots(P, KP.pk_a, KP.pk_b, a, jax.random.PRNGKey(5))
    ca = add_pt(P, ca, encode_slots(P, b))
    drowned = rerandomize(P, KP.pk_a, KP.pk_b, ca, jax.random.PRNGKey(6))
    got = decrypt_slots(P, KP.sk, drowned)
    want = (a.astype(np.uint64) + b) % P.t
    assert got.tolist() == want.tolist()


def test_share_product_shape():
    """The LowGear core step: enc(a) x b + drown - mask decrypts to
    a*b - mask slot-wise (`lowgear/triplets.rs:155-234` share_product)."""
    a, b = rand_slots(), rand_slots()
    mask = rand_slots()
    ca = encrypt_slots(P, KP.pk_a, KP.pk_b, a, jax.random.PRNGKey(7))
    prod = mul_pt(P, ca, encode_slots(P, b))
    masked = add_pt(P, prod, encode_slots(P, (P.t - mask) % P.t))
    masked = rerandomize(P, KP.pk_a, KP.pk_b, masked, jax.random.PRNGKey(8))
    got = decrypt_slots(P, KP.sk, masked)
    want = (a.astype(object) * b - mask) % P.t
    assert got.astype(object).tolist() == want.tolist()
