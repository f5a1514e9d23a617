"""BGV over the Curve25519 order field (m=132 cyclotomic prototype)."""

import random

import jax
import numpy as np

from ark_mpc_tpu.algebra.fields import CURVE25519_ORDER as L
from ark_mpc_tpu.algebra.scalar import Scalar
from ark_mpc_tpu.offline.bgv.bgv_l import (
    add_ct_l,
    add_pt_l,
    decode_slots_l,
    decrypt_l,
    default_ring,
    encode_slots_l,
    encrypt_l,
    keygen_l,
    mul_pt_l,
    rerandomize_l,
)

rng = random.Random(91)
RING = default_ring()
KP = keygen_l(RING, jax.random.PRNGKey(0))


def rand_slots():
    return Scalar.from_ints([rng.randrange(L) for _ in range(RING.phi)])


def test_encode_decode_roundtrip():
    s = rand_slots()
    back = decode_slots_l(RING, encode_slots_l(RING, s))
    assert back.to_ints() == s.to_ints()


def test_encrypt_decrypt_l():
    s = rand_slots()
    ct = encrypt_l(RING, KP.pk_a, KP.pk_b, encode_slots_l(RING, s),
                   jax.random.PRNGKey(1))
    got = decode_slots_l(RING, decrypt_l(RING, KP.sk, ct))
    assert got.to_ints() == s.to_ints()


def test_slotwise_product_over_l():
    """The LowGear cross-product core over the REAL share field:
    enc(a) * b + (-mask), drowned, decrypts to a*b - mask slot-wise."""
    a, b, mask = rand_slots(), rand_slots(), rand_slots()
    ct = encrypt_l(RING, KP.pk_a, KP.pk_b, encode_slots_l(RING, a),
                   jax.random.PRNGKey(2))
    prod = mul_pt_l(RING, ct, encode_slots_l(RING, b))
    masked = add_pt_l(RING, prod, encode_slots_l(RING, -mask))
    masked = rerandomize_l(RING, KP.pk_a, KP.pk_b, masked,
                           jax.random.PRNGKey(3))
    got = decode_slots_l(RING, decrypt_l(RING, KP.sk, masked))
    want = [(x * y - z) % L for x, y, z in
            zip(a.to_ints(), b.to_ints(), mask.to_ints())]
    assert got.to_ints() == want


def test_d2_ring_slot_products():
    """GF(l^2) slot packing (d = 2, the production-m slot structure) at a
    small index: encode/decode roundtrip and slot-wise homomorphic products
    of F_l values."""
    from ark_mpc_tpu.offline.bgv.cyclotomic import CyclotomicRing

    ring2 = CyclotomicRing(35, n_q_primes=21)  # phi=24, d=2, 12 slots
    assert ring2.d == 2 and ring2.slots == 12
    kp2 = keygen_l(ring2, jax.random.PRNGKey(9))
    a = Scalar.from_ints([rng.randrange(L) for _ in range(12)])
    b = Scalar.from_ints([rng.randrange(L) for _ in range(12)])
    back = decode_slots_l(ring2, encode_slots_l(ring2, a))
    assert back.to_ints() == a.to_ints()
    ct = encrypt_l(ring2, kp2.pk_a, kp2.pk_b, encode_slots_l(ring2, a),
                   jax.random.PRNGKey(10))
    prod = mul_pt_l(ring2, ct, encode_slots_l(ring2, b))
    got = decode_slots_l(ring2, decrypt_l(ring2, kp2.sk, prod))
    want = [(x * y) % L for x, y in zip(a.to_ints(), b.to_ints())]
    assert got.to_ints() == want


def test_ct_add_l():
    a, b = rand_slots(), rand_slots()
    ca = encrypt_l(RING, KP.pk_a, KP.pk_b, encode_slots_l(RING, a),
                   jax.random.PRNGKey(4))
    cb = encrypt_l(RING, KP.pk_a, KP.pk_b, encode_slots_l(RING, b),
                   jax.random.PRNGKey(5))
    got = decode_slots_l(RING, decrypt_l(RING, KP.sk, add_ct_l(RING, ca, cb)))
    want = [(x + y) % L for x, y in zip(a.to_ints(), b.to_ints())]
    assert got.to_ints() == want
