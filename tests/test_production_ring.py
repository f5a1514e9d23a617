"""The PRODUCTION ring, at the production index: m = 118965.

`test_lowgear_powerful.py` exercises the production CODE PATH at m = 35 /
m = 1155 so CI stays fast; this file runs the actual RLWE-secure
parameters (m = 118965, phi = 48960, 24480 GF(l^2) slots, drown sec 128 —
docs/security_params.md) through the primitives the offline phase is made
of: slot encode/decode, encrypt/decrypt, and the LowGear drowned
cross-product (`triplets.rs:155-234` core).  Slow (~5-10 min on CPU), so
the product check runs on a sub-sampled slot set but full-ring ciphertext
ops — nothing is scaled down except the number of verified slots.
"""

import jax
import numpy as np
import pytest

from ark_mpc_tpu.algebra.fields import CURVE25519_ORDER as L
from ark_mpc_tpu.algebra.scalar import Scalar
from ark_mpc_tpu.offline.bgv.bgv_l import (
    add_pt_l,
    decode_slots_l,
    decrypt_l,
    encode_slots_l,
    encrypt_l,
    keygen_l,
    mul_pt_l,
    production_ring,
    rerandomize_l,
)

pytestmark = pytest.mark.slow

CHECK = 64  # slots verified against python ints (to_ints on all 24480
#             host-side bigints costs minutes and adds no coverage)


@pytest.fixture(scope="module")
def ring():
    return production_ring()


@pytest.fixture(scope="module")
def kp(ring):
    return keygen_l(ring, jax.random.PRNGKey(41))


def test_production_params(ring):
    assert ring.m == 118965
    assert ring.phi == 48960
    assert ring.slots == 24480
    assert ring.drown_sec == 128


def test_production_encrypt_decrypt(ring, kp):
    rng = np.random.default_rng(42)
    slots = Scalar.random(ring.slots, rng)
    ct = encrypt_l(ring, kp.pk_a, kp.pk_b, encode_slots_l(ring, slots),
                   jax.random.PRNGKey(43))
    got = decode_slots_l(ring, decrypt_l(ring, kp.sk, ct))
    assert got[:CHECK].to_ints() == slots[:CHECK].to_ints()
    assert got[-CHECK:].to_ints() == slots[-CHECK:].to_ints()


def test_production_drowned_product(ring, kp):
    """enc(a) * b - mask, drowned at sec = 128, decrypts slot-wise at the
    production index — the homomorphic core of dealer-free triples."""
    rng = np.random.default_rng(44)
    a = Scalar.random(ring.slots, rng)
    b = Scalar.random(ring.slots, rng)
    mask = Scalar.random(ring.slots, rng)
    ct = encrypt_l(ring, kp.pk_a, kp.pk_b, encode_slots_l(ring, a),
                   jax.random.PRNGKey(45))
    prod = mul_pt_l(ring, ct, encode_slots_l(ring, b))
    masked = add_pt_l(ring, prod, encode_slots_l(ring, -mask))
    masked = rerandomize_l(ring, kp.pk_a, kp.pk_b, masked,
                           jax.random.PRNGKey(46))
    got = decode_slots_l(ring, decrypt_l(ring, kp.sk, masked))
    want = [
        (x * y - z) % L
        for x, y, z in zip(a[:CHECK].to_ints(), b[:CHECK].to_ints(),
                           mask[:CHECK].to_ints())
    ]
    assert got[:CHECK].to_ints() == want
