"""BGV-based LowGear triple generation (the real Fig. 7 pipeline).

Analog of `offline-phase/src/lowgear/triplets.rs:30-234`: both parties
sample slot vectors a, b; exchange enc(a); compute the cross products
homomorphically with drowning masks (`share_product`, `triplets.rs:
155-234`); and authenticate every share against the counterparty's
encrypted MAC key (`authenticate_vec`, `triplets.rs:104-114`).

Generic over the BGV plaintext prime t: with the test parameter sets this
runs the complete two-party protocol end-to-end today; the Curve25519-order
plaintext backend (docs/bgv_design.md) makes the output feed the online
fabric directly.  This t-generic path is the PROTOTYPE (no ZK gate, small
test parameters); the production pipeline is `triplets_l.py`, whose
exchanges are ZK-gated at 2^-128 (`offline/bgv/zkpok_words.py`).

Slot vectors are uint32 arrays (n,) mod t; local slot arithmetic uses the
32-bit modular VPU kernels.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ...fabric.transport import Transport
from ...ops import modular32 as m32
from ..bgv import (
    Ciphertext,
    add_pt,
    decrypt_slots,
    encode_slots,
    encrypt_slots,
    mul_pt,
    rerandomize,
)
from .setup import SetupState, _exchange

U32 = jnp.uint32


def _rand_slots(params, key, n=None):
    n = n or params.n
    return jax.random.randint(key, (n,), 0, params.t, dtype=jnp.int32).astype(U32)


def _slot_mul(params, a, b):
    # mont_mul32(a*R, b) = a*b directly (one Montgomery factor cancels)
    spec = params.t_spec
    return m32.mont_mul32(spec, m32.to_mont32(spec, a), b)


def _slot_add(params, a, b):
    return m32.add32(params.t_spec, a, b)


def _slot_sub(params, a, b):
    return m32.sub32(params.t_spec, a, b)


def share_product(transport: Transport, st: SetupState,
                  enc_other: Ciphertext, my_factor, key) -> jnp.ndarray:
    """One direction of the LowGear cross product: given the peer's
    enc(x) (under THEIR key), return my additive share of x * my_factor.

    ct = enc(x) * my_factor + (-mask); drown; send; the peer decrypts its
    share (x * my_factor - mask); my share is the mask
    (`triplets.rs:155-234`).  Both directions run per call: party 0 sends
    its masked product first, then receives the peer's (and vice versa) —
    one wire round total, and each side then decrypts.
    Returns (my_mask_share, decrypted_share_of_peer_product).
    """
    params = st.params
    k_mask, k_drown = jax.random.split(key)
    mask = _rand_slots(params, k_mask)
    prod = mul_pt(params, enc_other, encode_slots(params, my_factor))
    neg_mask = _slot_sub(params, jnp.zeros_like(mask), mask)
    masked = add_pt(params, prod, encode_slots(params, neg_mask))
    masked = rerandomize(params, st.other_pk_a, st.other_pk_b, masked,
                         k_drown)
    their0, their1 = _exchange(transport, masked.c0, masked.c1)
    dec = jnp.asarray(decrypt_slots(params, st.keypair.sk,
                                    Ciphertext(their0, their1)))
    return mask, dec


def authenticate_vec(transport: Transport, st: SetupState, my_key_share,
                     values, key) -> jnp.ndarray:
    """MAC shares of an additively shared vector (`triplets.rs:104-114`):
    mac^i = key_i * v_i + [share of key_j * v_i] + [share of key_i * v_j].

    `st.other_mac_enc` is enc(key_j) under the PEER's key: multiply it by
    my v_i, mask, return for the peer to decrypt; symmetric both ways in
    one round.
    """
    params = st.params
    mask, dec = share_product(transport, st, st.other_mac_enc, values, key)
    local = _slot_mul(params, values, my_key_share)
    return _slot_add(params, local, _slot_add(params, mask, dec))


@dataclass
class BgvTriples:
    """Authenticated triple shares over F_t (slot vectors)."""

    a: jnp.ndarray
    b: jnp.ndarray
    c: jnp.ndarray
    a_mac: jnp.ndarray
    b_mac: jnp.ndarray
    c_mac: jnp.ndarray


def generate_triples(transport: Transport, st: SetupState, my_key_share,
                     key) -> BgvTriples:
    """One PoK-batch of triples (n = slots):  a = a0+a1, b = b0+b1,
    c = a*b via homomorphic cross products; all three vectors
    authenticated."""
    trip, _pair = generate_triple_pairs(transport, st, my_key_share, key,
                                        with_pair=False)
    return trip


def generate_triple_pairs(transport: Transport, st: SetupState,
                          my_key_share, key, with_pair: bool = True):
    """LowGear Fig. 7 shape: (a, b, c=ab) plus — sharing the SAME a and the
    same exchanged enc(a) — a second (b', c'=ab'), which the pair sacrifice
    consumes (`triplets.rs:30-147`)."""
    params = st.params
    keys = jax.random.split(key, 12)
    a_i = _rand_slots(params, keys[0])
    b_i = _rand_slots(params, keys[1])

    # round 1: exchange enc(a_i) gated on a ZK proof of plaintext knowledge
    # (`triplets.rs:69-81` exchange_a_values with encrypt_and_prove /
    # verify_proof)
    from ...fabric import messages as _messages
    from ..bgv import encode_slots as _enc_slots
    from ..bgv.zkpok import (
        encrypt_and_prove_batch,
        proof_from_arrays,
        proof_to_arrays,
        verify_proof,
    )
    from ..errors import KeyExchangeError

    zk_v = 32
    coeffs = np.asarray(jax.device_get(_enc_slots(params, a_i)),
                        dtype=np.uint32)[None]
    proof = encrypt_and_prove_batch(params, st.keypair.pk_a,
                                    st.keypair.pk_b, coeffs, keys[2],
                                    v=zk_v)
    frame = _messages.encode_arrays(proof_to_arrays(proof))
    peer_items = _messages.decode_arrays(transport.exchange(frame))
    peer_proof = proof_from_arrays(peer_items, zk_v, params.n)
    if not verify_proof(params, st.other_pk_a, st.other_pk_b, peer_proof):
        raise KeyExchangeError("peer's ciphertext proof of knowledge failed")
    enc_other_a = Ciphertext(peer_proof.cts.c0[0], peer_proof.cts.c1[0])

    def product_with(b_vec, k_sp, k_auth_b, k_auth_c):
        mask, dec = share_product(transport, st, enc_other_a, b_vec, k_sp)
        c_vec = _slot_add(params, _slot_mul(params, a_i, b_vec),
                          _slot_add(params, mask, dec))
        b_mac = authenticate_vec(transport, st, my_key_share, b_vec, k_auth_b)
        c_mac = authenticate_vec(transport, st, my_key_share, c_vec, k_auth_c)
        return c_vec, b_mac, c_mac

    c_i, b_mac, c_mac = product_with(b_i, keys[3], keys[4], keys[5])
    a_mac = authenticate_vec(transport, st, my_key_share, a_i, keys[6])
    trip = BgvTriples(a_i, b_i, c_i, a_mac, b_mac, c_mac)

    if not with_pair:
        return trip, None
    b2_i = _rand_slots(params, keys[7])
    c2_i, b2_mac, c2_mac = product_with(b2_i, keys[8], keys[9], keys[10])
    pair = BgvTriples(a_i, b2_i, c2_i, a_mac, b2_mac, c2_mac)
    return trip, pair
