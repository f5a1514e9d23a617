"""LowGear triple generation over the REAL share field F_l.

The end-to-end pipeline the online phase consumes: BGV-over-l
(`offline/bgv/bgv_l.py`, m=132 prototype ring) drives the Fig. 7 flow —
key exchange with encrypted MAC shares, enc(a) exchange, homomorphic cross
products with drowning, authentication — and the outputs are
`ScalarShare` batches over the Curve25519 order field, directly usable by
`MpcFabric`.  Also implements *authenticated shared randomness* the real
way (`lowgear/shared_random.rs:56-71`): local sampling + homomorphic MAC.

Batch size per call = ring.phi slots (40 in the prototype; 24480 at the
production parameters).  ZKPoK gating of the l-field exchange reuses the
sigma-protocol design in `offline/bgv/zkpok.py`; generalizing its bounds to
t = l is tracked in docs/parity.md #25.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ...algebra.scalar import Scalar
from ...algebra.share import ScalarShare
from ...fabric.transport import Transport
from ..bgv.bgv_l import (
    CiphertextL,
    KeypairL,
    add_pt_l,
    decrypt_l,
    decode_slots_l,
    encode_slots_l,
    encrypt_l,
    keygen_l,
    mul_pt_l,
    rerandomize_l,
)
from ..bgv.cyclotomic import CyclotomicRing
from .setup import _exchange


@dataclass
class SetupL:
    """Per-party state after the l-field key exchange."""

    ring: CyclotomicRing
    keypair: KeypairL
    other_pk_a: jnp.ndarray
    other_pk_b: jnp.ndarray
    other_mac_enc: CiphertextL
    mac_key_share: Scalar  # shape ()


def key_exchange_l(transport: Transport, ring: CyclotomicRing,
                   rng, jkey) -> SetupL:
    """Sample a MAC key share, generate a BGV keypair, exchange PKs and
    encrypted MAC shares (`setup.rs:13-32` over the real field).

    The MAC-share ciphertext exchange is gated behind the l-field ZKPoK,
    matching `setup.rs` (`run_key_exchange` uses encrypt_and_prove /
    verify_proof) — LowGear's malicious-security argument relies on proving
    plaintext knowledge of enc(mac_key_share), not only of enc(a)."""
    kg, ke = jax.random.split(jkey)
    kp = keygen_l(ring, kg)
    mac_key_share = Scalar.random((), rng)

    other_a, other_b = _exchange(transport, kp.pk_a, kp.pk_b)

    key_slots = mac_key_share.broadcast_to((ring.slots,))
    st = SetupL(ring, kp, other_a, other_b, None, mac_key_share)
    st.other_mac_enc = _exchange_encryption_proven(
        transport, st, encode_slots_l(ring, key_slots), rng, ke)
    return st


def share_product_l(transport: Transport, st: SetupL,
                    enc_other: CiphertextL, my_factor: Scalar,
                    rng: np.random.Generator, jkey):
    """Cross-product step over F_l (`triplets.rs:155-234`): returns
    (my mask share, decrypted share of the peer's product)."""
    ring = st.ring
    mask = Scalar.random(ring.slots, rng)
    prod = mul_pt_l(ring, enc_other, encode_slots_l(ring, my_factor))
    masked = add_pt_l(ring, prod, encode_slots_l(ring, -mask))
    masked = rerandomize_l(ring, st.other_pk_a, st.other_pk_b, masked, jkey)
    their0, their1 = _exchange(transport, masked.c0, masked.c1)
    dec = decode_slots_l(
        ring, decrypt_l(ring, st.keypair.sk, CiphertextL(their0, their1))
    )
    return mask, dec


def authenticate_vec_l(transport: Transport, st: SetupL, values: Scalar,
                       rng: np.random.Generator, jkey) -> Scalar:
    """Homomorphic MAC shares of an additively shared vector
    (`triplets.rs:104-114`)."""
    mask, dec = share_product_l(transport, st, st.other_mac_enc, values,
                                rng, jkey)
    return values * st.mac_key_share + mask + dec


ZK_ROWS = 64  # Fiat-Shamir binary challenge rows: soundness 2^-64 per
#               exchange (the production floor; `fhe/keys.rs:55-100` runs
#               MP-SPDZ's proof at sec = 128 — tracked for the large-m sets)


def _exchange_encryptions_proven(transport: Transport, st: SetupL,
                                 pt_coeff_list: list[Scalar], rng, jkey,
                                 zk_rows: int | None = None
                                 ) -> list[CiphertextL]:
    """Exchange U ciphertexts each way under ONE amortized ZK proof of
    plaintext knowledge — the reference's PoK batch structure
    (`params.rs:65-67` n_proof_slots: one proof covers a whole batch of
    ciphertexts, so the V challenge-row cost is paid once per U, not per
    ciphertext).  Proving runs under OUR public key; verification under
    the PEER's."""
    from ...fabric import messages as _messages
    from ..bgv.zkpok_words import (
        encrypt_and_prove_batch,
        proof_from_arrays,
        proof_to_arrays,
        verify_proof,
    )
    from ..errors import KeyExchangeError

    ring = st.ring
    v = zk_rows or ZK_ROWS
    proof = encrypt_and_prove_batch(
        ring, st.keypair.pk_a, st.keypair.pk_b,
        pt_coeff_list, jkey, v=v, host_rng=rng)
    frame = _messages.encode_arrays(proof_to_arrays(proof))
    peer_items = _messages.decode_arrays(transport.exchange(frame))
    peer = proof_from_arrays(peer_items)
    if not verify_proof(ring, st.other_pk_a, st.other_pk_b, peer):
        raise KeyExchangeError("peer's l-field ciphertext proof failed")
    return [CiphertextL(peer.cts.c0[i], peer.cts.c1[i])
            for i in range(len(pt_coeff_list))]


def _exchange_encryption_proven(transport: Transport, st: SetupL,
                                pt_coeffs: Scalar, rng, jkey,
                                zk_rows: int | None = None) -> CiphertextL:
    """Single-ciphertext form of `_exchange_encryptions_proven`
    (key exchange, `setup.rs:13-32`)."""
    return _exchange_encryptions_proven(
        transport, st, [pt_coeffs], rng, jkey, zk_rows)[0]


def _exchange_enc_a_proven(transport: Transport, st: SetupL, a_i: Scalar,
                           rng, jkey) -> CiphertextL:
    """Exchange enc(a) gated on the ZKPoK (`triplets.rs:69-81`)."""
    return _exchange_encryption_proven(
        transport, st, encode_slots_l(st.ring, a_i), rng, jkey)


def generate_triples_l(transport: Transport, st: SetupL,
                       rng: np.random.Generator, jkey):
    """One slot-batch of authenticated triples over F_l:
    ([a], [b], [c=a*b]) as ScalarShares of shape (phi,)."""
    ring = st.ring
    keys = jax.random.split(jkey, 6)
    a_i = Scalar.random(ring.slots, rng)
    b_i = Scalar.random(ring.slots, rng)

    enc_other_a = _exchange_enc_a_proven(transport, st, a_i, rng, keys[0])

    mask, dec = share_product_l(transport, st, enc_other_a, b_i, rng,
                                keys[1])
    c_i = a_i * b_i + mask + dec

    a_mac = authenticate_vec_l(transport, st, a_i, rng, keys[2])
    b_mac = authenticate_vec_l(transport, st, b_i, rng, keys[3])
    c_mac = authenticate_vec_l(transport, st, c_i, rng, keys[4])

    return (
        ScalarShare(a_i, a_mac),
        ScalarShare(b_i, b_mac),
        ScalarShare(c_i, c_mac),
    )


def generate_triple_pairs_l(transport: Transport, st: SetupL,
                            rng: np.random.Generator, jkey):
    """Fig. 7 pair over F_l: (a, b, c=ab) and (a, b', c'=ab') sharing the
    same a and the same exchanged enc(a) — the sacrifice's input."""
    ring = st.ring
    keys = jax.random.split(jkey, 9)
    a_i = Scalar.random(ring.slots, rng)

    enc_other_a = _exchange_enc_a_proven(transport, st, a_i, rng, keys[0])

    def product(b_vec, k_sp, k_ab, k_ac):
        mask, dec = share_product_l(transport, st, enc_other_a, b_vec, rng,
                                    k_sp)
        c_vec = a_i * b_vec + mask + dec
        b_mac = authenticate_vec_l(transport, st, b_vec, rng, k_ab)
        c_mac = authenticate_vec_l(transport, st, c_vec, rng, k_ac)
        return ScalarShare(b_vec, b_mac), ScalarShare(c_vec, c_mac)

    b1 = Scalar.random(ring.slots, rng)
    b2 = Scalar.random(ring.slots, rng)
    sb1, sc1 = product(b1, keys[1], keys[2], keys[3])
    sb2, sc2 = product(b2, keys[4], keys[5], keys[6])
    a_mac = authenticate_vec_l(transport, st, a_i, rng, keys[7])
    sa = ScalarShare(a_i, a_mac)
    return sa, sb1, sc1, sb2, sc2


def generate_triple_pairs_batch_l(transport: Transport, st: SetupL,
                                  n_batches: int, rng: np.random.Generator,
                                  jkey):
    """`n_batches` slot-batches of Fig. 7 pairs with the enc(a) exchange
    AMORTIZED: all `n_batches` ciphertexts ride ONE ZK proof
    (`_exchange_encryptions_proven`), matching the reference's
    slots x sec proof batch (`params.rs:65-67`).  Returns the same 5-tuple
    as `generate_triple_pairs_l`, concatenated to shape
    (n_batches * slots,)."""
    ring = st.ring
    if n_batches == 1:
        return generate_triple_pairs_l(transport, st, rng, jkey)
    keys = jax.random.split(jkey, 1 + 8 * n_batches)
    a_list = [Scalar.random(ring.slots, rng) for _ in range(n_batches)]
    enc_others = _exchange_encryptions_proven(
        transport, st, [encode_slots_l(ring, a) for a in a_list],
        rng, keys[0])

    outs: list[tuple] = []
    for i, (a_i, enc_other_a) in enumerate(zip(a_list, enc_others)):
        k = keys[1 + 8 * i: 1 + 8 * (i + 1)]

        def product(b_vec, k_sp, k_ab, k_ac):
            mask, dec = share_product_l(transport, st, enc_other_a, b_vec,
                                        rng, k_sp)
            c_vec = a_i * b_vec + mask + dec
            b_mac = authenticate_vec_l(transport, st, b_vec, rng, k_ab)
            c_mac = authenticate_vec_l(transport, st, c_vec, rng, k_ac)
            return ScalarShare(b_vec, b_mac), ScalarShare(c_vec, c_mac)

        b1 = Scalar.random(ring.slots, rng)
        b2 = Scalar.random(ring.slots, rng)
        sb1, sc1 = product(b1, k[0], k[1], k[2])
        sb2, sc2 = product(b2, k[3], k[4], k[5])
        a_mac = authenticate_vec_l(transport, st, a_i, rng, k[6])
        outs.append((ScalarShare(a_i, a_mac), sb1, sc1, sb2, sc2))
    return tuple(ScalarShare.concatenate([o[j] for o in outs])
                 for j in range(5))


def generate_input_masks_l(transport: Transport, st: SetupL, n: int,
                           local_first: bool, rng: np.random.Generator,
                           jkey):
    """Input masks over F_l (`lowgear/input_masks.rs:15-58`): the OWNING
    party samples the cleartext mask and holds it as its whole share; the
    counterparty's share is 0; MACs come from the homomorphic authenticate
    (which is already symmetric over asymmetric value vectors).

    `local_first`: run my-masks stream before the peer's (both parties must
    agree on the order — party 0's masks first).
    Returns (my_clear_masks or None, my share of stream-A masks, my share
    of stream-B masks) where stream A = party0's masks, B = party1's.
    """
    ring = st.ring
    assert n <= ring.slots, "mask batch larger than slot count"
    k1, k2 = jax.random.split(jkey)

    def stream(owner_is_me: bool, k):
        if owner_is_me:
            clear = Scalar.random(ring.slots, rng)
            share = clear
        else:
            clear = None
            share = Scalar.zeros(ring.slots)
        mac = authenticate_vec_l(transport, st, share, rng, k)
        return clear, ScalarShare(share, mac)

    clear_a, share_a = stream(local_first, k1)
    clear_b, share_b = stream(not local_first, k2)
    my_clear = clear_a if local_first else clear_b
    return my_clear[:n], (share_a if local_first else share_b)[:n], \
        (share_b if local_first else share_a)[:n]


def generate_authenticated_randomness_l(transport: Transport, st: SetupL,
                                        rng: np.random.Generator,
                                        jkey) -> ScalarShare:
    """Authenticated random shares the real way
    (`lowgear/shared_random.rs:56-71`): sample locally, authenticate
    homomorphically."""
    r_i = Scalar.random(st.ring.slots, rng)
    r_mac = authenticate_vec_l(transport, st, r_i, rng, jkey)
    return ScalarShare(r_i, r_mac)
