"""LowGear setup: BGV key exchange.

Analog of `offline-phase/src/lowgear/setup.rs:13-32`: the parties exchange
BGV public keys, then exchange encryptions of their MAC key shares (used by
`authenticate_vec` to compute homomorphic MACs of the counterparty's
shares).  The reference gates the MAC-share ciphertexts behind a ZKPoK of
plaintext knowledge (`encrypt_and_prove` / `verify_proof`,
`mp-spdz-rs/src/ffi.rs:155-166`).  This module is the PROTOTYPE t-generic
exchange (no proof gate) kept for the small-parameter tests; the
production path is `triplets_l.py:key_exchange_l`, whose exchange IS
ZK-gated at 2^-128 via the word-form amortized proof
(`offline/bgv/zkpok_words.py`).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ...fabric import messages
from ...fabric.transport import Transport
from ..bgv import Ciphertext, Keypair, encrypt_slots, keygen
from ..bgv.params import BgvParams


@dataclass
class SetupState:
    """Per-party state after key exchange (`LowGear` fields
    `lowgear/mod.rs:38-65`: params, keypair, other_pk, other_mac_enc)."""

    params: BgvParams
    keypair: Keypair
    other_pk_a: jnp.ndarray
    other_pk_b: jnp.ndarray
    other_mac_enc: Ciphertext


def _send_arrays(transport: Transport, *arrays):
    transport.send(messages.encode_arrays(
        [np.asarray(jax.device_get(a)) for a in arrays]
    ))


def _exchange(transport: Transport, *arrays):
    frame = messages.encode_arrays(
        [np.asarray(jax.device_get(a)) for a in arrays]
    )
    return [jnp.asarray(a) for a in
            messages.decode_arrays(transport.exchange(frame))]


def run_key_exchange(transport: Transport, params: BgvParams,
                     mac_share_slots, rng_key) -> SetupState:
    """Generate a keypair, exchange PKs, then exchange encrypted MAC key
    shares (party 0 sends first throughout)."""
    k_gen, k_enc = jax.random.split(jax.random.PRNGKey(0) if rng_key is None
                                    else rng_key)
    keypair = keygen(params, k_gen)

    # round 1: public keys
    other_a, other_b = _exchange(transport, keypair.pk_a, keypair.pk_b)

    # round 2: enc(mac_share) under OUR key (the peer homomorphically
    # multiplies its plaintexts by our MAC share and returns masked results)
    my_mac_enc = encrypt_slots(params, keypair.pk_a, keypair.pk_b,
                               mac_share_slots, k_enc)
    oc0, oc1 = _exchange(transport, my_mac_enc.c0, my_mac_enc.c1)

    return SetupState(
        params=params,
        keypair=keypair,
        other_pk_a=other_a,
        other_pk_b=other_b,
        other_mac_enc=Ciphertext(oc0, oc1),
    )
