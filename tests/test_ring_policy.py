"""Secure-by-default BGV ring policy (VERDICT r2 item 3).

The reference cannot construct RLWE-insecure parameter sets — MP-SPDZ
generates them from the modulus (`mp-spdz-rs/src/fhe/params.rs:41-52`).
Our explicit-parameter constructors need an equivalent guard: bgv-mode
`LowGear` defaults to the production ring and refuses rings that fail the
conservative 128-bit RLWE check unless `allow_insecure_ring=True`.
"""

import pytest

from ark_mpc_tpu.offline.bgv.bgv_l import (
    default_ring,
    medium_ring,
    rlwe_secure_128,
)
from ark_mpc_tpu.offline.lowgear.core import LowGear, resolve_bgv_ring


def test_toy_and_medium_rings_fail_the_check():
    assert not rlwe_secure_128(default_ring())
    assert not rlwe_secure_128(medium_ring())


def test_default_ring_choice_is_secure():
    ring = resolve_bgv_ring(None, allow_insecure_ring=False)
    assert rlwe_secure_128(ring)
    assert ring.m == 118965 and ring.phi == 48960


def test_insecure_ring_refused_without_flag():
    with pytest.raises(ValueError, match="RLWE"):
        resolve_bgv_ring(default_ring(), allow_insecure_ring=False)
    with pytest.raises(ValueError, match="RLWE"):
        resolve_bgv_ring(medium_ring(), allow_insecure_ring=False)


def test_insecure_ring_allowed_with_flag():
    ring = default_ring()
    assert resolve_bgv_ring(ring, allow_insecure_ring=True) is ring


def test_lowgear_constructor_refuses_toy_ring():
    # the raise happens during ring resolution, BEFORE any transport use —
    # transport=None proves no key-exchange message is ever attempted
    with pytest.raises(ValueError, match="RLWE"):
        LowGear(0, None, mode="bgv", ring=default_ring())
