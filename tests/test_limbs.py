"""Golden tests for limb field arithmetic vs exact python ints.

Tier-1 analog of the reference's scalar unit tests
(`online-phase/src/algebra/scalar/scalar.rs` inline tests).
"""

import random

import numpy as np
import pytest

from ark_mpc_tpu.algebra import limbs as lb
from ark_mpc_tpu.algebra.fields import BASE_FIELD, SCALAR_FIELD

SPECS = [SCALAR_FIELD, BASE_FIELD]
rng = random.Random(1234)


def rand_ints(spec, n):
    return [rng.randrange(spec.modulus) for _ in range(n)]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_pack_roundtrip(spec):
    vals = rand_ints(spec, 17) + [0, 1, spec.modulus - 1]
    x = lb.pack_ints(spec, vals)
    assert lb.unpack_ints(spec, x) == vals


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_add_sub_neg(spec):
    n = 33
    a, b = rand_ints(spec, n), rand_ints(spec, n)
    a[0], b[0] = spec.modulus - 1, spec.modulus - 1  # wraparound case
    a[1], b[1] = 0, 0
    xa, xb = lb.pack_ints(spec, a), lb.pack_ints(spec, b)
    assert lb.unpack_ints(spec, lb.add(spec, xa, xb)) == [
        (u + v) % spec.modulus for u, v in zip(a, b)
    ]
    assert lb.unpack_ints(spec, lb.sub(spec, xa, xb)) == [
        (u - v) % spec.modulus for u, v in zip(a, b)
    ]
    assert lb.unpack_ints(spec, lb.neg(spec, xa)) == [(-u) % spec.modulus for u in a]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_mul(spec):
    n = 65
    a, b = rand_ints(spec, n), rand_ints(spec, n)
    a[0], b[0] = spec.modulus - 1, spec.modulus - 1
    a[1], b[1] = 0, 12345
    a[2], b[2] = 1, spec.modulus - 2
    xa, xb = lb.pack_ints(spec, a), lb.pack_ints(spec, b)
    got = lb.unpack_ints(spec, lb.mont_mul(spec, xa, xb))
    assert got == [(u * v) % spec.modulus for u, v in zip(a, b)]


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_inverse(spec):
    n = 17
    a = rand_ints(spec, n)
    a[0] = 1
    a[1] = spec.modulus - 1
    a[2] = 0  # 0 -> 0 convention
    xa = lb.pack_ints(spec, a)
    got = lb.unpack_ints(spec, lb.inverse(spec, xa))
    want = [pow(u, -1, spec.modulus) if u else 0 for u in a]
    assert got == want


@pytest.mark.parametrize("spec", SPECS, ids=lambda s: s.name)
def test_reduce_wide(spec):
    n = 9
    vals = [rng.randrange(2**448) for _ in range(n)]
    wide = np.zeros((32, n), dtype=np.uint32)
    for j, v in enumerate(vals):
        for i in range(28):
            wide[i, j] = (v >> (16 * i)) & 0xFFFF
    got = lb.unpack_ints(spec, lb.reduce_wide(spec, wide), mont=False)
    assert got == [v % spec.modulus for v in vals]


def test_batch_shapes():
    spec = SCALAR_FIELD
    a = rand_ints(spec, 12)
    x = lb.pack_ints(spec, a).reshape(16, 3, 4)
    y = lb.mont_mul(spec, x, x)
    assert y.shape == (16, 3, 4)
    got = lb.unpack_ints(spec, y.reshape(16, 12))
    assert got == [(u * u) % spec.modulus for u in a]


def test_scalar_serde_roundtrips():
    """Byte / biguint / radix-string conversions (`scalar.rs:109-139,187-202`
    serde + radix tests)."""
    from ark_mpc_tpu.algebra.scalar import Scalar

    vals = [0, 1, SCALAR_FIELD.modulus - 1] + rand_ints(SCALAR_FIELD, 5)
    s = Scalar.from_ints(vals)
    assert Scalar.from_bytes_le(s.to_bytes_le()).to_ints() == vals
    # big-endian encoding feeds the commitment scheme: check chunk order
    be = s.to_bytes_be()
    assert len(be) == 32 * len(vals)
    assert int.from_bytes(be[:32], "big") == vals[0]
    # reduce-mod-order parse of an oversized BE value
    big = (vals[3] + 7 * SCALAR_FIELD.modulus).to_bytes(40, "big")
    assert Scalar.from_be_bytes_mod_order(big).to_int() == vals[3]
    # biguint + radix strings
    one = Scalar.from_ints(vals[3])
    assert Scalar.from_biguint(one.to_biguint()).to_int() == vals[3]
    for radix in (2, 10, 16, 36):
        rs = one.to_radix_string(radix)
        assert Scalar.from_radix_string(rs, radix).to_int() == vals[3]
    with np.testing.assert_raises(ValueError):
        Scalar.from_bytes_le(b"\xff" * 32)
