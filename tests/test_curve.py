"""Tier-1 golden tests for Ed25519 group ops vs an exact python-int model."""

import random

import pytest

from ark_mpc_tpu.algebra.curve import (
    ED_D,
    GEN_X,
    GEN_Y,
    P,
    CurvePoint,
    hash_to_curve,
)
from ark_mpc_tpu.algebra.fields import CURVE25519_ORDER as L
from ark_mpc_tpu.algebra.scalar import Scalar

rng = random.Random(5)


# -- python-int reference model --------------------------------------------


def ref_add(p1, p2):
    x1, y1 = p1
    x2, y2 = p2
    denom_x = (1 + ED_D * x1 * x2 % P * y1 % P * y2) % P
    denom_y = (1 - ED_D * x1 * x2 % P * y1 % P * y2) % P
    x3 = (x1 * y2 + x2 * y1) % P * pow(denom_x, -1, P) % P
    y3 = (y1 * y2 + x1 * x2) % P * pow(denom_y, -1, P) % P
    return (x3, y3)


def ref_mul(k, pt):
    acc = (0, 1)
    while k:
        if k & 1:
            acc = ref_add(acc, pt)
        pt = ref_add(pt, pt)
        k >>= 1
    return acc


G = (GEN_X, GEN_Y)


def affine_ints(pt: CurvePoint):
    x, y = pt.to_affine()
    return list(zip(x.to_ints(), y.to_ints()))


def test_add_double_neg():
    g = CurvePoint.generator((3,))
    two_g = g + g
    want = ref_add(G, G)
    assert affine_ints(two_g) == [want] * 3
    assert affine_ints(g.double()) == [want] * 3
    # G + (-G) = identity
    z = g + (-g)
    assert affine_ints(z) == [(0, 1)] * 3
    assert all(bool(b) for b in z.is_identity())
    # identity + G = G
    assert affine_ints(CurvePoint.identity((3,)) + g) == [G] * 3


def test_scalar_mul():
    ks = [0, 1, 2, L - 1, rng.randrange(L), rng.randrange(L)]
    g = CurvePoint.generator((len(ks),))
    out = g.mul(Scalar.from_ints(ks))
    want = [ref_mul(k, G) for k in ks]
    assert affine_ints(out) == want


def test_msm():
    n = 6
    ks = [rng.randrange(L) for _ in range(n)]
    pts_int = [ref_mul(rng.randrange(L), G) for _ in range(n)]
    from ark_mpc_tpu.algebra.scalar import BaseFelt

    pts = CurvePoint.from_affine(
        BaseFelt.from_ints([p[0] for p in pts_int]),
        BaseFelt.from_ints([p[1] for p in pts_int]),
    )
    got = CurvePoint.msm(Scalar.from_ints(ks), pts)
    want = (0, 1)
    for k, p in zip(ks, pts_int):
        want = ref_add(want, ref_mul(k, p))
    assert affine_ints(got.reshape(1)) == [want]


def test_compress_roundtrip():
    ks = [rng.randrange(L) for _ in range(4)]
    pts = CurvePoint.generator((4,)).mul(Scalar.from_ints(ks))
    data = pts.compress()
    back = CurvePoint.decompress(data)
    assert affine_ints(back) == affine_ints(pts)


def test_hash_to_curve_on_curve():
    pt = hash_to_curve(b"hello world", n=2)
    for x, y in affine_ints(pt):
        assert (-x * x + y * y) % P == (1 + ED_D * x * x % P * y * y) % P
    # order-l subgroup: l * pt = identity
    z = pt.mul(Scalar.from_ints([0, 0]))  # 0*pt = identity sanity
    assert all(bool(b) for b in z.is_identity())


def test_random_points():
    """`CurvePoint.random` (analog of `curve.rs` `random()`): on-curve,
    distinct, deterministic under an injected rng, fresh otherwise."""
    import numpy as np

    pts = CurvePoint.random(3, np.random.default_rng(9))
    coords = affine_ints(pts)
    for x, y in coords:
        assert (-x * x + y * y) % P == (1 + ED_D * x * x % P * y * y) % P
    assert len(set(coords)) == 3
    again = CurvePoint.random(3, np.random.default_rng(9))
    assert affine_ints(again) == coords
    fresh = CurvePoint.random(3)
    assert affine_ints(fresh) != coords


@pytest.mark.slow
def test_msm_pippenger():
    """`CurvePoint.msm` above the cutoff routes to the sort+scan Pippenger
    (`_msm_pippenger`); validate against the exact python-int model,
    including zero scalars and repeated points."""
    n = CurvePoint.MSM_PIPPENGER_CUTOFF + 12
    ks = [rng.randrange(L) for _ in range(n)]
    ks[0] = 0
    ks[1] = L - 1
    base = [ref_mul(rng.randrange(2, L), G) for _ in range(8)]
    pts_int = [base[i % 8] for i in range(n)]  # repeats stress buckets
    from ark_mpc_tpu.algebra.scalar import BaseFelt

    pts = CurvePoint.from_affine(
        BaseFelt.from_ints([p[0] for p in pts_int]),
        BaseFelt.from_ints([p[1] for p in pts_int]),
    )
    got = CurvePoint.msm(Scalar.from_ints(ks), pts)
    want = (0, 1)
    for k, p in zip(ks, pts_int):
        want = ref_add(want, ref_mul(k, p))
    assert affine_ints(got.reshape(1)) == [want]
