"""Mock-MPC tests for authenticated curve-point protocols
(`integration/src/authenticated_curve.rs` analog)."""

import random

import pytest

from ark_mpc_tpu import AuthenticationError, Scalar
from ark_mpc_tpu.algebra.curve import CurvePoint
from ark_mpc_tpu.algebra.fields import CURVE25519_ORDER as L
from ark_mpc_tpu.algebra.point_share import PointShare
from ark_mpc_tpu.fabric.simulator import execute_mock_mpc_dealer

rng = random.Random(23)


def rand_points(n):
    ks = [rng.randrange(L) for _ in range(n)]
    return CurvePoint.generator((n,)).mul(Scalar.from_ints(ks)), ks


def affine(pt):
    x, y = pt.to_affine()
    return list(zip(x.to_ints(), y.to_ints()))


@pytest.mark.slow
def test_share_open_points():
    pts, _ = rand_points(2)
    want = affine(pts)

    def prog(fabric):
        sp = fabric.share_points(
            pts if fabric.party_id == 0 else None, sender=0, n=2
        )
        return affine(fabric.open_authenticated_points(sp))

    r0, r1 = execute_mock_mpc_dealer(prog)
    assert r0 == want and r1 == want


def test_point_linear_ops():
    pts, _ = rand_points(2)
    qts, _ = rand_points(2)
    want = affine(pts + qts)

    def prog(fabric):
        sp = fabric.share_points(pts if fabric.party_id == 0 else None, sender=0, n=2)
        sq = fabric.share_points(qts if fabric.party_id == 1 else None, sender=1, n=2)
        return affine(fabric.open_authenticated_points(sp + sq))

    r0, r1 = execute_mock_mpc_dealer(prog)
    assert r0 == want and r1 == want


def test_beaver_scalar_point_mul():
    pts, _ = rand_points(2)
    ks = [rng.randrange(L) for _ in range(2)]
    want = affine(pts.mul(Scalar.from_ints(ks)))

    def prog(fabric):
        sp = fabric.share_points(pts if fabric.party_id == 0 else None, sender=0, n=2)
        sk = fabric.share_values(
            Scalar.from_ints(ks) if fabric.party_id == 1 else None, sender=1, n=2
        )
        prod = fabric.mul_points(sk, sp)
        return affine(fabric.open_authenticated_points(prod))

    r0, r1 = execute_mock_mpc_dealer(prog)
    assert r0 == want and r1 == want


@pytest.mark.slow
def test_authenticated_msm():
    n = 2
    pts, _ = rand_points(n)
    ks = [rng.randrange(L) for _ in range(n)]
    want = affine(CurvePoint.msm(Scalar.from_ints(ks), pts).reshape(1))

    def prog(fabric):
        sp = fabric.share_points(pts if fabric.party_id == 0 else None, sender=0, n=n)
        sk = fabric.share_values(
            Scalar.from_ints(ks) if fabric.party_id == 1 else None, sender=1, n=n
        )
        res = fabric.msm(sk, sp)
        return affine(fabric.open_authenticated_points(res.reshape(1)))

    r0, r1 = execute_mock_mpc_dealer(prog)
    assert r0 == want and r1 == want


def test_bad_point_mac_rejected():
    pts, _ = rand_points(2)

    def prog(fabric):
        sp = fabric.share_points(pts if fabric.party_id == 0 else None, sender=0, n=2)
        if fabric.party_id == 1:
            sp = PointShare(sp.share, sp.mac + CurvePoint.generator((2,)))
        return fabric.open_authenticated_points(sp)

    with pytest.raises(AuthenticationError):
        execute_mock_mpc_dealer(prog)


def test_mul_generator():
    ks = [rng.randrange(L) for _ in range(2)]
    want = affine(CurvePoint.generator((2,)).mul(Scalar.from_ints(ks)))

    def prog(fabric):
        sk = fabric.share_values(
            Scalar.from_ints(ks) if fabric.party_id == 0 else None, sender=0, n=2
        )
        return affine(fabric.open_authenticated_points(fabric.mul_generator(sk)))

    r0, r1 = execute_mock_mpc_dealer(prog)
    assert r0 == want and r1 == want
