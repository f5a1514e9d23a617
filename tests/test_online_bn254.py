"""The online MPC core at BN254 Fr — genericity over the share field.

The reference is generic over `C: CurveGroup` and runs its whole test
suite at `ark_bn254::G1Projective` (`online-phase/src/lib.rs:75-78`).  The
TPU build's analog: `ScalarShare` / `MpcFabric` / dealer carry the field
as the contained `FieldArray` subclass.  This file runs the mock-MPC core
suite (share / open / Beaver mul / inverse / deferred MAC check /
malicious MAC abort) over `bn254.Fr` — the same protocols that every
other test exercises over the Curve25519 `Scalar`.
"""

import random

import pytest

from ark_mpc_tpu.algebra.bn254 import BN254_R, Fr
from ark_mpc_tpu.algebra.share import ScalarShare
from ark_mpc_tpu.fabric.errors import AuthenticationError
from ark_mpc_tpu.fabric.simulator import execute_mock_mpc
from ark_mpc_tpu.offline.base import TrustedDealerSource

rng = random.Random(77)


def _run(prog, seed=7):
    return execute_mock_mpc(
        prog,
        offline_factory=lambda pid: TrustedDealerSource(
            pid, seed=seed, field=Fr),
    )


def test_share_algebra_local_bn254():
    """Pure L1 algebra at Fr: linear ops act on share and MAC together."""
    a = ScalarShare(Fr.from_ints([5, 6]), Fr.from_ints([50, 60]))
    b = ScalarShare(Fr.from_ints([1, 2]), Fr.from_ints([10, 20]))
    s = a + b
    assert type(s.share) is Fr
    assert s.share.to_ints() == [6, 8] and s.mac.to_ints() == [60, 80]
    d = (a - b).mul_public(Fr.from_ints(2))
    assert d.share.to_ints() == [8, 8] and d.mac.to_ints() == [80, 80]
    k = Fr.from_ints(3)
    p0 = a.add_public(Fr.from_ints([7, 7]), k, party_id=0)
    p1 = a.add_public(Fr.from_ints([7, 7]), k, party_id=1)
    assert p0.share.to_ints() == [12, 13]  # party 0 updates the share
    assert p1.share.to_ints() == [5, 6]    # party 1 does not
    assert p0.mac.to_ints() == p1.mac.to_ints() == [71, 81]


def test_share_open_bn254():
    xs = [rng.randrange(BN254_R) for _ in range(4)]

    def prog(fabric):
        assert fabric.field is Fr
        sx = fabric.share_values(
            Fr.from_ints(xs) if fabric.party_id == 0 else None, sender=0,
            n=4)
        v = fabric.open_authenticated(sx)
        assert type(v) is Fr
        return v.to_ints()

    r0, r1 = _run(prog)
    assert r0 == r1 == xs


def test_beaver_mul_bn254():
    xs = [rng.randrange(BN254_R) for _ in range(3)]
    ys = [rng.randrange(BN254_R) for _ in range(3)]

    def prog(fabric):
        sx = fabric.share_values(
            Fr.from_ints(xs) if fabric.party_id == 0 else None, sender=0,
            n=3)
        sy = fabric.share_values(
            Fr.from_ints(ys) if fabric.party_id == 1 else None, sender=1,
            n=3)
        z = fabric.open_authenticated(fabric.mul(sx, sy), defer=True)
        fabric.verify_deferred()
        return z.to_ints()

    r0, r1 = _run(prog)
    assert r0 == r1 == [(a * b) % BN254_R for a, b in zip(xs, ys)]


def test_inverse_bn254():
    xs = [rng.randrange(1, BN254_R) for _ in range(3)]

    def prog(fabric):
        sx = fabric.share_values(
            Fr.from_ints(xs) if fabric.party_id == 0 else None, sender=0,
            n=3)
        inv = fabric.inverse(sx)
        return fabric.open_authenticated(inv).to_ints()

    r0, r1 = _run(prog)
    assert r0 == r1 == [pow(x, -1, BN254_R) for x in xs]


def test_bad_mac_aborts_bn254():
    """Malicious MAC corruption at Fr must abort with AuthenticationError
    (`authenticated_scalar.rs:1076-1111` fault-injection analog)."""
    xs = [rng.randrange(BN254_R) for _ in range(2)]

    def prog(fabric):
        sx = fabric.share_values(
            Fr.from_ints(xs) if fabric.party_id == 0 else None, sender=0,
            n=2)
        if fabric.party_id == 1:
            sx = ScalarShare(sx.share, sx.mac + Fr.from_ints([1, 1]))
        fabric.open_authenticated(sx)
        return True

    with pytest.raises(AuthenticationError):
        _run(prog)


def test_folded_deferred_check_bn254():
    """The public-coin RLC fold (O(1)-wire aggregated check) at Fr."""
    xs = [rng.randrange(BN254_R) for _ in range(4)]
    ys = [rng.randrange(BN254_R) for _ in range(4)]

    def prog(fabric):
        sx = fabric.share_values(
            Fr.from_ints(xs) if fabric.party_id == 0 else None, sender=0,
            n=4)
        sy = fabric.share_values(
            Fr.from_ints(ys) if fabric.party_id == 1 else None, sender=1,
            n=4)
        o = fabric.open_authenticated(fabric.mul(sx, sy), defer=True)
        fabric.verify_deferred(fold=True)
        return o.to_ints()

    r0, r1 = _run(prog)
    assert r0 == r1 == [(a * b) % BN254_R for a, b in zip(xs, ys)]


# -- point protocols at BN254 G1 (curve-generic `fabric/points.py`) --------
# The reference runs its authenticated-point suite at ark_bn254::G1
# (`algebra/curve/authenticated_curve.rs:653-712`); these run the same
# protocols through the generic point layer with `Fr.curve = G1`.

from ark_mpc_tpu.algebra.bn254 import G1  # noqa: E402


def test_point_share_open_bn254():
    """Share points held by party 0, open with MAC check, compare."""
    secrets = [rng.randrange(1, BN254_R) for _ in range(2)]

    def prog(fabric):
        pts = G1.generator((2,)).mul(Fr.from_ints(secrets)) \
            if fabric.party_id == 0 else None
        ps = fabric.share_points(pts, sender=0, n=2)
        opened = fabric.open_authenticated_points(ps)
        x, y = opened.normalize().to_affine()
        return x.to_ints(), y.to_ints()

    r0, r1 = _run(prog)
    assert r0 == r1
    expect = G1.generator((2,)).mul(Fr.from_ints(secrets))
    ex, ey = expect.normalize().to_affine()
    assert r0 == (ex.to_ints(), ey.to_ints())


def test_point_beaver_mul_bn254():
    """[x * P] via the generator-trick Beaver protocol + mul_generator."""
    xs = [rng.randrange(1, BN254_R) for _ in range(2)]
    ss = [rng.randrange(1, BN254_R) for _ in range(2)]

    def prog(fabric):
        sx = fabric.share_values(
            Fr.from_ints(xs) if fabric.party_id == 0 else None, sender=0,
            n=2)
        # [s]*G via batch_mul_generator, then [x * (sG)] via point Beaver
        ssh = fabric.share_values(
            Fr.from_ints(ss) if fabric.party_id == 1 else None, sender=1,
            n=2)
        pg = fabric.mul_generator(ssh)
        prod = fabric.mul_points(sx, pg)
        opened = fabric.open_authenticated_points(prod)
        x, y = opened.normalize().to_affine()
        return x.to_ints(), y.to_ints()

    r0, r1 = _run(prog)
    assert r0 == r1
    expect = G1.generator((2,)).mul(
        Fr.from_ints([(x * s) % BN254_R for x, s in zip(xs, ss)]))
    ex, ey = expect.normalize().to_affine()
    assert r0 == (ex.to_ints(), ey.to_ints())
