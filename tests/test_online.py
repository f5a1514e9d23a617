"""Tier-2 mock-MPC tests for the online phase.

Mirrors the reference's mock-MPC unit tests (`execute_mock_mpc` pattern,
SURVEY.md §4 tier 2): share/open, authenticated ops, Beaver multiplication,
MAC-check acceptance AND malicious rejection (bad MAC / bad share), inverse,
pow — against exact python-int expectations.
"""

import random

import pytest

from ark_mpc_tpu import (
    AuthenticationError,
    Scalar,
    ScalarShare,
    execute_mock_mpc,
    execute_mock_mpc_dealer,
)
from ark_mpc_tpu.algebra.fields import CURVE25519_ORDER as L

rng = random.Random(99)


def test_share_and_open():
    xs = [42, 27, L - 1, 0]

    def prog(fabric):
        mine = Scalar.from_ints(xs) if fabric.party_id == 0 else None
        sh = fabric.share_values(mine, sender=0, n=len(xs))
        return fabric.open_authenticated(sh).to_ints()

    r0, r1 = execute_mock_mpc(prog)
    assert r0 == xs and r1 == xs


def test_share_both_directions_dealer():
    a, b = rng.randrange(L), rng.randrange(L)

    def prog(fabric):
        sa = fabric.share_values(
            Scalar.from_ints([a]) if fabric.party_id == 0 else None, sender=0, n=1
        )
        sb = fabric.share_values(
            Scalar.from_ints([b]) if fabric.party_id == 1 else None, sender=1, n=1
        )
        tot = fabric.open_authenticated(sa + sb)
        return tot.to_ints()

    r0, r1 = execute_mock_mpc_dealer(prog)
    assert r0 == r1 == [(a + b) % L]


def test_readme_product():
    """The README example: share a, b; Beaver-multiply; open_authenticated."""

    def prog(fabric):
        a = fabric.share_values(
            Scalar.from_ints([2]) if fabric.party_id == 0 else None, sender=0, n=1
        )
        b = fabric.share_values(
            Scalar.from_ints([3]) if fabric.party_id == 1 else None, sender=1, n=1
        )
        c = fabric.mul(a, b)
        return fabric.open_authenticated(c).to_ints()

    r0, r1 = execute_mock_mpc(prog)
    assert r0 == r1 == [6]


def test_batch_mul_random_dealer():
    n = 32
    xs = [rng.randrange(L) for _ in range(n)]
    ys = [rng.randrange(L) for _ in range(n)]
    want = [(x * y) % L for x, y in zip(xs, ys)]

    def prog(fabric):
        sx = fabric.share_values(
            Scalar.from_ints(xs) if fabric.party_id == 0 else None, sender=0, n=n
        )
        sy = fabric.share_values(
            Scalar.from_ints(ys) if fabric.party_id == 1 else None, sender=1, n=n
        )
        sz = fabric.mul(sx, sy)
        return fabric.open_authenticated(sz).to_ints()

    r0, r1 = execute_mock_mpc_dealer(prog)
    assert r0 == want and r1 == want


def test_linear_ops_and_public():
    x, y, k = 1234567, 7654321, 31337

    def prog(fabric):
        sx = fabric.share_values(
            Scalar.from_ints([x]) if fabric.party_id == 0 else None, sender=0, n=1
        )
        sy = fabric.share_values(
            Scalar.from_ints([y]) if fabric.party_id == 1 else None, sender=1, n=1
        )
        expr = fabric.add_public((sx + sy - sy) * Scalar.from_ints(k), Scalar.from_ints(5))
        expr = fabric.sub_public(expr, Scalar.from_ints(2))
        expr = -expr
        return fabric.open_authenticated(expr, defer=True).to_ints(), fabric

    (r0, f0), (r1, f1) = execute_mock_mpc_dealer(prog)
    want = [(-(x * k + 3)) % L]
    assert r0 == want and r1 == want


def test_deferred_check():
    n = 8
    xs = [rng.randrange(L) for _ in range(n)]

    def prog(fabric):
        sx = fabric.share_values(
            Scalar.from_ints(xs) if fabric.party_id == 0 else None, sender=0, n=n
        )
        sq = fabric.mul(sx, sx)
        v1 = fabric.open_authenticated(sq, defer=True)
        v2 = fabric.open_authenticated(sx, defer=True)
        fabric.verify_deferred()
        return v1.to_ints(), v2.to_ints(), fabric.n_rounds

    (sq0, x0, rounds0), _ = execute_mock_mpc_dealer(prog)
    assert sq0 == [(x * x) % L for x in xs]
    assert x0 == xs
    # input-share sends are not exchanges; rounds = mul open (1) + 2 opens +
    # 3 for the single deferred commit-reveal check
    assert rounds0 == 6


def test_bad_mac_rejected():
    """Corrupting a MAC share must abort with AuthenticationError
    (`integration/src/authenticated_scalar.rs:468-480` analog)."""

    def prog(fabric):
        sx = fabric.share_values(
            Scalar.from_ints([5]) if fabric.party_id == 0 else None, sender=0, n=1
        )
        if fabric.party_id == 1:
            sx = ScalarShare(sx.share, sx.mac + Scalar.from_ints(1))
        return fabric.open_authenticated(sx).to_ints()

    with pytest.raises(AuthenticationError):
        execute_mock_mpc_dealer(prog)


def test_bad_share_rejected():
    def prog(fabric):
        sx = fabric.share_values(
            Scalar.from_ints([5]) if fabric.party_id == 0 else None, sender=0, n=1
        )
        if fabric.party_id == 0:
            sx = ScalarShare(sx.share + Scalar.from_ints(1), sx.mac)
        return fabric.open_authenticated(sx).to_ints()

    with pytest.raises(AuthenticationError):
        execute_mock_mpc_dealer(prog)


def test_inverse():
    n = 5
    xs = [rng.randrange(1, L) for _ in range(n)]

    def prog(fabric):
        sx = fabric.share_values(
            Scalar.from_ints(xs) if fabric.party_id == 0 else None, sender=0, n=n
        )
        inv = fabric.inverse(sx)
        return fabric.open_authenticated(inv).to_ints()

    r0, r1 = execute_mock_mpc_dealer(prog)
    assert r0 == [pow(x, -1, L) for x in xs]


def test_pow():
    x = rng.randrange(L)

    def prog(fabric):
        sx = fabric.share_values(
            Scalar.from_ints([x]) if fabric.party_id == 0 else None, sender=0, n=1
        )
        outs = [fabric.pow(sx, e) for e in (13, 1, 2, 0, 97)]
        return fabric.open_authenticated(
            ScalarShare.concatenate(outs)).to_ints()

    r0, r1 = execute_mock_mpc_dealer(prog)
    assert r0 == r1 == [pow(x, e, L) for e in (13, 1, 2, 0, 97)]


def test_sum_and_inner_product():
    """Inner-product circuit (`integration/src/circuits.rs` analog)."""
    n = 16
    xs = [rng.randrange(L) for _ in range(n)]
    ys = [rng.randrange(L) for _ in range(n)]
    want = sum(x * y for x, y in zip(xs, ys)) % L

    def prog(fabric):
        sx = fabric.share_values(
            Scalar.from_ints(xs) if fabric.party_id == 0 else None, sender=0, n=n
        )
        sy = fabric.share_values(
            Scalar.from_ints(ys) if fabric.party_id == 1 else None, sender=1, n=n
        )
        prod = fabric.mul(sx, sy)
        ip = prod.sum()
        return fabric.open_authenticated(ip).to_ints()

    r0, r1 = execute_mock_mpc_dealer(prog)
    assert r0 == r1 == [want]
