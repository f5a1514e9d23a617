"""Polynomial layer tests (public golden + mock-MPC authenticated)."""

import random

from ark_mpc_tpu.algebra.fields import CURVE25519_ORDER as L
from ark_mpc_tpu.algebra.poly import (
    AuthenticatedDensePoly,
    DensePoly,
    poly_div,
    poly_inverse_mod_t,
    poly_mul,
    poly_open,
)
from ark_mpc_tpu.algebra.scalar import Scalar
from ark_mpc_tpu.fabric.simulator import execute_mock_mpc_dealer

rng = random.Random(31)


def rand_poly(deg):
    c = [rng.randrange(L) for _ in range(deg + 1)]
    if c[-1] == 0:
        c[-1] = 1
    return c


def ref_mul(a, b):
    out = [0] * (len(a) + len(b) - 1)
    for i, x in enumerate(a):
        for j, y in enumerate(b):
            out[i + j] = (out[i + j] + x * y) % L
    return out


def test_public_mul_eval():
    a, b = rand_poly(5), rand_poly(3)
    pa, pb = DensePoly.from_ints(a), DensePoly.from_ints(b)
    assert (pa * pb).to_ints() == ref_mul(a, b)
    x = rng.randrange(L)
    want = sum(c * pow(x, i, L) for i, c in enumerate(a)) % L
    assert pa.eval(Scalar.from_ints([x])).to_ints() == [want]


def test_public_inverse_mod_t():
    a = rand_poly(6)
    a[0] = max(1, a[0])
    t = 5
    inv = DensePoly.from_ints(a).inverse_mod_t(t)
    prod = ref_mul(a, inv.to_ints())[:t]
    assert prod == [1] + [0] * (t - 1)


def test_public_floordiv():
    f, g = rand_poly(7), rand_poly(3)
    q = (DensePoly.from_ints(f) // DensePoly.from_ints(g)).to_ints()
    # check deg(f - q*g) < deg(g)
    qg = ref_mul(q, g)
    rem = [(a - b) % L for a, b in zip(f + [0] * 8, qg + [0] * 8)]
    # deg(f - q*g) < deg(g) = 3, so coefficients 3..7 vanish
    assert all(v == 0 for v in rem[3:8])


def test_shared_poly_mul_and_eval():
    a, b = rand_poly(4), rand_poly(2)
    want = ref_mul(a, b)
    x = rng.randrange(L)
    want_eval = sum(c * pow(x, i, L) for i, c in enumerate(want)) % L

    def prog(fabric):
        sa = AuthenticatedDensePoly(fabric.share_values(
            Scalar.from_ints(a) if fabric.party_id == 0 else None,
            sender=0, n=len(a)))
        sb = AuthenticatedDensePoly(fabric.share_values(
            Scalar.from_ints(b) if fabric.party_id == 1 else None,
            sender=1, n=len(b)))
        prod = poly_mul(fabric, sa, sb)
        ev = prod.eval(Scalar.from_ints(x))
        coeffs = poly_open(fabric, prod).to_ints()
        ev_open = fabric.open_authenticated(ev).to_ints()
        return coeffs, ev_open

    (c0, e0), (c1, e1) = execute_mock_mpc_dealer(prog)
    assert c0 == want and c1 == want
    assert e0 == e1 == [want_eval]


def test_shared_poly_inverse_and_div():
    f = rand_poly(6)
    f[0] = max(1, f[0])
    g = rand_poly(2)
    t = 4

    def prog(fabric):
        sf = AuthenticatedDensePoly(fabric.share_values(
            Scalar.from_ints(f) if fabric.party_id == 0 else None,
            sender=0, n=len(f)))
        inv = poly_inverse_mod_t(fabric, sf, t)
        inv_open = poly_open(fabric, inv).to_ints()
        q = poly_div(fabric, sf, DensePoly.from_ints(g))
        q_open = poly_open(fabric, q).to_ints()
        return inv_open, q_open

    (inv0, q0), _ = execute_mock_mpc_dealer(prog)
    assert ref_mul(f, inv0)[:t] == [1] + [0] * (t - 1)
    qg = ref_mul(q0, g)
    rem = [(a - b) % L for a, b in zip(f + [0] * 8, qg + [0] * 8)]
    assert all(v == 0 for v in rem[len(g) - 1 : len(f)])
