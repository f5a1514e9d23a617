"""Gadget layer tests (`gadgets.rs:163-309` analogs) + domain/sqrt."""

import random

import numpy as np

from ark_mpc_tpu import Scalar
from ark_mpc_tpu.algebra.domain import EvaluationDomain
from ark_mpc_tpu.algebra.fields import CURVE25519_ORDER as L
from ark_mpc_tpu.fabric.simulator import execute_mock_mpc_dealer
from ark_mpc_tpu.gadgets import bit_xor, bit_xor_public, prefix_product

rng = random.Random(83)


def test_bit_xor():
    a_bits = [rng.randrange(2) for _ in range(8)]
    b_bits = [rng.randrange(2) for _ in range(8)]
    want = [x ^ y for x, y in zip(a_bits, b_bits)]

    def prog(fabric):
        sa = fabric.share_values(
            Scalar.from_ints(a_bits) if fabric.party_id == 0 else None,
            sender=0, n=8)
        sb = fabric.share_values(
            Scalar.from_ints(b_bits) if fabric.party_id == 1 else None,
            sender=1, n=8)
        res = bit_xor(fabric, sa, sb)
        pub = bit_xor_public(fabric, sa, Scalar.from_ints(b_bits))
        return (fabric.open_authenticated(res).to_ints(),
                fabric.open_authenticated(pub).to_ints())

    (r0, p0), (r1, p1) = execute_mock_mpc_dealer(prog)
    assert r0 == r1 == want
    assert p0 == p1 == want


def test_prefix_product():
    vals = [rng.randrange(1, L) for _ in range(6)]
    want = []
    acc = 1
    for v in vals:
        acc = acc * v % L
        want.append(acc)

    def prog(fabric):
        sv = fabric.share_values(
            Scalar.from_ints(vals) if fabric.party_id == 0 else None,
            sender=0, n=6)
        res = prefix_product(fabric, sv)
        return fabric.open_authenticated(res).to_ints()

    r0, r1 = execute_mock_mpc_dealer(prog)
    assert r0 == r1 == want


def test_evaluation_domain_roundtrip_and_shares():
    n = 12  # divides 132
    dom = EvaluationDomain(n)
    coeffs = [rng.randrange(L) for _ in range(n)]
    evals = dom.fft(Scalar.from_ints(coeffs))
    # golden: evaluate the polynomial at w^i
    w = dom.group_gen
    want = [sum(c * pow(w, i * j, L) for j, c in enumerate(coeffs)) % L
            for i in range(n)]
    assert evals.to_ints() == want
    back = dom.ifft(evals)
    assert back.to_ints() == coeffs

    def prog(fabric):
        sh = fabric.share_values(
            Scalar.from_ints(coeffs) if fabric.party_id == 0 else None,
            sender=0, n=n)
        tf = dom.fft_shares(sh)
        rt = dom.fft_shares(tf, forward=False)
        return fabric.open_authenticated(rt).to_ints()

    r0, _ = execute_mock_mpc_dealer(prog)
    assert r0 == coeffs


def test_scalar_sqrt():
    vals = [rng.randrange(L) for _ in range(6)]
    squares = [v * v % L for v in vals]
    roots, mask = Scalar.from_ints(squares).sqrt()
    assert mask.all()
    got = roots.to_ints()
    for g, v in zip(got, vals):
        assert g in (v, L - v)
    # non-residue detection
    nr = 2
    while pow(nr, (L - 1) // 2, L) == 1:
        nr += 1
    _, m2 = Scalar.from_ints([nr]).sqrt()
    assert not m2.all()
