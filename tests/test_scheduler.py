"""Batched circuit scheduler tests: correctness AND round-fusion accounting."""

import random

import pytest

from ark_mpc_tpu import Scalar
from ark_mpc_tpu.fabric.simulator import execute_mock_mpc_dealer

rng = random.Random(53)
from ark_mpc_tpu.algebra.fields import CURVE25519_ORDER as L


def test_traced_circuit_fuses_rounds():
    """Independent muls at one level must share ONE exchange; all opens one
    flush; one deferred MAC-check round."""
    xs = [rng.randrange(L) for _ in range(4)]
    ys = [rng.randrange(L) for _ in range(4)]

    def prog(fabric):
        sx = fabric.share_values(
            Scalar.from_ints(xs) if fabric.party_id == 0 else None, sender=0, n=4
        )
        sy = fabric.share_values(
            Scalar.from_ints(ys) if fabric.party_id == 1 else None, sender=1, n=4
        )
        base = fabric.n_rounds
        tr = fabric.tracer()
        x, y = tr.wrap(sx), tr.wrap(sy)
        # level 1: three independent muls -> ONE exchange
        a = x * y
        b = x * x
        c = y * y
        # level 2: depends on level 1
        d = a * b
        e = (c + d) * Scalar.from_ints(3) - x
        oa, oe = a.open(), e.open()
        tr.run()
        rounds_used = fabric.n_rounds - base
        return oa.value.to_ints(), oe.value.to_ints(), rounds_used

    (a0, e0, r0), (a1, e1, r1) = execute_mock_mpc_dealer(prog)
    want_a = [(x * y) % L for x, y in zip(xs, ys)]
    want_e = [
        ((y * y + (x * y) * (x * x)) * 3 - x) % L for x, y in zip(xs, ys)
    ]
    assert a0 == a1 == want_a
    assert e0 == e1 == want_e
    # 2 mul levels + 1 open flush + 3 deferred-MAC-check exchanges = 6
    assert r0 == r1 == 6


def test_traced_inverse_and_sum():
    xs = [rng.randrange(1, L) for _ in range(3)]

    def prog(fabric):
        sx = fabric.share_values(
            Scalar.from_ints(xs) if fabric.party_id == 0 else None, sender=0, n=3
        )
        tr = fabric.tracer()
        x = tr.wrap(sx)
        inv = x.inverse()
        total = (x * inv).sum()
        o = total.open()
        tr.run()
        return o.value.to_ints()

    r0, r1 = execute_mock_mpc_dealer(prog)
    assert r0 == r1 == [3]


@pytest.mark.slow
def test_traced_point_circuit():
    """Traced point ops: fused scalar-x-point Beaver level + point open
    flush + one deferred check round."""
    from ark_mpc_tpu.algebra.curve import CurvePoint

    ks = [rng.randrange(L) for _ in range(2)]
    pts = CurvePoint.generator((2,)).mul(Scalar.from_ints([5, 9]))

    def prog(fabric):
        sp = fabric.share_points(
            pts if fabric.party_id == 0 else None, sender=0, n=2)
        sk = fabric.share_values(
            Scalar.from_ints(ks) if fabric.party_id == 1 else None,
            sender=1, n=2)
        tr = fabric.tracer()
        p, k = tr.wrap_points(sp), tr.wrap(sk)
        prod = p.mul(k)            # Beaver scalar x point (one fused round)
        expr = prod + p            # linear, free
        total = expr.sum()         # MSM-style reduction
        o1, o2 = expr.open(), total.open()
        tr.run()
        def aff(pt):
            x, y = pt.to_affine()
            return list(zip(x.to_ints(), y.to_ints()))
        return aff(o1.value), aff(o2.value.reshape(1))

    (e0, t0), (e1, t1) = execute_mock_mpc_dealer(prog)
    assert e0 == e1 and t0 == t1
    # golden: (k_i + 1) * P_i and the sum
    base = [5, 9]
    want_scalars = [(k + 1) * b % L for k, b in zip(ks, base)]
    want_pts = CurvePoint.generator((2,)).mul(Scalar.from_ints(want_scalars))
    x, y = want_pts.to_affine()
    assert e0 == list(zip(x.to_ints(), y.to_ints()))
    s = want_pts.sum()
    sx, sy = s.to_affine()
    assert t0 == [(sx.to_int(), sy.to_int())]


@pytest.mark.slow
def test_traced_pow():
    """Square-and-multiply power inside a trace; two pows of the same depth
    share Beaver rounds."""
    x, y = rng.randrange(L), rng.randrange(L)

    def prog(fabric):
        sx = fabric.share_values(
            Scalar.from_ints([x, y]) if fabric.party_id == 0 else None,
            sender=0, n=2)
        tr = fabric.tracer()
        v = tr.wrap(sx)
        p13 = v.pow(13)
        p1 = v ** 1
        p0 = v ** 0
        o13, o1, o0 = p13.open(), p1.open(), p0.open()
        tr.run()
        return o13.value.to_ints(), o1.value.to_ints(), o0.value.to_ints()

    r0, r1 = execute_mock_mpc_dealer(prog)
    want = ([pow(x, 13, L), pow(y, 13, L)], [x, y], [1, 1])
    assert r0 == r1 == want


@pytest.mark.slow
def test_traced_open_reuse():
    """Mid-circuit opened values feed LATER traced computation
    (`fabric.rs:820-870` arbitrary dataflow through opens)."""
    xs = [rng.randrange(L) for _ in range(3)]
    ys = [rng.randrange(L) for _ in range(3)]

    def prog(fabric):
        sx = fabric.share_values(
            Scalar.from_ints(xs) if fabric.party_id == 0 else None,
            sender=0, n=3)
        sy = fabric.share_values(
            Scalar.from_ints(ys) if fabric.party_id == 1 else None,
            sender=1, n=3)
        tr = fabric.tracer()
        x, y = tr.wrap(sx), tr.wrap(sy)
        p = x * y
        po = p.open()
        pub = po.as_public()             # opened product as a public value
        q = y * pub + x - pub            # share ops against the opened value
        r = (pub * pub).inverse() * x    # public arithmetic + apply(inverse)
        oq, orr = q.open(), r.open()
        tr.run()
        return po.value.to_ints(), oq.value.to_ints(), orr.value.to_ints()

    (p0, q0, r0), (p1, q1, r1) = execute_mock_mpc_dealer(prog)
    want_p = [(a * b) % L for a, b in zip(xs, ys)]
    want_q = [(b * p + a - p) % L for a, b, p in zip(xs, ys, want_p)]
    want_r = [pow(p * p, -1, L) * a % L for a, p in zip(xs, want_p)]
    assert p0 == p1 == want_p
    assert q0 == q1 == want_q
    assert r0 == r1 == want_r


@pytest.mark.slow
def test_traced_gadgets():
    """bit_xor and prefix_product accept TracedShare operands."""
    from ark_mpc_tpu.gadgets import bit_xor, bit_xor_public, prefix_product

    a_bits = [rng.randrange(2) for _ in range(4)]
    b_bits = [rng.randrange(2) for _ in range(4)]
    vals = [rng.randrange(1, L) for _ in range(4)]

    def prog(fabric):
        sa = fabric.share_values(
            Scalar.from_ints(a_bits) if fabric.party_id == 0 else None,
            sender=0, n=4)
        sb = fabric.share_values(
            Scalar.from_ints(b_bits) if fabric.party_id == 1 else None,
            sender=1, n=4)
        sv = fabric.share_values(
            Scalar.from_ints(vals) if fabric.party_id == 0 else None,
            sender=0, n=4)
        tr = fabric.tracer()
        ta, tb, tv = tr.wrap(sa), tr.wrap(sb), tr.wrap(sv)
        x = bit_xor(fabric, ta, tb)
        xp = bit_xor_public(fabric, ta, Scalar.from_ints(b_bits))
        pp = prefix_product(fabric, tv)
        ox, oxp, opp = x.open(), xp.open(), pp.open()
        tr.run()
        return (ox.value.to_ints(), oxp.value.to_ints(), opp.value.to_ints())

    (x0, xp0, pp0), (x1, xp1, pp1) = execute_mock_mpc_dealer(prog)
    want_x = [u ^ v for u, v in zip(a_bits, b_bits)]
    want_pp, acc = [], 1
    for v in vals:
        acc = acc * v % L
        want_pp.append(acc)
    assert x0 == x1 == want_x
    assert xp0 == xp1 == want_x
    assert pp0 == pp1 == want_pp


@pytest.mark.slow
def test_deep_chain_one_million_gates():
    """1M-gate linear chain (`fabric.rs:986-1002` analog): the iterative
    traversal must not hit the Python recursion limit."""
    def prog(fabric):
        sx = fabric.share_values(
            Scalar.from_ints([1]) if fabric.party_id == 0 else None,
            sender=0, n=1)
        tr = fabric.tracer()
        x = tr.wrap(sx)
        v = x
        for _ in range(1_000_000):
            v = v + x
        o = v.open()
        tr.run()
        return o.value.to_ints()

    r0, r1 = execute_mock_mpc_dealer(prog)
    assert r0 == r1 == [1_000_001]


def test_deep_mul_chain():
    """A few hundred SEQUENTIAL Beaver levels through the tracer."""
    def prog(fabric):
        sx = fabric.share_values(
            Scalar.from_ints([2]) if fabric.party_id == 0 else None,
            sender=0, n=1)
        tr = fabric.tracer()
        v = tr.wrap(sx)
        x = v
        for _ in range(200):
            v = v * x
        o = v.open()
        tr.run()
        return o.value.to_ints()

    r0, r1 = execute_mock_mpc_dealer(prog)
    assert r0 == r1 == [pow(2, 201, L)]


def test_affine_form_term_cap_tree_sum():
    """A wide pairwise-add tree drives affine forms past _MAX_TERMS,
    exercising the materialize-a-base path; result must equal the
    plain sum."""
    n = 64
    vals = [rng.randrange(L) for _ in range(n)]

    def prog(fabric):
        sv = fabric.share_values(
            Scalar.from_ints(vals) if fabric.party_id == 0 else None,
            sender=0, n=n)
        tr = fabric.tracer()
        leaves = [tr.wrap(sv[i:i + 1]) for i in range(n)]
        while len(leaves) > 1:
            leaves = [leaves[i] + leaves[i + 1]
                      for i in range(0, len(leaves), 2)]
        o = leaves[0].open()
        tr.run()
        return o.value.to_ints()

    r0, r1 = execute_mock_mpc_dealer(prog)
    assert r0 == r1 == [sum(vals) % L]


def test_affine_form_mixed_coefficients():
    """Static Scalar coefficients, negations, public offsets, and an
    opened-value (dynamic) multiply all composed in one trace."""
    x_v, y_v = rng.randrange(L), rng.randrange(L)
    k1, k2, c = rng.randrange(L), rng.randrange(L), rng.randrange(L)

    def prog(fabric):
        sx = fabric.share_values(
            Scalar.from_ints([x_v]) if fabric.party_id == 0 else None,
            sender=0, n=1)
        sy = fabric.share_values(
            Scalar.from_ints([y_v]) if fabric.party_id == 1 else None,
            sender=1, n=1)
        tr = fabric.tracer()
        tx, ty = tr.wrap(sx), tr.wrap(sy)
        lin = tx * Scalar.from_ints(k1) - ty * Scalar.from_ints(k2) \
            + Scalar.from_ints(c) - (-ty)
        op = (tx * ty).open()          # mid-circuit open
        dyn = lin * op.as_public()     # dynamic public coefficient
        o = dyn.open()
        tr.run()
        return o.value.to_ints()

    r0, r1 = execute_mock_mpc_dealer(prog)
    lin = (x_v * k1 - y_v * k2 + c + y_v) % L
    want = lin * (x_v * y_v % L) % L
    assert r0 == r1 == [want]
