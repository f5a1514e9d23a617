"""Batched circuit scheduler tests: correctness AND round-fusion accounting."""

import random

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
