"""Pallas kernel math validation (interpreter mode on CPU)."""

import random

import jax.numpy as jnp
import numpy as np

from ark_mpc_tpu.algebra import limbs as lb
from ark_mpc_tpu.algebra.fields import SCALAR_FIELD as spec
from ark_mpc_tpu.ops.fp_kernels import BLOCK, mont_mul_pallas

rng = random.Random(71)
L = spec.modulus


def _pack(vals):
    return lb.pack_ints(spec, vals, mont=False)


def test_mont_mul_pallas_matches():
    n = BLOCK  # one tile
    a = [rng.randrange(L) for _ in range(n)]
    b = [rng.randrange(L) for _ in range(n)]
    xa, xb = _pack(a), _pack(b)
    got = lb.unpack_ints(spec, mont_mul_pallas(spec, xa, xb), mont=False)
    r_inv = pow(1 << 256, -1, L)
    want = [(u * v * r_inv) % L for u, v in zip(a, b)]
    assert got == want


def test_mont_mul_pallas_multi_tile():
    n = 2 * BLOCK
    a = [rng.randrange(L) for _ in range(n)]
    b = [rng.randrange(L) for _ in range(n)]
    got = lb.unpack_ints(spec, mont_mul_pallas(spec, _pack(a), _pack(b)),
                         mont=False)
    r_inv = pow(1 << 256, -1, L)
    assert got == [(u * v * r_inv) % L for u, v in zip(a, b)]


import os
import pytest


@pytest.mark.skipif(os.environ.get("RUN_TPU_KERNEL_TESTS") != "1",
                    reason="Pallas interpreter is impractically slow for the "
                           "fused Beaver kernel; validated on TPU (see "
                           "benchmarks/ and bench.py BENCH_PALLAS path)")
def test_beaver_round_pallas():
    from ark_mpc_tpu.ops.fp_kernels import beaver_round_pallas

    n = 64
    vals = {k: [rng.randrange(L) for _ in range(n)]
            for k in ("as_", "am", "bs", "bm", "cs", "cm", "d", "e", "k")}
    args = [_pack(vals[k]) for k in ("as_", "am", "bs", "bm", "cs", "cm",
                                     "d", "e", "k")]
    out_s, out_m = beaver_round_pallas(spec, 0, *args, block=64)
    r_inv = pow(1 << 256, -1, L)
    for j in (0, 7, n - 1):
        de = vals["d"][j] * vals["e"][j] * r_inv % L
        want_s = (vals["d"][j] * vals["bs"][j] * r_inv
                  + vals["e"][j] * vals["as_"][j] * r_inv
                  + vals["cs"][j] + de) % L
        want_m = (vals["d"][j] * vals["bm"][j] * r_inv
                  + vals["e"][j] * vals["am"][j] * r_inv
                  + vals["cm"][j] + vals["k"][j] * de * r_inv) % L
        got_s = lb.unpack_ints(spec, out_s[:, j : j + 1], mont=False)[0]
        got_m = lb.unpack_ints(spec, out_m[:, j : j + 1], mont=False)[0]
        assert got_s == want_s and got_m == want_m, j


@pytest.mark.slow
def test_ladder_pallas_interpret():
    """The Pallas ladder mega-kernel (ops/curve_kernels.py) against the
    XLA ladder, interpret mode, including the zero scalar and padding
    (n=3 pads to block=8)."""
    import numpy as np

    from ark_mpc_tpu.algebra.curve import CurvePoint, _scalar_mul
    from ark_mpc_tpu.algebra.fields import SCALAR_FIELD
    from ark_mpc_tpu.algebra.scalar import Scalar
    from ark_mpc_tpu.ops.curve_kernels import scalar_mul_pallas

    rng = np.random.default_rng(17)
    L = SCALAR_FIELD.modulus
    ks = [0] + [int(rng.integers(1, 2**63)) ** 4 % L for _ in range(2)]
    s = Scalar.from_ints(ks)
    pts = CurvePoint.generator((3,)).mul(Scalar.from_ints([5, 9, 11]))
    from ark_mpc_tpu.ops.curve_kernels import ladder_pallas

    want = _scalar_mul(pts, s)
    wx, wy = want.to_affine()
    got = scalar_mul_pallas(pts, s, block=8, kernel=ladder_pallas)
    gx, gy = got.to_affine()
    assert gx.to_ints() == wx.to_ints()
    assert gy.to_ints() == wy.to_ints()


@pytest.mark.slow
def test_windowed_pallas_interpret():
    """The 4-bit windowed mega-kernel against the XLA ladder in interpret
    mode.  Full 64-window emulation costs ~20 min on CPU, so this runs the
    low-8-windows variant (scalars < 2^32, spanning two 16-bit limbs) —
    table build, one-hot select, digit extraction across limbs, and the
    double/cached-add chain are all exercised; the full-width kernel is
    validated on hardware (BASELINE.md MSM table)."""
    import functools

    import numpy as np

    from ark_mpc_tpu.algebra.curve import CurvePoint, _scalar_mul
    from ark_mpc_tpu.algebra.scalar import Scalar
    from ark_mpc_tpu.ops.curve_kernels import (
        scalar_mul_pallas,
        windowed_mul_pallas,
    )

    rng = np.random.default_rng(23)
    ks = [0, 1, int(rng.integers(1, 1 << 32))]
    s = Scalar.from_ints(ks)
    pts = CurvePoint.generator((3,)).mul(Scalar.from_ints([5, 9, 11]))
    kern = functools.partial(windowed_mul_pallas, windows=8)
    got = scalar_mul_pallas(pts, s, block=8, kernel=kern)
    want = _scalar_mul(pts, s)
    gx, gy = got.to_affine()
    wx, wy = want.to_affine()
    assert gx.to_ints() == wx.to_ints()
    assert gy.to_ints() == wy.to_ints()


@pytest.mark.skipif(os.environ.get("RUN_TPU_KERNEL_TESTS") != "1",
                    reason="Pallas interpreter needs >20 min for the chained "
                           "kernel even at one tile; validated on TPU "
                           "(benchmarks/chain_kernel_check.py + bench.py)")
@pytest.mark.slow
def test_beaver_chain_pallas_interpret():
    """The headline chained mega-kernel (`beaver_chain_pallas`) vs the
    per-round fused-step reference, in interpret mode at one tile
    (n=1024, 2 rounds): final authenticated outputs AND every round's
    three MAC-check fold inner products must match exactly.  Mirrors the
    on-hardware check in `benchmarks/chain_kernel_check.py`."""
    import jax.numpy as jnp
    import numpy as np

    from ark_mpc_tpu.algebra.fields import SCALAR_FIELD as spec
    from ark_mpc_tpu.algebra.scalar import Scalar
    from ark_mpc_tpu.offline.base import TrustedDealerSource
    from ark_mpc_tpu.ops.fp_kernels import (
        beaver_chain_pallas,
        fold_columns_reduce,
        mont_mul_pallas,
    )
    from ark_mpc_tpu.parallel.step import beaver_mul_step

    n, rounds = 1024, 2
    rng = np.random.default_rng(7)
    dealer = TrustedDealerSource(0, seed=42)
    key0 = dealer.get_mac_key_share()
    key1 = dealer._mac_key_shares[1]
    x = Scalar.random(n, rng)
    y = Scalar.random(n, rng)
    x0, x1 = dealer._deal(x)
    y0, y1 = dealer._deal(y)
    av, bv = Scalar.random(n, rng), Scalar.random(n, rng)
    a0, a1 = dealer._deal(av)
    b0, b1 = dealer._deal(bv)
    c0, c1 = dealer._deal(av * bv)
    cf = Scalar.random(n, rng)

    e = (y0 - b0).share + (y1 - b1).share
    ea0 = Scalar(mont_mul_pallas(spec, e.limbs, a0.share.limbs))
    ea1 = Scalar(mont_mul_pallas(spec, e.limbs, a1.share.limbs))
    eam0 = Scalar(mont_mul_pallas(spec, e.limbs, a0.mac.limbs))
    eam1 = Scalar(mont_mul_pallas(spec, e.limbs, a1.mac.limbs))
    k0b = jnp.broadcast_to(key0.limbs.reshape(16, 1), (16, 128))
    k1b = jnp.broadcast_to(key1.limbs.reshape(16, 1), (16, 128))
    xf0_l, xf1_l, fold = beaver_chain_pallas(
        spec, rounds, x0.share.limbs, x1.share.limbs, e.limbs,
        a0.share.limbs, a1.share.limbs, b0.share.limbs, b1.share.limbs,
        b0.mac.limbs, b1.mac.limbs,
        c0.share.limbs, c1.share.limbs, c0.mac.limbs, c1.mac.limbs,
        ea0.limbs, ea1.limbs, eam0.limbs, eam1.limbs, k0b, k1b, cf.limbs)

    want_v, want_m0, want_m1 = [], [], []
    cx0, cx1 = x0, x1
    for _ in range(rounds):
        d = (cx0 - a0).share + (cx1 - a1).share
        z0 = beaver_mul_step(0, cx0, y0, a0, b0, c0, d, e, key0)
        z1 = beaver_mul_step(1, cx1, y1, a1, b1, c1, d, e, key1)
        v = z0.share + z1.share
        want_v.append((cf * v).sum())
        want_m0.append((cf * z0.mac).sum())
        want_m1.append((cf * z1.mac).sum())
        cx0, cx1 = z0, z1

    assert bool(jnp.all(xf0_l == cx0.share.limbs))
    assert bool(jnp.all(xf1_l == cx1.share.limbs))
    got = fold_columns_reduce(spec, fold)  # (16, rounds, 3)
    for r in range(rounds):
        for which, want in ((0, want_v[r]), (1, want_m0[r]),
                            (2, want_m1[r])):
            assert Scalar(got[:, r, which]).to_ints() == want.to_ints(), \
                f"fold[{r},{which}] mismatch"
