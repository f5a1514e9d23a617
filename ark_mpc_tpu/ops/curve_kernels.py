"""Pallas mega-kernel for Ed25519 scalar multiplication.

The XLA ladder (`algebra/curve.py:_scalar_mul`) runs ~500 dependent group
ops per scalar-mul, each lowered to many small kernels — at TPU dispatch
granularity that is launch-overhead-bound (~0.2 ms per group op measured,
independent of batch width).  This kernel runs the ENTIRE 256-step
double-and-select ladder inside one `pallas_call`: a (16, BLOCK) tile of
each extended coordinate stays VMEM-resident for all 256 steps (the same
structure as the `beaver_chain_pallas` headline kernel), so the cost is
pure field-mul arithmetic: 256 steps x ~17 base-field muls per step.

Reference analog: `curve.rs:546-584` scalar_mul/MSM; the bucketed
Pippenger alternative is `algebra/curve.py:_msm_pippenger` — see
`benchmarks/msm.py` and BASELINE.md for the measured comparison.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..algebra import limbs as lb
from ..algebra.fields import BASE_FIELD, SCALAR_FIELD
from ..algebra.limbs import NLIMBS
from .fp_kernels import _add_mod, _interpret, _sub_mod

BLOCK = 512

# Edwards 2d = 2 * (-121665/121666) mod 2^255-19, as 16-bit limbs (the
# base field is pseudo-Mersenne: internal form == canonical form).
_P = (1 << 255) - 19
_ED_2D = (2 * (-121665 * pow(121666, -1, _P))) % _P
_ED_2D_LIMBS = tuple((_ED_2D >> (16 * i)) & 0xFFFF for i in range(NLIMBS))


def _bmul(x, y):
    """Base-field product on a tile (pseudo-Mersenne fold, all in VMEM)."""
    return lb._pm_fold(BASE_FIELD, [r for r in lb._conv_columns(x, y)])


def _double(B, x, y, z, t):
    a = _bmul(x, x)
    b = _bmul(y, y)
    zz = _bmul(z, z)
    c = _add_mod(B, zz, zz)
    h = _add_mod(B, a, b)
    xy = _add_mod(B, x, y)
    e = _sub_mod(B, h, _bmul(xy, xy))
    g = _sub_mod(B, a, b)
    f = _add_mod(B, c, g)
    return _bmul(e, f), _bmul(g, h), _bmul(f, g), _bmul(e, h)


def _padd(B, x1, y1, z1, t1, x2, y2, z2, t2, d2):
    a = _bmul(_sub_mod(B, y1, x1), _sub_mod(B, y2, x2))
    b = _bmul(_add_mod(B, y1, x1), _add_mod(B, y2, x2))
    c = _bmul(_bmul(t1, t2), d2)
    dd = _bmul(z1, z2)
    dd = _add_mod(B, dd, dd)
    e = _sub_mod(B, b, a)
    f = _sub_mod(B, dd, c)
    g = _add_mod(B, dd, c)
    h = _add_mod(B, b, a)
    return _bmul(e, f), _bmul(g, h), _bmul(f, g), _bmul(e, h)


def _double_no_t(B, x, y, z):
    """Doubling without the T output (7 muls): only the double feeding an
    addition needs extended T."""
    a = _bmul(x, x)
    b = _bmul(y, y)
    zz = _bmul(z, z)
    c = _add_mod(B, zz, zz)
    h = _add_mod(B, a, b)
    xy = _add_mod(B, x, y)
    e = _sub_mod(B, h, _bmul(xy, xy))
    g = _sub_mod(B, a, b)
    f = _add_mod(B, c, g)
    return _bmul(e, f), _bmul(g, h), _bmul(f, g)


def _padd_cached(B, x1, y1, z1, t1, cp, cq, cr, cz):
    """Extended + cached-form point (cp, cq, cr, cz) = (Y−X, Y+X, 2d·T, Z):
    8 base-field muls (dalek's cached-operand trick — one fewer mul and no
    2d product per step vs `_padd`)."""
    a = _bmul(_sub_mod(B, y1, x1), cp)
    b = _bmul(_add_mod(B, y1, x1), cq)
    c = _bmul(t1, cr)
    dd = _bmul(z1, cz)
    dd = _add_mod(B, dd, dd)
    e = _sub_mod(B, b, a)
    f = _sub_mod(B, dd, c)
    g = _add_mod(B, dd, c)
    h = _add_mod(B, b, a)
    return _bmul(e, f), _bmul(g, h), _bmul(f, g), _bmul(e, h)


WBLOCK = 256


@functools.partial(jax.jit, static_argnames=("block", "windows"))
def windowed_mul_pallas(canon, px, py, pz, pt, block: int = WBLOCK,
                        windows: int = 64):
    """Batch scalar-mul via a 4-bit fixed-window mega-kernel.

    Per (16, block) tile: build the 16-entry multiples table of P once
    (VMEM-resident, cached form), then 64 window steps of 3 T-less doubles +
    1 full double + 1 cached add with a one-hot table select.  ~10.3 muls/
    bit vs the plain ladder's 17 (~1.65x by op count; hardware numbers in
    BASELINE.md's MSM table via `benchmarks/msm.py`).
    Same interface as `ladder_pallas`; reference analog of the windowed
    strategy: arkworks' scalar_mul windows (`curve.rs:546-584`).

    `windows < 64` processes only the LOW `windows` 4-bit windows (i.e.
    computes (s mod 2^(4*windows)) * P) — a test knob: the interpret-mode
    CI check runs a few windows instead of paying the full 64-step
    emulation."""
    n = canon.shape[1]
    assert n % block == 0, f"n must be a multiple of {block}"
    B = BASE_FIELD

    def kernel(s_r, x_r, y_r, z_r, t_r, ox, oy, oz, ot):
        canon_t = s_r[...]
        P = (x_r[...], y_r[...], z_r[...], t_r[...])
        w = canon_t.shape[1]
        zero = jnp.zeros((NLIMBS, w), jnp.uint32)
        one = jnp.concatenate(
            [jnp.ones((1, w), jnp.uint32), jnp.zeros((NLIMBS - 1, w), jnp.uint32)], 0)
        d2 = jnp.concatenate(
            [jnp.full((1, w), v, jnp.uint32) for v in _ED_2D_LIMBS], 0)

        # multiples table 0..15 in extended coords (evens by doubling the
        # half entry, odds by adding P — 7 full doubles + 7 adds, one-time)
        ext = [(zero, one, one, zero), P]
        for k in range(2, 16):
            if k % 2 == 0:
                ext.append(_double(B, *ext[k // 2]))
            else:
                ext.append(_padd(B, *ext[k - 1], *P, d2))
        # cached form: (Y−X, Y+X, 2d·T, Z), stacked on a leading entry axis
        cp = jnp.stack([_sub_mod(B, y, x) for (x, y, z, t) in ext])
        cq = jnp.stack([_add_mod(B, y, x) for (x, y, z, t) in ext])
        cr = jnp.stack([_bmul(d2, t) for (x, y, z, t) in ext])
        cz = jnp.stack([z for (x, y, z, t) in ext])
        # broadcasted_iota, not arange+reshape: mosaic's layout inference
        # rejects the (1,16)->(16,1,1) shape cast on current libtpu
        ids = jax.lax.broadcasted_iota(jnp.uint32, (16, 1, w), 0)

        def body(i, acc):
            off = (windows - 1 - i) * 4  # 4-bit windows stay within a limb
            li = off >> 4
            sh = (off & 15).astype(jnp.uint32)
            row = canon_t[0]
            for r in range(1, NLIMBS):
                row = jnp.where(li == r, canon_t[r], row)
            digit = (row >> sh) & 15  # (w,)

            x, y, z, t = acc
            for _ in range(3):
                x, y, z = _double_no_t(B, x, y, z)
            x, y, z, t = _double(B, x, y, z, t)

            hit = digit[None, None, :] == ids  # (16, 1, w)
            # mosaic can't reduce unsigned ints; limbs < 2^16 and exactly
            # one entry hits, so an int32 sum is exact
            sel = [jnp.where(hit, comp, 0).astype(jnp.int32)
                   .sum(axis=0).astype(jnp.uint32)
                   for comp in (cp, cq, cr, cz)]
            return _padd_cached(B, x, y, z, t, *sel)

        x, y, z, t = jax.lax.fori_loop(0, windows, body,
                                       (zero, one, one, zero))
        ox[...] = x
        oy[...] = y
        oz[...] = z
        ot[...] = t

    tile = pl.BlockSpec((NLIMBS, block), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    out = jax.ShapeDtypeStruct((NLIMBS, n), jnp.uint32)
    return pl.pallas_call(
        kernel,
        grid=(n // block,),
        in_specs=[tile] * 5,
        out_specs=(tile, tile, tile, tile),
        out_shape=(out, out, out, out),
        interpret=_interpret(),
    )(canon, px, py, pz, pt)


@functools.partial(jax.jit, static_argnames=("block",))
def ladder_pallas(canon, px, py, pz, pt, block: int = BLOCK):
    """Batch scalar-mul: canon (16, n) CANONICAL scalar limbs, p* (16, n)
    extended point coords; n % block == 0.  Returns (x, y, z, t)."""
    n = canon.shape[1]
    assert n % block == 0, f"n must be a multiple of {block}"
    B = BASE_FIELD

    def kernel(s_r, x_r, y_r, z_r, t_r, ox, oy, oz, ot):
        canon_t = s_r[...]
        P = (x_r[...], y_r[...], z_r[...], t_r[...])
        w = canon_t.shape[1]
        zero = jnp.zeros((NLIMBS, w), jnp.uint32)
        one = jnp.concatenate(
            [jnp.ones((1, w), jnp.uint32), jnp.zeros((NLIMBS - 1, w), jnp.uint32)], 0)
        # build the 2d constant from python scalars (a closed-over array
        # would trip pallas' captured-constant check)
        d2 = jnp.concatenate(
            [jnp.full((1, w), v, jnp.uint32) for v in _ED_2D_LIMBS], 0)

        def body(i, acc):
            bit_index = 255 - i
            li = bit_index >> 4
            sh = (bit_index & 15).astype(jnp.uint32)
            row = canon_t[0]
            for r in range(1, NLIMBS):
                row = jnp.where(li == r, canon_t[r], row)
            bit = ((row >> sh) & 1) == 1  # (w,)
            dx, dy, dz, dt_ = _double(B, *acc)
            ax, ay, az, at_ = _padd(B, dx, dy, dz, dt_, *P, d2)
            sel = bit[None, :]
            return (jnp.where(sel, ax, dx), jnp.where(sel, ay, dy),
                    jnp.where(sel, az, dz), jnp.where(sel, at_, dt_))

        x, y, z, t = jax.lax.fori_loop(0, 256, body, (zero, one, one, zero))
        ox[...] = x
        oy[...] = y
        oz[...] = z
        ot[...] = t

    tile = pl.BlockSpec((NLIMBS, block), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    out = jax.ShapeDtypeStruct((NLIMBS, n), jnp.uint32)
    return pl.pallas_call(
        kernel,
        grid=(n // block,),
        in_specs=[tile] * 5,
        out_specs=(tile, tile, tile, tile),
        out_shape=(out, out, out, out),
        interpret=_interpret(),
    )(canon, px, py, pz, pt)


def window_sums_pallas(canon, px, py, pz, pt, block: int = WBLOCK,
                       windows: int = 64):
    """Per-window partial MSM sums — the gather-free Pippenger core.

    For each 4-bit window w, computes the lane-distributed group sum
    S_w[lane] over all grid blocks of digit_w(s_i) * P_i (the caller
    finishes with a cross-lane reduce and a 64-step Horner:
    result = sum_w 2^(4w) * S_w).  The point of the restructure vs
    `windowed_mul_pallas`: the ladder pays 4 doublings PER POINT per
    window (64 x ~29 muls/pt); here every point pays only the one-hot
    table select + ONE cached add into a shared VMEM accumulator
    (64 x 8 muls/pt + a one-time 16-entry table ~ 113), and the
    doublings happen once, on the accumulated window sums, in the
    epilogue.  ~690 vs ~2400 base-field muls per point.  Same work
    shape as arkworks' bucketed Pippenger (`curve.rs:549-584`) but with
    the 16 buckets realised as a one-hot select instead of a gather —
    no sort, no rank grid (the measured downfall of
    `ops/msm_kernels.py`, BASELINE.md round-5 MSM table).

    The 4 outputs are (windows, NLIMBS, block) extended coords; the
    grid revisits them (constant index_map) so they stay VMEM-resident
    across all n/block sequential steps.  `windows < 64` accumulates
    only the LOW `windows` windows (test knob, as in
    `windowed_mul_pallas`)."""
    n = canon.shape[1]
    assert n % block == 0, f"n must be a multiple of {block}"
    B = BASE_FIELD

    def kernel(s_r, x_r, y_r, z_r, t_r, ox, oy, oz, ot):
        pid = pl.program_id(0)
        canon_t = s_r[...]
        P = (x_r[...], y_r[...], z_r[...], t_r[...])
        w = canon_t.shape[1]
        zero = jnp.zeros((NLIMBS, w), jnp.uint32)
        one = jnp.concatenate(
            [jnp.ones((1, w), jnp.uint32), jnp.zeros((NLIMBS - 1, w), jnp.uint32)], 0)
        d2 = jnp.concatenate(
            [jnp.full((1, w), v, jnp.uint32) for v in _ED_2D_LIMBS], 0)

        # 16-entry multiples table, cached form (as in windowed_mul_pallas);
        # entry 0 is the identity, whose cached form adds as a no-op under
        # the complete Edwards addition law (zero-digit lanes cost nothing
        # extra and stay correct).
        ext = [(zero, one, one, zero), P]
        for k in range(2, 16):
            if k % 2 == 0:
                ext.append(_double(B, *ext[k // 2]))
            else:
                ext.append(_padd(B, *ext[k - 1], *P, d2))
        cp = jnp.stack([_sub_mod(B, y, x) for (x, y, z, t) in ext])
        cq = jnp.stack([_add_mod(B, y, x) for (x, y, z, t) in ext])
        cr = jnp.stack([_bmul(d2, t) for (x, y, z, t) in ext])
        cz = jnp.stack([z for (x, y, z, t) in ext])
        ids = jax.lax.broadcasted_iota(jnp.uint32, (16, 1, w), 0)
        init = pid == 0

        def body(i, _):
            off = i * 4  # LSW-first; 4-bit windows stay within a limb
            li = off >> 4
            sh = (off & 15).astype(jnp.uint32)
            row = canon_t[0]
            for r in range(1, NLIMBS):
                row = jnp.where(li == r, canon_t[r], row)
            digit = (row >> sh) & 15  # (w,)
            hit = digit[None, None, :] == ids
            sel = [jnp.where(hit, comp, 0).astype(jnp.int32)
                   .sum(axis=0).astype(jnp.uint32)
                   for comp in (cp, cq, cr, cz)]

            idx = (pl.dslice(i, 1), slice(None), slice(None))
            # first grid step: accumulators start at the identity (the
            # pre-write VMEM contents are junk and must not be read into
            # the group law)
            ax = jnp.where(init, zero, ox[idx][0])
            ay = jnp.where(init, one, oy[idx][0])
            az = jnp.where(init, one, oz[idx][0])
            at_ = jnp.where(init, zero, ot[idx][0])
            nx, ny, nz, nt = _padd_cached(B, ax, ay, az, at_, *sel)
            ox[idx] = nx[None]
            oy[idx] = ny[None]
            oz[idx] = nz[None]
            ot[idx] = nt[None]
            return 0

        jax.lax.fori_loop(0, windows, body, 0)

    tile = pl.BlockSpec((NLIMBS, block), lambda i: (0, i),
                        memory_space=pltpu.VMEM)
    acc_tile = pl.BlockSpec((windows, NLIMBS, block), lambda i: (0, 0, 0),
                            memory_space=pltpu.VMEM)
    out = jax.ShapeDtypeStruct((windows, NLIMBS, block), jnp.uint32)
    return pl.pallas_call(
        kernel,
        grid=(n // block,),
        in_specs=[tile] * 5,
        out_specs=(acc_tile,) * 4,
        out_shape=(out,) * 4,
        interpret=_interpret(),
    )(canon, px, py, pz, pt)


def msm_windowsum_pallas(point, scalar, block: int = WBLOCK,
                         windows: int = 64):
    """Full MSM via `window_sums_pallas`: one kernel launch for the
    window sums, then (inside the enclosing jit) a log-depth cross-lane
    tree reduce batched over all windows and an unrolled 64-step Horner
    (4 doublings + 1 add per window, on ONE point).  `curve.rs:549-584`
    analog; measured against the windowed ladder in `benchmarks/msm.py`."""
    from ..algebra.curve import CurvePoint

    shape = jnp.broadcast_shapes(point.shape, scalar.shape)
    n = 1
    for s in shape:
        n *= int(s)
    pt = point.broadcast_to(shape).reshape(n)
    sc = scalar.broadcast_to(shape).reshape(n)
    canon = lb.from_mont(SCALAR_FIELD, sc.limbs)
    pad = (-n) % block
    if pad:
        # pad scalars with 0 (selects the identity table entry every
        # window) and points with the identity so the padded tables stay
        # well-formed
        zcol = jnp.zeros((NLIMBS, pad), jnp.uint32)
        onecol = jnp.concatenate(
            [jnp.ones((1, pad), jnp.uint32),
             jnp.zeros((NLIMBS - 1, pad), jnp.uint32)], 0)
        canon_p = jnp.concatenate([canon, zcol], axis=1)
        cx, cy, cz, ct = (c.limbs for c in pt._coords())
        coords = [jnp.concatenate([cx, zcol], axis=1),
                  jnp.concatenate([cy, onecol], axis=1),
                  jnp.concatenate([cz, onecol], axis=1),
                  jnp.concatenate([ct, zcol], axis=1)]
    else:
        canon_p = canon
        coords = [c.limbs for c in pt._coords()]
    wx, wy, wz, wt = window_sums_pallas(canon_p, *coords, block=block,
                                        windows=windows)
    fp = type(pt.X)
    # (windows, NLIMBS, block) -> CurvePoint with batch (windows, block)
    S = CurvePoint(*(fp(jnp.transpose(a, (1, 0, 2)))
                     for a in (wx, wy, wz, wt)))
    S = S.sum(axis=1)  # batch (windows,): tree over lanes, windows batched
    slimbs = [c.limbs for c in S._coords()]  # each (NLIMBS, windows)

    # Horner MSW-first: acc = 16*acc + S_w.  fori_loop, not unrolled — an
    # unrolled 64 x (4 doubles + add) epilogue is ~3k base-field convs of
    # static graph, minutes of XLA compile through the remote tunnel.
    def body(j, acc):
        w = windows - 1 - j
        for _ in range(4):
            acc = acc.double()
        sw = CurvePoint(*(fp(jax.lax.dynamic_index_in_dim(
            l, w, axis=1, keepdims=False)) for l in slimbs))
        return acc + sw

    return jax.lax.fori_loop(0, windows, body, CurvePoint.identity(()))


def mul_by_order_pallas(point, block: int = WBLOCK, kernel=None):
    """l * P via the mega-kernel (the prime-subgroup check hot path:
    `fabric/points.py` validates every point received off the wire)."""
    from ..algebra.curve import CurvePoint

    kern = kernel or windowed_mul_pallas
    shape = point.shape
    n = 1
    for s in shape:
        n *= int(s)
    n = max(n, 1)
    pt = point.reshape(n)
    order = SCALAR_FIELD.modulus
    canon = jnp.broadcast_to(
        jnp.asarray([(order >> (16 * i)) & 0xFFFF for i in range(NLIMBS)],
                    jnp.uint32)[:, None], (NLIMBS, n))
    pad = (-n) % block
    if pad:
        def padc(a):
            return jnp.concatenate(
                [a, jnp.zeros((NLIMBS, pad), jnp.uint32)], axis=1)
        x, y, z, t = kern(padc(canon), *(padc(c.limbs)
                                         for c in pt._coords()),
                          block=block)
    else:
        x, y, z, t = kern(canon, *(c.limbs for c in pt._coords()),
                          block=block)
    out = CurvePoint(*(type(pt.X)(a[:, :n]) for a in (x, y, z, t)))
    return out.reshape(*shape) if shape else out.reshape()


def scalar_mul_pallas(point, scalar, block: int = WBLOCK, kernel=None):
    """`CurvePoint.mul` via the mega-kernel: broadcasts, flattens, pads to
    a block multiple, and reshapes back.  Use on TPU; the XLA ladder stays
    the CPU path (the Pallas interpreter is far slower than XLA there).
    Dispatches to the 4-bit windowed kernel (the measured winner); pass
    `kernel=ladder_pallas` for the plain ladder."""
    from ..algebra.curve import CurvePoint

    kern = kernel or windowed_mul_pallas
    shape = jnp.broadcast_shapes(point.shape, scalar.shape)
    n = 1
    for s in shape:
        n *= int(s)
    pt = point.broadcast_to(shape).reshape(n)
    sc = scalar.broadcast_to(shape).reshape(n)
    canon = lb.from_mont(SCALAR_FIELD, sc.limbs)
    pad = (-n) % block
    if pad:
        def padc(a):
            return jnp.concatenate(
                [a, jnp.zeros((NLIMBS, pad), jnp.uint32)], axis=1)
        canon_p = padc(canon)
        coords = [padc(c.limbs) for c in pt._coords()]
    else:
        canon_p = canon
        coords = [c.limbs for c in pt._coords()]
    x, y, z, t = kern(canon_p, *coords, block=block)
    out = CurvePoint(*(type(pt.X)(a[:, :n]) for a in (x, y, z, t)))
    return out.reshape(*shape) if shape else out.reshape()
