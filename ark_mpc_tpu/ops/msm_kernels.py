"""Bucketed Pippenger MSM on TPU (Pallas bucket-accumulation kernels).

The round-2 TPU MSM ran n independent windowed ladders
(`curve_kernels.windowed_mul_pallas`): ~37 base-field muls per 4 scalar
bits per point (~2370 bmuls/point), leaving Pippenger's asymptotic win on
the table (VERDICT r2 item 4; reference: the chunked rayon Pippenger at
`online-phase/src/algebra/curve/curve.rs:34,549-584`).

Bucket accumulation is a data-dependent scatter — the one pattern TPUs
cannot vectorize directly.  This module restructures it as dense,
shape-static work split between XLA and two Pallas mega-kernels:

  1. XLA prologue (`_rank_grid`): per c-bit window, sort the digits and
     compute each point's RANK within its bucket (its position among the
     points sharing its digit).  One scatter lays the point INDICES out on
     a (max_rank, W', 2^c) grid — grid[r, w, d] = index of the rank-r
     point of bucket d in window-row w, or a sentinel pointing at an
     appended identity point.  One gather materializes the coordinates.
     Two depth optimizations:
       - digit-0 points are DROPPED (the epilogue never reads bucket 0 —
         its weight is 0), keeping max_rank bounded when scalars cluster
         at zero;
       - the TOP window is VIRTUALIZED over `_TOP_VIRT` extra window-rows
         (rank r lands in virtual row r % _TOP_VIRT at depth
         r // _TOP_VIRT): l ~ 2^252 leaves the top 8-bit window only ~4
         effective bits, so its buckets run ~16x deeper than everyone
         else's and would otherwise rank-pad ALL windows 16x.
  2. `bucket_accumulate_pallas`: grid (W'/wc, max_rank), TPU-sequential.
     Scratch holds wc windows' bucket accumulators as (NLIMBS, wc, 2^c)
     VMEM tiles.  Each step is ONE complete unified Edwards add of a
     (NLIMBS, wc, 2^c) point slab into the buckets — the (16, 256)
     trailing dims fill the VPU's (8, 128) registers, and identity
     padding needs no masking because the a = -1 twisted-Edwards formulas
     are complete.  Work: ~1.3 * W * n bucket adds at uniform scalars
     (~430 bmuls/point at c = 8; the windowed ladder pays ~2370).
  3. `bucket_reduce_pallas` (the epilogue, also ONE kernel): fold the
     virtual top rows back into window W-1, then per window compute
     sum_d d * B_d via a lane-axis Hillis-Steele suffix scan (8 slab
     adds) + a lane tree-reduction (8 more), then Horner across windows
     (c doubles + 1 select-add per window) — all VMEM-resident.  The
     round-3 XLA epilogue ran these as ~500 dispatch-granularity group
     ops and dominated the whole MSM (469 ms of 542 ms at n = 2^12).

`max_rank` is data-dependent, so shapes can't be static under one jit:
the host reads back the max rank from a small jitted prologue and calls
the shape-specialized stage-2 jit with it, ROUNDED UP to `_RANK_GRAN` so
uniform scalars reuse one cached compile.  Clustered scalars recompile
for a deeper grid — always correct, slower only then.

For n > _SEGMENT points the input is split into segments and the partial
MSMs summed (MSM is additive over point subsets), bounding the gathered
intermediate's HBM footprint.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..algebra.fields import BASE_FIELD, SCALAR_FIELD
from ..algebra.limbs import NLIMBS
from .curve_kernels import _ED_2D_LIMBS, _double, _double_no_t, _padd
from .fp_kernels import _interpret

C_BITS = 8                      # window size: 32 windows, 256 buckets
N_BUCKETS = 1 << C_BITS
N_WINDOWS = 256 // C_BITS
# The scalar field l ~ 2^252: the top window's digits only span
# [0, l >> 248] = [0, 16], so its buckets run ~2^c / 16 = 16x deeper than
# uniform.  Spread it over 16 virtual window-rows (folded back in the
# epilogue); +1 dead pad row keeps W_PAD a multiple of the slab width 16.
_TOP_VIRT = 16
W_PAD = N_WINDOWS + _TOP_VIRT   # 31 real + 16 virtual + 1 dead pad = 48
_SEGMENT = 1 << 16              # points per kernel call (HBM cap)
_RANK_GRAN = 32                 # max_rank rounds up to this (compile reuse)


def _rank_grid_host(digits):
    """digits (W, n) -> (rank (W, n), max_rank int).  Small jitted
    prologue + one scalar readback."""
    rank, mx = _rank_grid_jit(digits)
    return rank, int(jax.device_get(mx))


@jax.jit
def _rank_grid_jit(digits):
    order = jnp.argsort(digits, axis=1)
    sd = jnp.take_along_axis(digits, order, axis=1)
    n = digits.shape[1]

    def row_rank(row):
        first = jnp.searchsorted(row, row, side="left")
        return jnp.arange(n, dtype=jnp.int32) - first.astype(jnp.int32)

    rank_sorted = jax.vmap(row_rank)(sd)
    # rank back in ORIGINAL point order
    rank = jnp.zeros_like(rank_sorted)
    rank = jax.vmap(lambda r, o, v: r.at[o].set(v))(rank, order, rank_sorted)
    # digit-0 points contribute 0 * B_0 — the epilogue drops bucket 0 —
    # so exclude them: push their rank out of range (the grid scatter
    # drops them) and ignore them in the max
    rank = jnp.where(digits == 0, jnp.int32(2**30), rank)
    nz_rank = jnp.where(sd == 0, jnp.int32(-1), rank_sorted)
    return rank, nz_rank.max() + 1


def _virtual_rows(rank):
    """(row, vrank) for the scatter: window w < W-1 keeps (w, rank); the
    top window spreads rank r over virtual row (W-1) + r % _TOP_VIRT at
    depth r // _TOP_VIRT.  Digit-0 sentinel ranks stay out of range."""
    w_ix = jnp.broadcast_to(
        jnp.arange(N_WINDOWS, dtype=jnp.int32)[:, None], rank.shape)
    is_top = w_ix == N_WINDOWS - 1
    row = jnp.where(is_top, N_WINDOWS - 1 + rank % _TOP_VIRT, w_ix)
    vrank = jnp.where(is_top, rank // _TOP_VIRT, rank)
    return row, vrank


@jax.jit
def _max_rank_of(scalars):
    from ..algebra.curve import _scalar_digits

    digits = _scalar_digits(scalars, C_BITS)
    rank, _ = _rank_grid_jit(digits)
    _, vrank = _virtual_rows(rank)
    return jnp.where(digits == 0, jnp.int32(-1), vrank).max() + 1


def bucket_accumulate_pallas(px, py, pz, pt):
    """coords (NLIMBS, R, W, n_buckets) -> bucket sums
    (NLIMBS, W, n_buckets) per coordinate.  TPU-sequential grid
    (W // wc, R); the scratch holds wc windows' buckets, so each step is
    ONE complete Edwards add of a (NLIMBS, wc, nb) point slab — trailing
    dims (16, 256) fill whole (8, 128) VPU registers (a per-window
    (1, nb) layout wastes 7/8 sublanes and pays 32x the grid-step
    overhead; wc = 32 blows the ~16 MB scoped-VMEM budget).
    Window/bucket counts are read from the input shape (production:
    W_PAD x N_BUCKETS; tests run tiny grids under the interpreter)."""
    R, W, nb = px.shape[1], px.shape[2], px.shape[3]
    B = BASE_FIELD
    wc = W if W % 16 else 16

    def kernel(x_r, y_r, z_r, t_r, ox, oy, oz, ot, bx, by, bz, bt):
        r = pl.program_id(1)

        @pl.when(r == 0)
        def _init():
            bx[...] = jnp.zeros((NLIMBS, wc, nb), jnp.uint32)
            by[...] = jnp.concatenate(
                [jnp.ones((1, wc, nb), jnp.uint32),
                 jnp.zeros((NLIMBS - 1, wc, nb), jnp.uint32)], 0)
            bz[...] = by[...]
            bt[...] = jnp.zeros((NLIMBS, wc, nb), jnp.uint32)

        d2 = jnp.concatenate(
            [jnp.full((1, wc, nb), v, jnp.uint32) for v in _ED_2D_LIMBS],
            0)
        x, y, z, t = _padd(
            B, bx[...], by[...], bz[...], bt[...],
            x_r[:, 0], y_r[:, 0], z_r[:, 0], t_r[:, 0], d2)
        bx[...], by[...], bz[...], bt[...] = x, y, z, t

        @pl.when(r == R - 1)
        def _flush():
            ox[...] = bx[...]
            oy[...] = by[...]
            oz[...] = bz[...]
            ot[...] = bt[...]

    tile_in = pl.BlockSpec((NLIMBS, 1, wc, nb),
                           lambda w, r: (0, r, w, 0),
                           memory_space=pltpu.VMEM)
    tile_out = pl.BlockSpec((NLIMBS, wc, nb), lambda w, r: (0, w, 0),
                            memory_space=pltpu.VMEM)
    out = jax.ShapeDtypeStruct((NLIMBS, W, nb), jnp.uint32)
    scratch = [pltpu.VMEM((NLIMBS, wc, nb), jnp.uint32)] * 4
    return pl.pallas_call(
        kernel,
        grid=(W // wc, R),
        in_specs=[tile_in] * 4,
        out_specs=(tile_out,) * 4,
        out_shape=(out,) * 4,
        scratch_shapes=scratch,
        interpret=_interpret(),
    )(px, py, pz, pt)


def _id_coords(shape):
    """Identity-point coordinate arrays (x, y, z, t) of a given
    (NLIMBS, ...) shape: x = t = 0, y = z = 1 (limb 0)."""
    zero = jnp.zeros(shape, jnp.uint32)
    one = jnp.concatenate(
        [jnp.ones((1,) + shape[1:], jnp.uint32),
         jnp.zeros((shape[0] - 1,) + shape[1:], jnp.uint32)], 0)
    return zero, one, one, zero


def _d2_const(shape):
    return jnp.concatenate(
        [jnp.full((1,) + shape[1:], v, jnp.uint32) for v in _ED_2D_LIMBS], 0)


# Jitted slab primitives for the CONCRETE (eager CPU) pipeline path.
# Raw eager `_padd` is ~200 small dispatches (~10 s of JAX eager overhead
# per slab add); each of these compiles once per shape (~10 s, persisted
# to the compilation cache as pure XLA) and then costs milliseconds.
@jax.jit
def _padd_j(x1, y1, z1, t1, x2, y2, z2, t2, d2):
    return _padd(BASE_FIELD, x1, y1, z1, t1, x2, y2, z2, t2, d2)


@jax.jit
def _double_j(x, y, z, t):
    return _double(BASE_FIELD, x, y, z, t)


@jax.jit
def _double_no_t_j(x, y, z):
    return _double_no_t(BASE_FIELD, x, y, z)


def _accumulate_body(px, py, pz, pt):
    """Pure-array bucket accumulation — the CPU path of `msm_bucket_tpu`
    (same math as `bucket_accumulate_pallas`'s grid, one jitted slab add
    per rank level)."""
    R, W, nb = px.shape[1], px.shape[2], px.shape[3]
    ax, ay, az, at = _id_coords((NLIMBS, W, nb))
    d2 = _d2_const((NLIMBS, W, nb))
    for r in range(R):
        ax, ay, az, at = _padd_j(ax, ay, az, at, px[:, r], py[:, r],
                                 pz[:, r], pt[:, r], d2)
    return ax, ay, az, at


def _reduce_body(X, Y, Z, T, w_real: int, c_bits: int,
                 static_horner: bool | None = None):
    """The epilogue's math as a pure array function (steps 1-4 of
    `bucket_reduce_pallas`'s docstring).  Factored out of the kernel so
    the fast tier can exercise every line as plain XLA on CPU
    (`tests/test_msm_bucket_fast.py::test_bucket_reduce_tiny`) — the
    interpret-mode Pallas wrapper unrolls into an XLA:CPU graph that
    compiles for tens of minutes at any realistic grid."""
    B = BASE_FIELD
    W, nb = X.shape[1], X.shape[2]
    virt = W - w_real  # includes the dead pad row (stays identity)
    if isinstance(X, jax.core.Tracer):
        padd = lambda *a: _padd(B, *a)  # noqa: E731 - inline under trace
        dbl = lambda *a: _double(B, *a)  # noqa: E731
        dblnt = lambda *a: _double_no_t(B, *a)  # noqa: E731
    else:
        padd, dbl, dblnt = _padd_j, _double_j, _double_no_t_j

    # 1. fold virtual rows [w_real-1 .. W-1] (virt+1 of them, padded
    # to the next pow2 with identity rows) back into row w_real-1
    if virt:
        base = w_real - 1
        span = virt + 1
        p2 = 1 << (span - 1).bit_length()
        if p2 > span:
            idx_, idy, idz, idt = _id_coords((NLIMBS, p2 - span, nb))
            X = jnp.concatenate([X, idx_], 1)
            Y = jnp.concatenate([Y, idy], 1)
            Z = jnp.concatenate([Z, idz], 1)
            T = jnp.concatenate([T, idt], 1)
        k = p2 // 2
        while k >= 1:
            a = slice(base, base + k)
            b = slice(base + k, base + 2 * k)
            d2k = _d2_const((NLIMBS, k, nb))
            fx, fy, fz, ft = padd(X[:, a], Y[:, a], Z[:, a],
                                  T[:, a], X[:, b], Y[:, b], Z[:, b],
                                  T[:, b], d2k)
            X = jnp.concatenate([X[:, :base], fx], 1)
            Y = jnp.concatenate([Y[:, :base], fy], 1)
            Z = jnp.concatenate([Z[:, :base], fz], 1)
            T = jnp.concatenate([T[:, :base], ft], 1)
            k //= 2
    X, Y, Z, T = X[:, :w_real], Y[:, :w_real], Z[:, :w_real], \
        T[:, :w_real]
    d2 = _d2_const((NLIMBS, w_real, nb))

    # 2. drop bucket 0 (weight 0), then lane suffix-scan
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, w_real, nb), 2)
    idx_, idy, idz, idt = _id_coords((NLIMBS, w_real, nb))

    def drop_lane0(X, Y, Z, T):
        m = lane == 0
        return (jnp.where(m, idx_, X), jnp.where(m, idy, Y),
                jnp.where(m, idz, Z), jnp.where(m, idt, T))

    X, Y, Z, T = drop_lane0(X, Y, Z, T)
    k = 1
    while k < nb:
        ix, iy, iz, it = _id_coords((NLIMBS, w_real, k))
        sx = jnp.concatenate([X[..., k:], ix], -1)
        sy = jnp.concatenate([Y[..., k:], iy], -1)
        sz = jnp.concatenate([Z[..., k:], iz], -1)
        st = jnp.concatenate([T[..., k:], it], -1)
        X, Y, Z, T = padd(X, Y, Z, T, sx, sy, sz, st, d2)
        k *= 2

    # 3. sum_{k>=1} suffix_k: drop lane 0, tree-reduce (pad back to
    # full width with identities so shapes stay fixed)
    X, Y, Z, T = drop_lane0(X, Y, Z, T)
    k = nb // 2
    while k >= 1:
        ix, iy, iz, it = _id_coords((NLIMBS, w_real, nb - k))
        # lanes [0:k] += lanes [k:2k]; stale lanes >= k never feed a
        # later step (each step only reads [k':2k'] inside [0:k])
        hx = jnp.concatenate([X[..., k:2 * k], ix], -1)[..., :nb]
        hy = jnp.concatenate([Y[..., k:2 * k], iy], -1)[..., :nb]
        hz = jnp.concatenate([Z[..., k:2 * k], iz], -1)[..., :nb]
        ht = jnp.concatenate([T[..., k:2 * k], it], -1)[..., :nb]
        X, Y, Z, T = padd(X, Y, Z, T, hx, hy, hz, ht, d2)
        k //= 2
    # lane 0 of each row = S_w

    # 4. Horner across windows, lane width 128 (all lanes compute the
    # same value — elementwise ops never mix lanes)
    lw = min(nb, 128)
    Sx = X[..., :1]
    Sy = Y[..., :1]
    Sz = Z[..., :1]
    St = T[..., :1]  # (NLIMBS, w_real, 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (1, w_real, 1), 1)

    def select_row(w):
        m = row == w

        def pick(A):
            return jnp.broadcast_to(
                jnp.where(m, A, 0).astype(jnp.int32)
                .sum(axis=1, keepdims=True).astype(jnp.uint32),
                (NLIMBS, 1, lw))

        return pick(Sx), pick(Sy), pick(Sz), pick(St)

    d2h = _d2_const((NLIMBS, 1, lw))
    acc = select_row(jnp.int32(w_real - 1))

    def body(i, acc4):
        x, y, z, t = acc4
        for _ in range(c_bits - 1):
            x, y, z = dblnt(x, y, z)
        x, y, z, t = dbl(x, y, z, t)
        gx, gy, gz, gt = select_row(w_real - 1 - i)
        return padd(x, y, z, t, gx, gy, gz, gt, d2h)

    if static_horner is None:
        # auto: concrete (eager CPU) inputs take the unrolled Python loop
        # — the fori_loop body COMPILE costs XLA:CPU minutes at this
        # field's graph sizes; under a trace (TPU kernel) fori keeps the
        # graph O(1) in the window count
        static_horner = not isinstance(Sx, jax.core.Tracer)
    if static_horner:
        acc4 = acc
        for i in range(1, w_real):
            acc4 = body(i, acc4)
        x, y, z, t = acc4
    else:
        x, y, z, t = jax.lax.fori_loop(1, w_real, body, acc)
    return (jnp.broadcast_to(x, (NLIMBS, 8, lw)),
            jnp.broadcast_to(y, (NLIMBS, 8, lw)),
            jnp.broadcast_to(z, (NLIMBS, 8, lw)),
            jnp.broadcast_to(t, (NLIMBS, 8, lw)))


def bucket_reduce_pallas(bx, by, bz, bt, w_real: int, c_bits: int):
    """Epilogue mega-kernel: bucket sums (NLIMBS, W', nb) -> ONE point
    (NLIMBS, 8, 128) with the result broadcast over rows, lane 0 valid.

    In one kernel invocation (everything VMEM-resident):
      1. fold the W' - w_real virtual top rows back into row w_real - 1
         (log2 tree of sublane-slab adds; the pad row is identity);
      2. drop bucket 0, then suffix-scan the lane axis (Hillis-Steele,
         shifting in identities) so lane d = sum_{e >= d} B_e;
      3. re-drop lane 0 and tree-reduce lanes: lane 0 = sum_{d>=1} d*B_d
         (each step pads back to full width with identities so every lane
         stays a valid point — no masking needed anywhere, the formulas
         are complete);
      4. Horner across the w_real windows: acc = 2^c * acc + S_w via a
         fori_loop with a one-hot sublane select (exactly one row hits,
         so an int32 sum over rows is an exact coordinate select).
    The round-3 XLA version of these steps cost ~470 ms of
    dispatch-granularity group ops; here they are ~20 slab adds + a
    31-step width-128 loop."""
    W, nb = bx.shape[1], bx.shape[2]

    def kernel(x_r, y_r, z_r, t_r, ox, oy, oz, ot):
        x, y, z, t = _reduce_body(x_r[...], y_r[...], z_r[...], t_r[...],
                                  w_real, c_bits)
        ox[...] = x
        oy[...] = y
        oz[...] = z
        ot[...] = t

    lw = min(nb, 128)
    out = jax.ShapeDtypeStruct((NLIMBS, 8, lw), jnp.uint32)
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        in_specs=[spec] * 4,
        out_specs=(spec,) * 4,
        out_shape=(out,) * 4,
        interpret=_interpret(),
    )(bx, by, bz, bt)


@functools.partial(jax.jit, static_argnames=("max_rank",))
def _msm_segment(points, scalars, max_rank: int):
    """One <=_SEGMENT-point MSM: scatter/gather to the rank grid, bucket
    kernel, epilogue kernel.  Returns a scalar CurvePoint."""
    from ..algebra.curve import CurvePoint, _scalar_digits

    n = points.shape[0]
    digits = _scalar_digits(scalars, C_BITS)            # (W, n)
    rank, _ = _rank_grid_jit(digits)
    row, vrank = _virtual_rows(rank)

    # identity sentinel at index n
    ident = CurvePoint.identity((1,))
    ppad = CurvePoint.concatenate([points, ident], axis=0)

    idx = jnp.full((max_rank, W_PAD, N_BUCKETS), n, jnp.int32)
    # mode="drop": digit-0 points carry an out-of-range rank (see
    # `_rank_grid_jit`) and must vanish rather than clip into the grid
    idx = idx.at[vrank, row, digits.astype(jnp.int32)].set(
        jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None], digits.shape),
        mode="drop")

    flat = idx.reshape(-1)
    gathered = [jnp.take(c.limbs, flat, axis=1).reshape(
        (NLIMBS, max_rank, W_PAD, N_BUCKETS))
        for c in ppad._coords()]

    if isinstance(gathered[0], jax.core.Tracer):
        # TPU path (under the _msm_segment jit): Mosaic compiles the
        # Pallas grids without unrolling
        bx, by, bz, bt = bucket_accumulate_pallas(*gathered)
        rx, ry, rz, rt = bucket_reduce_pallas(bx, by, bz, bt,
                                              w_real=N_WINDOWS,
                                              c_bits=C_BITS)
    else:
        # eager CPU path (tests): the same math through jitted slab
        # primitives — interpret-mode Pallas is either minutes of eager
        # dispatch overhead or tens of minutes of unrolled-graph compile
        bx, by, bz, bt = _accumulate_body(*gathered)
        rx, ry, rz, rt = _reduce_body(bx, by, bz, bt,
                                      w_real=N_WINDOWS, c_bits=C_BITS)
    Felt = type(points.X)
    return CurvePoint(Felt(rx[:, 0, 0]), Felt(ry[:, 0, 0]),
                      Felt(rz[:, 0, 0]), Felt(rt[:, 0, 0]))


def msm_bucket_tpu(points, scalars):
    """Full bucketed MSM entry: flat (n,) points x scalars -> CurvePoint.
    Splits into segments (HBM cap), reads back each segment's max bucket
    occupancy (one scalar per segment — the only host round trip), and
    sums the partial MSMs.

    On TPU the segment runs as ONE jit (Mosaic compiles the Pallas grids
    without unrolling).  On CPU it runs EAGERLY: under jit the
    interpret-mode kernels unroll into a graph XLA:CPU compiles for tens
    of minutes even at the tests' shrunk window config, and such programs
    never land in the persistent cache either."""
    n = points.shape[0]
    seg_fn = (_msm_segment if jax.default_backend() == "tpu"
              else _msm_segment.__wrapped__)
    partials = []
    for beg in range(0, n, _SEGMENT):
        p = points[beg:beg + _SEGMENT]
        s = scalars[beg:beg + _SEGMENT]
        mx = max(1, int(jax.device_get(_max_rank_of(s))))
        max_rank = -(-mx // _RANK_GRAN) * _RANK_GRAN
        partials.append(seg_fn(p, s, max_rank))
    acc = partials[0]
    for p in partials[1:]:
        acc = acc + p
    return acc
