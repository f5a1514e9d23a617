"""Bucketed Pippenger MSM on TPU (Pallas bucket-accumulation kernel).

The round-2 TPU MSM ran n independent windowed ladders
(`curve_kernels.windowed_mul_pallas`): ~37 base-field muls per 4 scalar
bits per point (~2370 bmuls/point), leaving Pippenger's asymptotic win on
the table (VERDICT r2 item 4; reference: the chunked rayon Pippenger at
`online-phase/src/algebra/curve/curve.rs:34,549-584`).

Bucket accumulation is a data-dependent scatter — the one pattern TPUs
cannot vectorize directly.  This module restructures it as dense,
shape-static work split between XLA and one Pallas mega-kernel:

  1. XLA prologue (`_rank_grid`): per c-bit window, sort the digits and
     compute each point's RANK within its bucket (its position among the
     points sharing its digit).  One scatter lays the point INDICES out on
     a (W, max_rank, 2^c) grid — grid[w, r, d] = index of the rank-r point
     of bucket d in window w, or a sentinel pointing at an appended
     identity point.  One gather materializes the coordinates.
  2. Pallas kernel (`bucket_accumulate_pallas`): grid (W, max_rank),
     TPU-sequential.  Scratch holds the 2^c bucket accumulators as
     (NLIMBS, 2^c) VMEM tiles (4 coords x 16 KB at c = 8).  Each step is
     ONE complete unified Edwards add of a (NLIMBS, 2^c) point tile into
     the buckets — identity padding needs no masking because the a = -1
     twisted-Edwards formulas are complete.  Work: W * max_rank * 2^c
     lane-adds ~= 1.5 * W * n (the 1.5 is rank padding at uniform
     scalars) ~= 430 bmuls/point at c = 8 — ~5.5x under the ladder.
  3. XLA epilogue: sum_d d * B_d per window via suffix scans (log-depth,
     O(1) traced group-add instantiations), then Horner across windows
     under `lax.scan` (c doubles + 1 add per window at width 1).

`max_rank` is data-dependent (bucket 0 of a window can hold up to n
points when scalars cluster), so shapes can't be static under one jit:
the host reads back the max rank from a small jitted prologue and calls
the shape-specialized stage-2 jit with it, ROUNDED UP to a coarse
granularity so uniform scalars reuse one cached compile.  Clustered
scalars recompile for a larger grid — always correct, slower only then.

For n > _SEGMENT points the input is split into segments and the partial
MSMs summed (MSM is additive over point subsets), bounding the gathered
intermediate at ~900 MB of HBM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..algebra.fields import BASE_FIELD
from ..algebra.limbs import NLIMBS
from .curve_kernels import _ED_2D_LIMBS, _padd
from .fp_kernels import _interpret

C_BITS = 8                      # window size: 32 windows, 256 buckets
N_BUCKETS = 1 << C_BITS
N_WINDOWS = 256 // C_BITS
_SEGMENT = 1 << 16              # points per kernel call (HBM cap)
_RANK_GRAN = 64                 # max_rank rounds up to this (compile reuse)


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
    # global max rank: the deepest bucket can be ANY bucket, not the last
    # sorted one (an interior bucket larger than the final digit's run)
    return rank, rank_sorted.max() + 1


def bucket_accumulate_pallas(px, py, pz, pt):
    """coords (W, R, NLIMBS, n_buckets) -> bucket sums
    (W, NLIMBS, n_buckets) per coordinate.  TPU-sequential grid (W, R);
    bucket scratch persists across the R axis and resets at r == 0.
    The bucket count is read from the input shape (production: N_BUCKETS;
    tests run tiny grids under the interpreter)."""
    W, R, nb = px.shape[0], px.shape[1], px.shape[-1]
    B = BASE_FIELD

    def kernel(x_r, y_r, z_r, t_r, ox, oy, oz, ot, bx, by, bz, bt):
        r = pl.program_id(1)

        @pl.when(r == 0)
        def _init():
            bx[...] = jnp.zeros((NLIMBS, nb), jnp.uint32)
            by[...] = jnp.concatenate(
                [jnp.ones((1, nb), jnp.uint32),
                 jnp.zeros((NLIMBS - 1, nb), jnp.uint32)], 0)
            bz[...] = by[...]
            bt[...] = jnp.zeros((NLIMBS, nb), jnp.uint32)

        d2 = jnp.concatenate(
            [jnp.full((1, nb), v, jnp.uint32) for v in _ED_2D_LIMBS],
            0)
        x, y, z, t = _padd(
            B, bx[...], by[...], bz[...], bt[...],
            x_r[0, 0], y_r[0, 0], z_r[0, 0], t_r[0, 0], d2)
        bx[...], by[...], bz[...], bt[...] = x, y, z, t

        @pl.when(r == R - 1)
        def _flush():
            ox[0] = bx[...]
            oy[0] = by[...]
            oz[0] = bz[...]
            ot[0] = bt[...]

    tile_in = pl.BlockSpec((1, 1, NLIMBS, nb),
                           lambda w, r: (w, r, 0, 0),
                           memory_space=pltpu.VMEM)
    tile_out = pl.BlockSpec((1, NLIMBS, nb), lambda w, r: (w, 0, 0),
                            memory_space=pltpu.VMEM)
    out = jax.ShapeDtypeStruct((W, NLIMBS, nb), jnp.uint32)
    scratch = [pltpu.VMEM((NLIMBS, nb), jnp.uint32)] * 4
    return pl.pallas_call(
        kernel,
        grid=(W, R),
        in_specs=[tile_in] * 4,
        out_specs=(tile_out,) * 4,
        out_shape=(out,) * 4,
        scratch_shapes=scratch,
        interpret=_interpret(),
    )(px, py, pz, pt)


@functools.partial(jax.jit, static_argnames=("max_rank",))
def _msm_segment(points, scalars, max_rank: int):
    """One <=_SEGMENT-point MSM: scatter/gather to the rank grid, bucket
    kernel, suffix-scan + Horner epilogue.  Returns a scalar CurvePoint."""
    from ..algebra.curve import (
        CurvePoint,
        _hs_prefix_scan,
        _group_suffix_scan,
        _horner_windows,
        _scalar_digits,
    )

    n = points.shape[0]
    digits = _scalar_digits(scalars, C_BITS)            # (W, n)
    rank, _ = _rank_grid_jit(digits)

    # identity sentinel at index n
    ident = CurvePoint.identity((1,))
    ppad = CurvePoint.concatenate([points, ident], axis=0)

    w_ix = jnp.broadcast_to(
        jnp.arange(N_WINDOWS, dtype=jnp.int32)[:, None], digits.shape)
    idx = jnp.full((N_WINDOWS, max_rank, N_BUCKETS), n, jnp.int32)
    idx = idx.at[w_ix, rank, digits.astype(jnp.int32)].set(
        jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None], digits.shape))

    flat = idx.reshape(-1)
    gathered = [jnp.moveaxis(
        jnp.take(c.limbs, flat, axis=1).reshape(
            (NLIMBS, N_WINDOWS, max_rank, N_BUCKETS)), 0, 2)
        for c in ppad._coords()]

    bx, by, bz, bt = bucket_accumulate_pallas(*gathered)
    Felt = type(points.X)
    buckets = CurvePoint(Felt(jnp.moveaxis(bx, 1, 0)),
                         Felt(jnp.moveaxis(by, 1, 0)),
                         Felt(jnp.moveaxis(bz, 1, 0)),
                         Felt(jnp.moveaxis(bt, 1, 0)))  # (W, N_BUCKETS)

    # sum_{d>=1} d * B_d = sum_{k>=1} suffix_k, suffix_k = sum_{d>=k} B_d
    suffix = _group_suffix_scan(buckets[:, 1:])
    win = _hs_prefix_scan(suffix, (N_BUCKETS - 2).bit_length())[..., -1]
    return _horner_windows(win, C_BITS)


@jax.jit
def _max_rank_of(scalars):
    from ..algebra.curve import _scalar_digits

    _, mx = _rank_grid_jit(_scalar_digits(scalars, C_BITS))
    return mx


def msm_bucket_tpu(points, scalars):
    """Full bucketed MSM entry: flat (n,) points x scalars -> CurvePoint.
    Splits into segments (HBM cap), reads back each segment's max bucket
    occupancy (one scalar per segment — the only host round trip), and
    sums the partial MSMs."""
    n = points.shape[0]
    partials = []
    for beg in range(0, n, _SEGMENT):
        p = points[beg:beg + _SEGMENT]
        s = scalars[beg:beg + _SEGMENT]
        mx = int(jax.device_get(_max_rank_of(s)))
        max_rank = -(-mx // _RANK_GRAN) * _RANK_GRAN
        partials.append(_msm_segment(p, s, max_rank))
    acc = partials[0]
    for p in partials[1:]:
        acc = acc + p
    return acc
