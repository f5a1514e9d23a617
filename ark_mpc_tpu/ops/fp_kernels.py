"""Pallas TPU kernels for the hot field ops.

The XLA path in `algebra/limbs.py` materializes the (16,16,n) limb-product
tensor in HBM, making big-batch Montgomery multiplication memory-bound.
These kernels tile the batch axis so every temp lives in VMEM: one grid step
loads a (16, BLOCK) slice of each operand, runs the full conv+REDC in
registers/VMEM, and writes the (16, BLOCK) result.

`mont_mul_pallas` is a drop-in for `limbs.mont_mul` on TPU (same math, same
Montgomery representation); `beaver_round_pallas` fuses the whole two-share
Beaver combine to amortize operand loads further.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..algebra import limbs as lb
from ..algebra.limbs import NLIMBS, FieldSpec

BLOCK = 512
# 3-D tile rows: limb ops inside kernels run on (R128, 128) slices so the
# VPU's (8, 128) shape is fully occupied (measured 1.8x over (16, BLOCK)
# 2-D tiles at 2^22).  R128 = 8 also keeps per-tile fold column sums
# (1024 elements x < 2^21 per column) inside uint32.
R128 = 8


def _interpret() -> bool:
    # Pallas TPU kernels run under the interpreter on CPU (tests).
    return jax.default_backend() != "tpu"


def _add_mod(spec: FieldSpec, x, y):
    """lb.add body (unjitted; usable inside a Pallas kernel)."""
    s, _ = lb._carry_chain_add(
        [xi + yi for xi, yi in zip(lb._rows(x), lb._rows(y))])
    d, borrow = lb._sub_with_borrow(s, [jnp.uint32(v) for v in spec.mod_limbs])
    use_d = (borrow == 0)
    return lb._stack([jnp.where(use_d, di, si) for di, si in zip(d, s)])


def _sub_mod(spec: FieldSpec, x, y):
    """lb.sub body (unjitted)."""
    d, borrow = lb._sub_with_borrow(lb._rows(x), lb._rows(y))
    m = [jnp.uint32(v) for v in spec.mod_limbs]
    dm, _ = lb._carry_chain_add([di + mi for di, mi in zip(d, m)])
    take_dm = (borrow == 1)
    return lb._stack([jnp.where(take_dm, ai, bi) for ai, bi in zip(dm, d)])


def _mul_body(spec: FieldSpec, x, y):
    """Unrolled conv + REDC on a (16, BLOCK) tile (pure jnp; temps in VMEM)."""
    return lb._redc(spec, lb._conv_columns(x, y))


@functools.partial(jax.jit, static_argnums=0)
def mont_mul_pallas(spec: FieldSpec, x, y):
    """Montgomery product over (16, n) uint32 limb arrays, n % BLOCK == 0."""
    n = x.shape[1]
    assert n % BLOCK == 0, f"n must be a multiple of {BLOCK}"

    def kernel(x_ref, y_ref, o_ref):
        o_ref[...] = _mul_body(spec, x_ref[...], y_ref[...])

    return pl.pallas_call(
        kernel,
        grid=(n // BLOCK,),
        in_specs=[
            pl.BlockSpec((NLIMBS, BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NLIMBS, BLOCK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((NLIMBS, BLOCK), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NLIMBS, n), jnp.uint32),
        interpret=_interpret(),
    )(x, y)


@functools.partial(jax.jit, static_argnums=(0, 1, 11))
def beaver_round_pallas(spec: FieldSpec, party_id: int,
                        a_sh, a_mac, b_sh, b_mac, c_sh, c_mac,
                        d, e, key_sh, block: int = BLOCK):
    """Fused Beaver combine for one party:
      share = d*e*(party==0) + d*b_sh + e*a_sh + c_sh
      mac   = key*d*e + d*b_mac + e*a_mac + c_mac
    One grid pass: 5 tile loads, 2 stores, ~6 tile mont_muls in VMEM."""
    n = d.shape[1]
    assert n % block == 0

    def kernel(a_s, a_m, b_s, b_m, c_s, c_m, d_r, e_r, k_r, o_s, o_m):
        dd, ee = d_r[...], e_r[...]
        de = _mul_body(spec, dd, ee)
        sh = lb.add(spec, lb.add(spec, _mul_body(spec, dd, b_s[...]),
                                 _mul_body(spec, ee, a_s[...])), c_s[...])
        mac = lb.add(spec, lb.add(spec, _mul_body(spec, dd, b_m[...]),
                                 _mul_body(spec, ee, a_m[...])), c_m[...])
        mac = lb.add(spec, mac, _mul_body(spec, k_r[...], de))
        if party_id == 0:
            sh = lb.add(spec, sh, de)
        o_s[...] = sh
        o_m[...] = mac

    spec2 = pl.BlockSpec((NLIMBS, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(n // block,),
        in_specs=[spec2] * 9,
        out_specs=(spec2, spec2),
        out_shape=(
            jax.ShapeDtypeStruct((NLIMBS, n), jnp.uint32),
            jax.ShapeDtypeStruct((NLIMBS, n), jnp.uint32),
        ),
        interpret=_interpret(),
    )(a_sh, a_mac, b_sh, b_mac, c_sh, c_mac, d, e, key_sh)


# ---------------------------------------------------------------------------
# chained two-party Beaver rounds (the headline-bench mega-kernel)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(0, 1))
def beaver_chain_pallas(spec: FieldSpec, rounds: int,
                        x0, x1, e, a0, a1, b0, b1, bm0, bm1,
                        c0, c1, cm0, cm1, ea0, ea1, eam0, eam1,
                        k0, k1, cf):
    """K dependent two-party Beaver rounds + MAC-check inner products, all
    inside ONE kernel: each (16, R128, 128) tile stays VMEM-resident for the
    whole chain (round i+1 multiplies round i's authenticated output by y).

    Algebraic restructure vs one-round-at-a-time (`beaver_round_pallas`):
      - `e` and the products e*a_p / e*a_mac_p are ROUND-INVARIANT for a
        chain that reuses its y and triple batch: precomputed by the caller
        and read once per tile (saves 4 of 12 convs+REDCs per round);
      - d*e computed once, shared by both parties;
      - the MAC-check fold uses linearity — sum_i cf_i*(k*v_i - mac_i) =
        k * <cf, v> - <cf, mac> — so each round emits three inner products
        as WIDE COLUMN SUMS (no per-element fold REDC at all); the caller
        Montgomery-reduces the (33,) column vectors and applies the
        per-round randomization scalar.

    Shapes: all share/mac arrays (16, n) uint32 Montgomery limbs with
    n % (R128*128) == 0; k0/k1 broadcast blocks (16, 128); cf the fold
    coefficient vector (16, n).

    Returns (xf0, xf1, fold) with fold uint32 (n_tiles, rounds, 3, 128):
    [..., which, :33] = per-tile column sums of conv(cf, t) for
    t in (v, mac0, mac1); columns < 2^31 (1024 elements x 2^21).
    """
    n = x0.shape[1]
    tile = R128 * 128
    assert n % tile == 0
    g = n // tile

    def r3(z):
        return z.reshape(NLIMBS, n // 128, 128)

    def kernel(x0_r, x1_r, e_r, a0_r, a1_r, b0_r, b1_r, bm0_r, bm1_r,
               c0_r, c1_r, cm0_r, cm1_r, ea0_r, ea1_r, eam0_r, eam1_r,
               k0_r, k1_r, cf_r, ox0_r, ox1_r, fold_r):
        e_t = e_r[...]
        a0_t, a1_t = a0_r[...], a1_r[...]
        b0_t, b1_t = b0_r[...], b1_r[...]
        bm0_t, bm1_t = bm0_r[...], bm1_r[...]
        c0_t, c1_t = c0_r[...], c1_r[...]
        cm0_t, cm1_t = cm0_r[...], cm1_r[...]
        ea0_t, ea1_t = ea0_r[...], ea1_r[...]
        eam0_t, eam1_t = eam0_r[...], eam1_r[...]
        cf_t = cf_r[...]
        k0_t = jnp.broadcast_to(k0_r[...][:, None, :], e_t.shape)
        k1_t = jnp.broadcast_to(k1_r[...][:, None, :], e_t.shape)

        def ip_cols(t):
            """<cf, t> as 33 wide column sums (one (128,) padded row).

            Mosaic can't reduce unsigned ints; each column is < 2^21 per
            element so the 1024-element tile sum stays < 2^31 — sum in
            int32 and bitcast back.
            """
            cols = lb._conv_columns(cf_t, t)
            sums = jnp.stack([c.astype(jnp.int32).sum() for c in cols])
            return jnp.pad(sums.astype(jnp.uint32), (0, 128 - len(cols)))

        def body(r, carry):
            x0_t, x1_t = carry
            d = _add_mod(spec, _sub_mod(spec, x0_t, a0_t),
                         _sub_mod(spec, x1_t, a1_t))
            de = _mul_body(spec, d, e_t)
            s0 = _add_mod(spec, _add_mod(spec, _mul_body(spec, d, b0_t),
                                         ea0_t), c0_t)
            s0 = _add_mod(spec, s0, de)  # party-0 add_public
            s1 = _add_mod(spec, _add_mod(spec, _mul_body(spec, d, b1_t),
                                         ea1_t), c1_t)
            # mac_p = REDC(conv(d, bmac_p) + conv(k_p, de)) + e*amac_p + cmac_p
            m0_cols = [u + w for u, w in zip(lb._conv_columns(d, bm0_t),
                                             lb._conv_columns(k0_t, de))]
            m1_cols = [u + w for u, w in zip(lb._conv_columns(d, bm1_t),
                                             lb._conv_columns(k1_t, de))]
            m0 = _add_mod(spec, _add_mod(spec, lb._redc(spec, m0_cols),
                                         eam0_t), cm0_t)
            m1 = _add_mod(spec, _add_mod(spec, lb._redc(spec, m1_cols),
                                         eam1_t), cm1_t)
            v = _add_mod(spec, s0, s1)
            fold_r[0, r, 0, :] = ip_cols(v)
            fold_r[0, r, 1, :] = ip_cols(m0)
            fold_r[0, r, 2, :] = ip_cols(m1)
            return (s0, s1)

        xf0, xf1 = jax.lax.fori_loop(0, rounds, body,
                                     (x0_r[...], x1_r[...]))
        ox0_r[...] = xf0
        ox1_r[...] = xf1

    spec3 = pl.BlockSpec((NLIMBS, R128, 128), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
    speck = pl.BlockSpec((NLIMBS, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM)
    xf0, xf1, fold = pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[spec3] * 17 + [speck, speck, spec3],
        out_specs=(spec3, spec3,
                   pl.BlockSpec((1, rounds, 3, 128), lambda i: (i, 0, 0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(
            jax.ShapeDtypeStruct((NLIMBS, n // 128, 128), jnp.uint32),
            jax.ShapeDtypeStruct((NLIMBS, n // 128, 128), jnp.uint32),
            jax.ShapeDtypeStruct((g, rounds, 3, 128), jnp.uint32),
        ),
        interpret=_interpret(),
    )(r3(x0), r3(x1), r3(e), r3(a0), r3(a1), r3(b0), r3(b1), r3(bm0),
      r3(bm1), r3(c0), r3(c1), r3(cm0), r3(cm1), r3(ea0), r3(ea1),
      r3(eam0), r3(eam1), k0, k1, r3(cf))
    return (xf0.reshape(NLIMBS, n), xf1.reshape(NLIMBS, n), fold)


# Montgomery correction for reducing summed fold columns: the column sums
# are integers sum(cf*t*R^2); _redc(iters=24) divides by 2^384, so multiply
# by 2^384 * R^-1 * R = 2^384 to land back in Montgomery form... precomputed
# per spec as W = 2^384 mod m: redc24(S) * W * R^-1 = sum(cf*t) * R.
@functools.partial(jax.jit, static_argnums=0)
def fold_columns_reduce(spec: FieldSpec, fold):
    """(n_tiles, ..., 128) uint32 per-tile wide column sums (33 used) ->
    (16, ...) Montgomery limbs of sum_i cf_i * t_i over ALL tiles.

    Per-tile sums are sum(cf_mont * t_mont) = sum(cf*t) * R^2 as integers
    spread over 33 16-bit columns (each < 2^31).  Each column is split into
    lo/hi 16-bit halves BEFORE the cross-tile sum (<= 2^16 tiles keep both
    halves inside uint32), giving <2^29 wide columns; Montgomery-reduce with
    24 iterations (divides by 2^384; precondition T < m*2^384 holds since
    T < 2^559) and correct by W = 2^384 mod m:
        redc24(S) = sum(cf*t) * R^2 / 2^384
        mont_mul(redc24(S), W) = sum(cf*t) * R^2 / 2^384 * W / R
                               = sum(cf*t) * R.
    """
    batch = fold.shape[1:-1]
    cols = jnp.moveaxis(fold[..., :33], -1, 0)  # (33, g, ...)
    lo = (cols & jnp.uint32(0xFFFF)).sum(axis=1)
    hi = (cols >> 16).sum(axis=1)
    wide = jnp.zeros((35,) + batch, jnp.uint32)
    wide = wide.at[:33].set(lo)
    wide = wide.at[1:34].add(hi)
    y = lb._redc(spec, [wide[i] for i in range(35)], iters=24)
    w = (1 << 384) % spec.modulus
    w_limbs = jnp.asarray(lb.int_to_limbs(w), jnp.uint32).reshape(
        (NLIMBS,) + (1,) * len(batch))
    return lb.mont_mul(spec, y, jnp.broadcast_to(w_limbs, y.shape))
