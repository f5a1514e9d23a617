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


def _interpret() -> bool:
    # Pallas TPU kernels run under the interpreter on CPU (tests).
    return jax.default_backend() != "tpu"


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
