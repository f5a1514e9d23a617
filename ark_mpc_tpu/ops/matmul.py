"""Modular matrix multiplication on the MXU.

The hot kernel behind shared matrix multiplication (BASELINE config 5) and
polynomial/NTT-by-matmul paths.  Field elements are 16x16-bit Montgomery
limbs; a matmul over the field decomposes into *integer* matmuls over 8-bit
limb planes, which XLA maps onto the TPU MXU (int multiply-accumulate),
followed by one generalized Montgomery reduction:

    A (m,k), B (k,n) over F_m, both in Montgomery form (values < m < 2^255):
    1. split each 16-bit limb into lo/hi bytes -> 32 byte-planes per operand
    2. P2[i,:,j,:] = A8[i] @ B8[j]  — ONE `lax.dot_general` of shape
       (32,m,k) x (32,k,n) -> (32,m,32,n), int32 accumulation.
       Per-entry bound: 2^16 * k  (exact for k <= 2^15).
    3. diagonal-sum byte planes into 8-bit-weighted columns
       cols8[c] = sum_{i+j=c} P2[i,:,j,:]  (uint32, < 2^16 * k * 32).
    4. carry-propagate to 8-bit digits, pack pairs into 16-bit columns.
    5. generalized REDC with iters=17: valid while k*m^2 < m*2^272, i.e.
       k <= 2^19; one final Montgomery correction multiply by 2^(16*17)
       restores Montgomery form.

k is chunked at K_CHUNK to respect the uint32 column bound; m is chunked to
bound the (32,m,32,n) intermediate's memory.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..algebra import limbs as lb
from ..algebra.limbs import LIMB_MASK, NLIMBS, U32, FieldSpec

# uint32 column bound: 2^16 * K_CHUNK * 32 < 2^32  =>  K_CHUNK < 2^11
K_CHUNK = 1024
# memory bound for the (32, m_chunk, 32, n) int32 intermediate
_MAX_INTER_BYTES = 1 << 28  # 256 MB
REDC_ITERS = 17


def _mont_correction(spec: FieldSpec) -> np.ndarray:
    """Canonical limbs of 2^(16*REDC_ITERS) mod m (restores Montgomery form
    after an iters=17 REDC of a product of two Montgomery operands)."""
    return lb.int_to_limbs(pow(2, 16 * REDC_ITERS, spec.modulus))


def _byte_planes(x):
    """(16, ...) uint32 16-bit limbs -> (32, ...) uint32 byte planes,
    little-endian (plane 2i = low byte of limb i)."""
    lo = x & 0xFF
    hi = (x >> 8) & 0xFF
    stacked = jnp.stack([lo, hi], axis=1)  # (16, 2, ...)
    return stacked.reshape((2 * NLIMBS,) + x.shape[1:])


@functools.partial(jax.jit, static_argnums=0)
def mont_matmul(spec: FieldSpec, a, b):
    """Field matmul: a (16, m, k) @ b (16, k, n) -> (16, m, n), Montgomery.

    Exact for k <= 2^19 (chunked internally at K_CHUNK for the uint32 column
    bound).
    """
    assert spec.pm_c is None, "mont_matmul is Montgomery-form only"
    m, k = a.shape[1], a.shape[2]
    n = b.shape[2]

    acc = None
    for k0 in range(0, k, K_CHUNK):
        k1 = min(k, k0 + K_CHUNK)
        part = _mont_matmul_chunk(spec, a[:, :, k0:k1], b[:, k0:k1, :])
        acc = part if acc is None else lb.add(spec, acc, part)
    return acc


def _mont_matmul_chunk(spec: FieldSpec, a, b):
    m, k = a.shape[1], a.shape[2]
    n = b.shape[2]

    # chunk m to bound the 4096*m*n-byte intermediate
    mb = max(1, min(m, _MAX_INTER_BYTES // max(1, 4096 * n)))
    outs = []
    for m0 in range(0, m, mb):
        outs.append(_matmul_core(spec, a[:, m0 : m0 + mb, :], b))
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)


def _matmul_core(spec: FieldSpec, a, b):
    m, k = a.shape[1], a.shape[2]
    n = b.shape[2]
    a8 = _byte_planes(a).astype(jnp.int32)  # (32, m, k)
    b8 = _byte_planes(b).astype(jnp.int32)  # (32, k, n)

    # ONE integer contraction for all 32x32 byte-plane pairs (MXU).
    p2 = jax.lax.dot_general(
        a8, b8,
        dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # (32, m, 32, n)
    p2 = p2.astype(jnp.uint32)

    # cols8[c] = sum_{i+j=c} p2[i, :, j, :]   (c in [0, 63))
    ncols = 4 * NLIMBS - 1  # 63
    batch = (m, n)
    cols = [jnp.zeros(batch, U32) for _ in range(ncols + 4)]
    for i in range(2 * NLIMBS):
        for j in range(2 * NLIMBS):
            cols[i + j] = cols[i + j] + p2[i, :, j, :]

    # carry-propagate 8-bit columns (values < 2^32) to 8-bit digits
    digits = []
    carry = jnp.zeros(batch, U32)
    for c in cols:
        v = c + carry
        digits.append(v & 0xFF)
        carry = v >> 8
    digits.append(carry & 0xFF)
    digits.append((carry >> 8) & 0xFF)

    # pack byte pairs into 16-bit columns
    cols16 = [
        digits[2 * t] + (digits[2 * t + 1] << 8)
        for t in range((len(digits)) // 2)
    ]

    # generalized REDC: T * 2^(-16*17); then restore Montgomery form
    redc = lb._redc_scan if lb._scan_mode() else lb._redc
    red = redc(spec, cols16, iters=REDC_ITERS)
    corr = jnp.asarray(_mont_correction(spec), U32).reshape(
        (NLIMBS,) + (1,) * (red.ndim - 1)
    )
    return lb.mont_mul(spec, red, jnp.broadcast_to(corr, red.shape))
