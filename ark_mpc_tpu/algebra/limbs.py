"""Limb-decomposed prime-field arithmetic for TPU.

This is the TPU-native replacement for the reference's plaintext-algebra layer
(`online-phase/src/algebra/scalar/scalar.rs:43-372`, which wraps arkworks
bigint arithmetic).  Instead of per-element bigints, a batch of n field
elements is a single ``uint32`` array of shape ``(NLIMBS,) + batch_shape``
holding 16-bit little-endian limbs.  The *batch* axis is trailing so that it
maps onto TPU vector lanes; the limb axis is leading (sublanes).  All
arithmetic is branch-free element-wise uint32 math that XLA vectorizes on the
VPU, with limb loops unrolled at trace time (static shapes, no data-dependent
control flow).

Multiplication is Montgomery (SOS: schoolbook convolution followed by a
16-iteration REDC).  All values are kept in Montgomery form internally; the
conversion happens only at user/serialization boundaries (`to_int`,
`to_bytes`).  Field inversion is Fermat exponentiation driven by
``lax.fori_loop`` over the fixed exponent bits — fully data-parallel across
the batch, unlike the sequential Montgomery-trick batch inversion the
reference uses on CPU (`scalar.rs` batch_inverse).

Overflow analysis (why uint32 never overflows):
  - 16x16-bit limb products are < 2^32; they are immediately split into
    lo/hi 16-bit halves before column accumulation.
  - A product-convolution column sums <= 32 halves < 2^21.
  - Each REDC iteration adds <= 2 * 2^16 per column over <= 16 iterations
    (< 2^21) plus folded carries (< 2^11); total < 2^23 << 2^32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# 16 limbs x 16 bits = 256-bit values (moduli here are <= 255 bits).
NLIMBS = 16
LIMB_BITS = 16
LIMB_MASK = (1 << LIMB_BITS) - 1
U32 = jnp.uint32


def int_to_limbs(value: int, n_limbs: int = NLIMBS) -> np.ndarray:
    """Decompose a python int into little-endian 16-bit limbs (numpy)."""
    out = np.zeros(n_limbs, dtype=np.uint32)
    for i in range(n_limbs):
        out[i] = (value >> (LIMB_BITS * i)) & LIMB_MASK
    if value >> (LIMB_BITS * n_limbs):
        raise ValueError("value does not fit in limbs")
    return out


def limbs_to_int(limbs) -> int:
    """Recompose python int from little-endian 16-bit limb array (limb axis 0)."""
    limbs = np.asarray(limbs)
    acc = 0
    for i in reversed(range(limbs.shape[0])):
        acc = (acc << LIMB_BITS) | int(limbs[i])
    return acc


class FieldSpec:
    """Precomputed constants for one prime field.

    Hashable/eq by modulus so it can be a static jit argument.
    """

    def __init__(self, modulus: int, name: str):
        # All bounds in this module only need 2m < 2^256, i.e. m < 2^255.
        if modulus.bit_length() > NLIMBS * LIMB_BITS - 1:
            raise ValueError("modulus too large for 16x16-bit limbs")
        self.modulus = modulus
        self.name = name
        # Pseudo-Mersenne fast path: when 2^256 = c (mod m) for tiny c
        # (Ed25519's p = 2^255 - 19 gives c = 38), multiplication reduces by
        # folding high limbs x c instead of a 16-iteration Montgomery REDC,
        # and values are stored CANONICALLY (to/from_mont are identity).
        c = (1 << (NLIMBS * LIMB_BITS)) % modulus
        self.pm_c = c if modulus.bit_length() >= 250 and c < (1 << 10) else None
        self.r = (1 << (NLIMBS * LIMB_BITS)) % modulus  # R mod m
        self.r2 = (self.r * self.r) % modulus
        # n0 = -m^{-1} mod 2^16 (Montgomery magic constant)
        self.n0 = (-pow(modulus, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)
        self.mod_limbs = int_to_limbs(modulus)
        self.r2_limbs = int_to_limbs(self.r2)
        # internal-form 1: Montgomery R for generic fields, literal 1 for
        # pseudo-Mersenne (canonical) fields
        self.one_mont = int_to_limbs(1 if self.pm_c else self.r)
        self.zero = np.zeros(NLIMBS, dtype=np.uint32)
        # Exponent bits of m-2 (for Fermat inversion), LSB first.
        e = modulus - 2
        self.inv_exp_bits = np.array(
            [(e >> i) & 1 for i in range(modulus.bit_length())], dtype=np.uint32
        )

    def __hash__(self):
        return hash(self.modulus)

    def __eq__(self, other):
        return isinstance(other, FieldSpec) and other.modulus == self.modulus

    def __repr__(self):
        return f"FieldSpec({self.name})"


# ---------------------------------------------------------------------------
# add / sub / compare (canonical OR montgomery form: both live in [0, m))
# ---------------------------------------------------------------------------


def _carry_chain_add(limbs):
    """Propagate carries over a list of uint32 per-limb columns -> (limbs, carry)."""
    out = []
    carry = jnp.zeros_like(limbs[0])
    for t in limbs:
        t = t + carry
        out.append(t & LIMB_MASK)
        carry = t >> LIMB_BITS
    return out, carry


def _sub_with_borrow(x_limbs, y_limbs):
    """x - y limb-wise; returns (result limbs, borrow in {0,1})."""
    out = []
    borrow = jnp.zeros_like(x_limbs[0])
    for xi, yi in zip(x_limbs, y_limbs):
        t = xi + U32(LIMB_MASK + 1) - yi - borrow
        out.append(t & LIMB_MASK)
        borrow = U32(1) - (t >> LIMB_BITS)
    return out, borrow


def _rows(x):
    return [x[i] for i in range(x.shape[0])]


def _stack(rows):
    return jnp.stack(rows, axis=0)


@functools.partial(jax.jit, static_argnums=0)
def add(spec: FieldSpec, x, y):
    """(x + y) mod m, inputs/outputs in [0, m)."""
    s, _ = _carry_chain_add([xi + yi for xi, yi in zip(_rows(x), _rows(y))])
    m = [U32(v) for v in spec.mod_limbs]
    d, borrow = _sub_with_borrow(s, m)
    # x + y < 2m < 2^256 so no carry-out; select reduced value when s >= m.
    use_d = (borrow == 0)
    return _stack([jnp.where(use_d, di, si) for di, si in zip(d, s)])


@functools.partial(jax.jit, static_argnums=0)
def sub(spec: FieldSpec, x, y):
    """(x - y) mod m."""
    d, borrow = _sub_with_borrow(_rows(x), _rows(y))
    m = [U32(v) for v in spec.mod_limbs]
    dm, _ = _carry_chain_add([di + mi for di, mi in zip(d, m)])
    take_dm = (borrow == 1)
    return _stack([jnp.where(take_dm, ai, bi) for ai, bi in zip(dm, d)])


@functools.partial(jax.jit, static_argnums=0)
def neg(spec: FieldSpec, x):
    """(-x) mod m; maps 0 -> 0."""
    m = [U32(v) for v in spec.mod_limbs]
    d, _ = _sub_with_borrow(m, _rows(x))
    is_zero = jnp.ones_like(x[0], dtype=jnp.bool_)
    for xi in _rows(x):
        is_zero = is_zero & (xi == 0)
    return _stack([jnp.where(is_zero, jnp.zeros_like(di), di) for di in d])


@functools.partial(jax.jit, static_argnums=0)
def is_zero(spec: FieldSpec, x):
    acc = jnp.ones_like(x[0], dtype=jnp.bool_)
    for xi in _rows(x):
        acc = acc & (xi == 0)
    return acc


def eq(x, y):
    return jnp.all(x == y, axis=0)


# ---------------------------------------------------------------------------
# Montgomery multiply
# ---------------------------------------------------------------------------


def _conv_columns(x, y):
    """Full 256x256-bit product as 33 uint32 columns (pre-carry).

    Column k holds sum of lo halves with i+j==k and hi halves with i+j==k-1;
    each column < 2^21.
    """
    # p[i, j] = x[i] * y[j]  (uint32 wraps are impossible: 16b x 16b)
    p = x[:, None] * y[None, :]
    lo = p & LIMB_MASK
    hi = p >> LIMB_BITS
    batch_shape = x.shape[1:]
    cols = [jnp.zeros(batch_shape, U32) for _ in range(2 * NLIMBS + 1)]
    for i in range(NLIMBS):
        for j in range(NLIMBS):
            cols[i + j] = cols[i + j] + lo[i, j]
            cols[i + j + 1] = cols[i + j + 1] + hi[i, j]
    return cols


def _redc(spec: FieldSpec, cols, iters: int = NLIMBS):
    """Montgomery reduction of uint32 16-bit columns -> 16 canonical limbs.

    Computes T * 2^(-16*iters) mod m for T given as (possibly un-carried)
    columns.  Precondition: T < m * 2^(16*iters) (so the result is < 2m and
    fits 16 limbs).  `iters > 16` supports wider inputs such as matrix-matmul
    accumulators (see ops/matmul.py).
    """
    n = [U32(v) for v in spec.mod_limbs]
    n0 = U32(spec.n0)
    t = list(cols)
    while len(t) < iters + NLIMBS + 2:
        t.append(jnp.zeros_like(t[0]))
    for i in range(iters):
        m_i = (t[i] * n0) & LIMB_MASK
        for j in range(NLIMBS):
            p = m_i * n[j]
            t[i + j] = t[i + j] + (p & LIMB_MASK)
            t[i + j + 1] = t[i + j + 1] + (p >> LIMB_BITS)
        # Column i is final; fold its carry into column i+1.
        t[i + 1] = t[i + 1] + (t[i] >> LIMB_BITS)
    res, _carry = _carry_chain_add(t[iters : iters + NLIMBS])
    d, borrow = _sub_with_borrow(res, [U32(v) for v in spec.mod_limbs])
    use_d = (borrow == 0)
    return _stack([jnp.where(use_d, di, si) for di, si in zip(d, res)])


def _scan_mode() -> bool:
    """Use compact lax.scan limb loops on CPU (10x smaller HLO, much faster
    XLA/LLVM compiles for tests and virtual-mesh dry runs); keep fully
    unrolled loops on TPU where XLA fuses them into flat VPU code."""
    return jax.default_backend() == "cpu"


def _conv_scan(x, y):
    """Scan form of `_conv_columns`: acc[i:i+17] += lo(x_i*y)|hi shifted."""
    batch = x.shape[1:]
    acc0 = jnp.zeros((2 * NLIMBS + 1,) + batch, U32)
    zrow = jnp.zeros((1,) + batch, U32)

    def body(acc, i):
        p = x[i] * y  # (16, *batch) over j
        lo = p & LIMB_MASK
        hi = p >> LIMB_BITS
        window = jnp.concatenate([lo, zrow]) + jnp.concatenate([zrow, hi])
        cur = jax.lax.dynamic_slice_in_dim(acc, i, NLIMBS + 1, axis=0)
        acc = jax.lax.dynamic_update_slice_in_dim(acc, cur + window, i, axis=0)
        return acc, None

    acc, _ = jax.lax.scan(body, acc0, jnp.arange(NLIMBS))
    return acc


def _redc_scan(spec: FieldSpec, cols, iters: int = NLIMBS):
    """Scan form of `_redc` (same math, same preconditions)."""
    batch = cols[0].shape if isinstance(cols, (list, tuple)) else cols.shape[1:]
    t0 = jnp.stack(list(cols)) if isinstance(cols, (list, tuple)) else cols
    total = iters + NLIMBS + 2
    if t0.shape[0] < total:
        pad = jnp.zeros((total - t0.shape[0],) + t0.shape[1:], U32)
        t0 = jnp.concatenate([t0, pad])
    n_limbs = jnp.asarray(spec.mod_limbs, U32).reshape((NLIMBS,) + (1,) * len(batch))
    n0 = U32(spec.n0)
    zrow = jnp.zeros((1,) + tuple(batch), U32)

    def body(t, i):
        u = t[i]
        m_i = (u * n0) & LIMB_MASK
        p = m_i * n_limbs
        lo = p & LIMB_MASK
        hi = p >> LIMB_BITS
        window = jnp.concatenate([lo, zrow]) + jnp.concatenate([zrow, hi])
        cur = jax.lax.dynamic_slice_in_dim(t, i, NLIMBS + 1, axis=0)
        t = jax.lax.dynamic_update_slice_in_dim(t, cur + window, i, axis=0)
        # fold the (now final) column i's carry into column i+1
        carry = t[i] >> LIMB_BITS
        t = t.at[i + 1].add(carry)
        return t, None

    t, _ = jax.lax.scan(body, t0, jnp.arange(iters))
    mid = jax.lax.dynamic_slice_in_dim(t, iters, NLIMBS, axis=0)

    # carry-propagate via scan
    def carry_body(c, col):
        v = col + c
        return v >> LIMB_BITS, v & LIMB_MASK

    _, res = jax.lax.scan(carry_body, jnp.zeros(tuple(batch), U32), mid)

    # conditional subtract m via borrow-chain scan
    def sub_body(b, args):
        xi, mi = args
        v = xi + U32(LIMB_MASK + 1) - mi - b
        return U32(1) - (v >> LIMB_BITS), v & LIMB_MASK

    mvec = jnp.broadcast_to(
        jnp.asarray(spec.mod_limbs, U32).reshape((NLIMBS,) + (1,) * len(batch)),
        (NLIMBS,) + tuple(batch),
    )
    borrow, d = jax.lax.scan(sub_body, jnp.zeros(tuple(batch), U32), (res, mvec))
    return jnp.where((borrow == 0)[None], d, res)


def _pm_fold(spec: FieldSpec, cols):
    """Pseudo-Mersenne reduction of 16-bit columns: repeatedly fold columns
    >= 16 down by x c (2^256 = c mod m), carry-propagate, conditional
    subtracts.  Preconditions: columns < 2^22 (conv output).  Exact."""
    c = U32(spec.pm_c)
    cols = list(cols)
    # fold high columns (17 of them) onto low: results < 2^22 + 2^22*c < 2^32
    low = list(cols[:NLIMBS])
    extra = jnp.zeros_like(low[0])
    for k in range(NLIMBS, len(cols)):
        if k - NLIMBS < NLIMBS:
            low[k - NLIMBS] = low[k - NLIMBS] + cols[k] * c
        else:
            extra = extra + cols[k] * c  # column 32 -> position 16
    res, carry = _carry_chain_add(low)
    # leftover weight 2^256: the top carry plus any column-32 fold
    top = carry + extra
    res[0] = res[0] + top * c
    res, carry2 = _carry_chain_add(res)
    # a second-order carry-out (value in [2^256, 2^256 + 2^29)) folds once
    # more as carry2 * c; the final chain then clears completely
    res[0] = res[0] + carry2 * c
    res, _ = _carry_chain_add(res)
    m = [U32(v) for v in spec.mod_limbs]
    for _ in range(2):  # value < 2^256 < 2m + c: at most two subtractions
        d, borrow = _sub_with_borrow(res, m)
        use_d = (borrow == 0)
        res = [jnp.where(use_d, di, si) for di, si in zip(d, res)]
    return _stack(res)


def _pm_fold_scan(spec: FieldSpec, cols_arr):
    """Scan/vectorized form of `_pm_fold` (compact HLO for CPU compiles):
    same math, carry chains as lax.scan."""
    c = U32(spec.pm_c)
    batch = cols_arr.shape[1:]
    zeros = jnp.zeros(batch, U32)
    low = cols_arr[:NLIMBS] + cols_arr[NLIMBS : 2 * NLIMBS] * c
    extra = cols_arr[2 * NLIMBS] * c if cols_arr.shape[0] > 2 * NLIMBS else zeros

    def cb(carry, col):
        v = col + carry
        return v >> LIMB_BITS, v & LIMB_MASK

    carry, res = jax.lax.scan(cb, zeros, low)
    res = res.at[0].add((carry + extra) * c)
    carry2, res = jax.lax.scan(cb, zeros, res)
    res = res.at[0].add(carry2 * c)
    _, res = jax.lax.scan(cb, zeros, res)

    mvec = jnp.broadcast_to(
        jnp.asarray(spec.mod_limbs, U32).reshape((NLIMBS,) + (1,) * len(batch)),
        (NLIMBS,) + tuple(batch),
    )

    def sub_body(b, args):
        xi, mi = args
        v = xi + U32(LIMB_MASK + 1) - mi - b
        return U32(1) - (v >> LIMB_BITS), v & LIMB_MASK

    for _ in range(2):
        borrow, d = jax.lax.scan(sub_body, zeros, (res, mvec))
        res = jnp.where((borrow == 0)[None], d, res)
    return res


@functools.partial(jax.jit, static_argnums=0)
def mont_mul(spec: FieldSpec, x, y):
    """Field product in internal form: Montgomery (x*y*R^{-1}) for generic
    moduli, plain canonical product for pseudo-Mersenne moduli."""
    if spec.pm_c:
        if _scan_mode():
            return _pm_fold_scan(spec, _conv_scan(x, y))
        return _pm_fold(spec, [r for r in _conv_columns(x, y)])
    if _scan_mode():
        return _redc_scan(spec, _conv_scan(x, y))
    return _redc(spec, _conv_columns(x, y))


@functools.partial(jax.jit, static_argnums=0)
def to_mont(spec: FieldSpec, x):
    """Canonical -> internal form (identity for pseudo-Mersenne fields)."""
    if spec.pm_c:
        return x
    r2 = jnp.asarray(spec.r2_limbs, U32).reshape((NLIMBS,) + (1,) * (x.ndim - 1))
    return mont_mul(spec, x, jnp.broadcast_to(r2, x.shape))


@functools.partial(jax.jit, static_argnums=0)
def from_mont(spec: FieldSpec, x):
    """Internal -> canonical form (identity for pseudo-Mersenne fields)."""
    if spec.pm_c:
        return x
    if _scan_mode():
        return _redc_scan(spec, x)
    return _redc(spec, _rows(x))


@functools.partial(jax.jit, static_argnums=0)
def reduce_wide(spec: FieldSpec, wide):
    """Reduce a wide value given as uint32 16-bit columns ``(k, batch)`` mod m.

    Requires value < m * 2^256 (true for k <= 28, i.e. <= 448 bits, since our
    moduli exceed 2^248).  Used for uniform sampling / hash-to-field with
    negligible bias (`curve/curve.rs:143-167` from_uniform_bytes analog).
    Returns the CANONICAL value X mod m (convert with `to_mont` if needed).
    """
    if spec.pm_c:
        if _scan_mode():
            pad = jnp.zeros((2 * NLIMBS + 1 - wide.shape[0],) + wide.shape[1:],
                            U32)
            return _pm_fold_scan(spec, jnp.concatenate([wide, pad]))
        return _pm_fold(spec, [wide[i] for i in range(wide.shape[0])])
    if _scan_mode():
        y = _redc_scan(spec, wide)
    else:
        y = _redc(spec, [wide[i] for i in range(wide.shape[0])])  # X * R^{-1}
    return mont_mul(spec, y, _bcast_const(spec.r2_limbs, y))  # X mod m, canonical


def _bcast_const(np_limbs, like):
    c = jnp.asarray(np_limbs, U32).reshape((NLIMBS,) + (1,) * (like.ndim - 1))
    return jnp.broadcast_to(c, like.shape)



@functools.partial(jax.jit, static_argnums=(0, 2))
def mont_pow_fixed(spec: FieldSpec, x, exp_bits: tuple):
    """x^e in Montgomery domain, e given as a static tuple of bits (LSB first)."""
    one = jnp.asarray(spec.one_mont, U32).reshape((NLIMBS,) + (1,) * (x.ndim - 1))
    acc = jnp.broadcast_to(one, x.shape)
    base = x
    for i, bit in enumerate(exp_bits):
        if bit:
            acc = mont_mul(spec, acc, base)
        if i != len(exp_bits) - 1:
            base = mont_mul(spec, base, base)
    return acc


@functools.partial(jax.jit, static_argnums=0)
def inverse(spec: FieldSpec, x):
    """x^{-1} (Montgomery domain in/out) by Fermat: x^(m-2).

    Square-and-multiply with a `lax.fori_loop` so the trace stays small while
    every batch element is processed fully in parallel (unlike the sequential
    prefix-product trick, this maps perfectly onto the VPU).
    0 maps to 0 (matching arkworks' `inverse().unwrap_or(zero)` behavior at
    protocol level; callers guard zero where the reference would error).
    """
    bits = jnp.asarray(spec.inv_exp_bits, U32)  # LSB-first
    nbits = int(spec.inv_exp_bits.shape[0])
    one = jnp.asarray(spec.one_mont, U32).reshape((NLIMBS,) + (1,) * (x.ndim - 1))
    acc0 = jnp.broadcast_to(one, x.shape)

    def body(i, carry):
        acc, base = carry
        bit = bits[i]
        mult = mont_mul(spec, acc, base)
        acc = jnp.where(bit == 1, mult, acc)
        base = mont_mul(spec, base, base)
        return (acc, base)

    acc, _ = jax.lax.fori_loop(0, nbits, body, (acc0, x))
    zero_mask = is_zero(spec, x)
    return jnp.where(zero_mask[None], jnp.zeros_like(acc), acc)


# ---------------------------------------------------------------------------
# host-side conversions
# ---------------------------------------------------------------------------


def pack_ints(spec: FieldSpec, values, mont: bool = True):
    """Python ints -> limb array (16, n) (device). Values taken mod m."""
    values = [int(v) % spec.modulus for v in values]
    arr = np.stack([int_to_limbs(v) for v in values], axis=-1).astype(np.uint32)
    x = jnp.asarray(arr)
    return to_mont(spec, x) if mont else x


def unpack_ints(spec: FieldSpec, x, mont: bool = True):
    """Limb array (16, ...) -> list of python ints (flattened batch)."""
    if mont:
        x = from_mont(spec, x)
    arr = np.asarray(jax.device_get(x)).reshape(NLIMBS, -1)
    return [limbs_to_int(arr[:, i]) for i in range(arr.shape[1])]
