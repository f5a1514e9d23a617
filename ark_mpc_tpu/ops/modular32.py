"""Vectorized modular arithmetic for word-size (< 2^31) moduli.

The BGV offline phase works in RNS: the big ciphertext modulus q is a
product of ~30-bit NTT-friendly primes, and every polynomial coefficient is
held as one uint32 residue per prime.  TPUs have no 64-bit integer multiply,
so products are assembled exactly from 16-bit halves (hi/lo u32 pieces) and
reduced with 32-bit Montgomery arithmetic — all element-wise uint32 VPU ops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

U32 = jnp.uint32
MASK16 = jnp.uint32(0xFFFF)


class PrimeSpec:
    """Precomputed constants for one RNS prime q < 2^31 (hashable/static)."""

    def __init__(self, q: int):
        assert 2 < q < (1 << 31) and all(q % p for p in (2, 3, 5, 7)) or True
        self.q = q
        self.r = (1 << 32) % q            # Montgomery R mod q
        self.r2 = self.r * self.r % q
        self.qinv_neg = (-pow(q, -1, 1 << 32)) % (1 << 32)  # -q^-1 mod 2^32

    def __hash__(self):
        return hash(self.q)

    def __eq__(self, other):
        return isinstance(other, PrimeSpec) and other.q == self.q


def _mul_wide(a, b):
    """Exact 64-bit product of uint32 arrays as (hi, lo) uint32 pair."""
    a0, a1 = a & MASK16, a >> 16
    b0, b1 = b & MASK16, b >> 16
    p00 = a0 * b0
    p01 = a0 * b1
    p10 = a1 * b0
    p11 = a1 * b1
    mid = p01 + p10                      # may wrap: 2*(2^16-1)^2 > 2^32
    mid_carry = (mid < p01).astype(U32)  # lost 2^32 -> 2^16 into hi
    mid_lo = (mid & MASK16) << 16
    lo = p00 + mid_lo                    # may wrap
    carry = (lo < p00).astype(U32)
    hi = p11 + (mid >> 16) + (mid_carry << 16) + carry
    return hi, lo


def mont_mul32(spec: PrimeSpec, a, b):
    """Montgomery product a*b*2^-32 mod q (inputs any u32; outputs < q)."""
    hi, lo = _mul_wide(a, b)
    m = lo * U32(spec.qinv_neg & 0xFFFFFFFF)          # wrapping mul mod 2^32
    mq_hi, mq_lo = _mul_wide(m, U32(spec.q))
    # lo + mq_lo == 0 (mod 2^32); carry unless both halves were zero
    carry = (lo != 0).astype(U32)
    t = hi + mq_hi + carry
    return jnp.where(t >= U32(spec.q), t - U32(spec.q), t)


def to_mont32(spec: PrimeSpec, x):
    return mont_mul32(spec, x, jnp.full_like(x, U32(spec.r2)))


def from_mont32(spec: PrimeSpec, x):
    return mont_mul32(spec, x, jnp.ones_like(x))


def add32(spec: PrimeSpec, a, b):
    s = a + b
    return jnp.where(s >= U32(spec.q), s - U32(spec.q), s)


def sub32(spec: PrimeSpec, a, b):
    return jnp.where(a >= b, a - b, a + U32(spec.q) - b)


def pow_mod(q: int, base: int, e: int) -> int:
    return pow(base, e, q)


def find_primes(n_primes: int, order: int, bits: int = 30) -> list[int]:
    """Primes q ≡ 1 (mod order), q < 2^31, descending from 2^bits."""
    def is_prime(v: int) -> bool:
        if v < 2:
            return False
        for p in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
            if v % p == 0:
                return v == p
        d, s = v - 1, 0
        while d % 2 == 0:
            d //= 2
            s += 1
        for a in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
            x = pow(a, d, v)
            if x in (1, v - 1):
                continue
            for _ in range(s - 1):
                x = x * x % v
                if x == v - 1:
                    break
            else:
                return False
        return True

    out = []
    k = (1 << bits) // order
    while len(out) < n_primes and k > 0:
        q = k * order + 1
        if q < (1 << 31) and is_prime(q):
            out.append(q)
        k -= 1
    if len(out) < n_primes:
        raise ValueError("not enough NTT primes")
    return out


def primitive_root_of_unity(q: int, order: int) -> int:
    """A primitive `order`-th root of unity mod prime q (q ≡ 1 mod order)."""
    assert (q - 1) % order == 0
    for g in range(2, 1000):
        w = pow(g, (q - 1) // order, q)
        # check primitivity: w^(order/p) != 1 for prime p | order
        o = order
        ok = True
        pfs = set()
        t = o
        d = 2
        while d * d <= t:
            if t % d == 0:
                pfs.add(d)
                while t % d == 0:
                    t //= d
            d += 1
        if t > 1:
            pfs.add(t)
        for p in pfs:
            if pow(w, order // p, q) == 1:
                ok = False
                break
        if ok:
            return w
    raise ValueError("no root found")
