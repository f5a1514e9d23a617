"""Good-Thomas prime-factor DFT over Z_q for smooth non-power-of-2 lengths.

The scalable transform for the production cyclotomic rings
(docs/bgv_design.md): m = 118965 = 3*5*7*11*103 makes the dense m x m DFT
matrices infeasible (23 GB per RNS prime), but the prime-factor algorithm
needs only the tiny per-factor matrices (3x3 ... 103x103) and two index
permutations:

  with m = prod m_i pairwise coprime and c_i = (m/m_i) * ((m/m_i)^-1 mod
  m_i) the CRT idempotents, w^(n*k) = prod_i (w^(c_i))^(n_i * k_i), so the
  length-m DFT = reshape by n -> (n mod m_1, ..., n mod m_k), independent
  small DFTs along each axis with root w^(c_i) (order m_i), reshape out by
  k -> (k mod m_i).  No twiddle factors.

Cost: m * sum(m_i) modular mult-adds per transform (1.5e7 for the
production m) versus m^2 = 1.4e10 for the dense matrix.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from .modular32 import PrimeSpec, add32, mont_mul32, primitive_root_of_unity

U32 = jnp.uint32


def _coprime_factors(m: int) -> list[int]:
    """m as a product of pairwise-coprime prime powers."""
    out, t, p = [], m, 2
    while p * p <= t:
        if t % p == 0:
            pk = 1
            while t % p == 0:
                t //= p
                pk *= p
            out.append(pk)
        p += 1
    if t > 1:
        out.append(t)
    return out


class PfaPlan:
    """Precomputed Good-Thomas plan for one (q, m)."""

    def __init__(self, q: int, m: int):
        assert (q - 1) % m == 0
        self.spec = PrimeSpec(q)
        self.m = m
        self.factors = _coprime_factors(m)
        assert math.prod(self.factors) == m
        w = primitive_root_of_unity(q, m)
        r = self.spec.r

        # CRT idempotents and per-axis roots
        self.axis_mats = []      # forward DFT matrices (Montgomery form)
        self.axis_mats_inv = []  # inverse (incl. 1/m_i factor)
        for mi in self.factors:
            rest = m // mi
            ci = rest * pow(rest, -1, mi) % m
            wi = pow(w, ci, q)       # order mi
            wi_inv = pow(wi, q - 2, q)
            mi_inv = pow(mi, q - 2, q)
            fwd = np.array(
                [[pow(wi, (a * b) % mi, q) * r % q for b in range(mi)]
                 for a in range(mi)], dtype=np.uint32)
            inv = np.array(
                [[pow(wi_inv, (a * b) % mi, q) * mi_inv % q * r % q
                  for b in range(mi)] for a in range(mi)], dtype=np.uint32)
            self.axis_mats.append(jnp.asarray(fwd))
            self.axis_mats_inv.append(jnp.asarray(inv))

        # index maps: CRT multi-index idx(n) built from (n mod m_i); both
        # input and output use the same map (idempotent CRT coordinates):
        #   grid_flat[idx(n)] = x[n]   and   X[k] = out_flat[idx(k)]
        shape = tuple(self.factors)
        perm = np.zeros(m, dtype=np.int64)
        for n in range(m):
            idx = 0
            for mi in self.factors:
                idx = idx * mi + (n % mi)
            perm[n] = idx
        inv_perm = np.zeros(m, dtype=np.int64)
        inv_perm[perm] = np.arange(m)
        self.perm_in = jnp.asarray(inv_perm)   # gather: grid_flat = x[inv]
        self.perm_out = jnp.asarray(perm)      # gather: X = out_flat[perm]
        self.grid_shape = shape

    def __hash__(self):
        return hash((self.spec.q, self.m))

    def __eq__(self, other):
        return (isinstance(other, PfaPlan) and other.spec.q == self.spec.q
                and other.m == self.m)


def _axis_matvec(plan: PfaPlan, mat, x, axis: int):
    """Apply an (mi x mi) modular matrix along `axis` of x (..., grid)."""
    spec = plan.spec
    x = jnp.moveaxis(x, axis, -1)
    # (..., mi) x (mi, mi): products via Montgomery, exact hi/lo accumulation
    prod = mont_mul32(spec, x[..., None, :],
                      jnp.broadcast_to(mat, x.shape[:-1] + mat.shape))
    lo = (prod & 0xFFFF).sum(axis=-1) % U32(spec.q)
    hi = (prod >> 16).sum(axis=-1) % U32(spec.q)
    hi_mont = mont_mul32(spec, hi, jnp.full_like(hi, U32(spec.r2)))
    hi_r = mont_mul32(spec, hi_mont, jnp.full_like(hi, U32(1 << 16)))
    out = add32(spec, hi_r, lo)
    return jnp.moveaxis(out, -1, axis)


def pfa_dft(plan: PfaPlan, x, inverse: bool = False):
    """Length-m DFT over the last axis via the prime-factor algorithm.

    x: (..., m) uint32 residues < q.  Exact for sum bounds
    max(m_i) * 2^16 < 2^32 (largest coprime factor < 2^16).
    """
    batch = x.shape[:-1]
    grid = x[..., plan.perm_in].reshape(batch + plan.grid_shape)
    mats = plan.axis_mats_inv if inverse else plan.axis_mats
    k = len(plan.factors)
    for i, mat in enumerate(mats):
        grid = _axis_matvec(plan, mat, grid, axis=len(batch) + i)
    flat = grid.reshape(batch + (plan.m,))
    return flat[..., plan.perm_out]
