"""Flagship MPC circuits.

The reference exercises these as integration circuits
(`integration/src/circuits.rs`: inner product, MSM, poly eval) and as the
driver's benchmark configs (BASELINE.json): batched Beaver multiply with one
deferred MAC check, inner products, and shared matrix multiplication.
"""

from __future__ import annotations

from ..algebra.scalar import Scalar
from ..algebra.share import ScalarShare
from ..fabric.context import MpcFabric


def inner_product(fabric: MpcFabric, x: ScalarShare, y: ScalarShare,
                  defer_check: bool = True) -> ScalarShare:
    """<x, y> with one Beaver round + local tree sum."""
    prod = fabric.mul(x, y)
    return prod.sum()


def shared_matmul(fabric: MpcFabric, a: ScalarShare, b: ScalarShare,
                  ) -> ScalarShare:
    """C = A @ B over shared matrices (config 5 of BASELINE.json).

    Matrix Beaver protocol with a matrix triple ([P], [Q], [P@Q]): open
    D = A - P and E = B - Q in ONE coalesced round (O(mk + kn) bytes), then
    locally  [AB] = D@[Q] + [P]@E + [P@Q] + add_public(D@E).  All four
    products run on the MXU via `ops/matmul.py`.
    """
    m, k = a.shape
    k2, n = b.shape
    assert k == k2
    p, q, c = fabric.offline.next_matrix_triplet(m, k, n)

    d_flat = (a - p).reshape(m * k)
    e_flat = (b - q).reshape(k * n)
    opened = fabric.open(ScalarShare.concatenate([d_flat, e_flat]))
    d = opened[: m * k].reshape(m, k)
    e = opened[m * k :].reshape(k, n)

    res = q.matmul_public_left(d) + p.matmul_public_right(e) + c
    return fabric.add_public(res, d @ e)


def poly_eval(fabric: MpcFabric, coeffs: ScalarShare, x: Scalar) -> ScalarShare:
    """Evaluate a shared polynomial at a public point (Horner, local)."""
    n = coeffs.size
    acc = coeffs[n - 1]
    for i in range(n - 2, -1, -1):
        acc = acc.mul_public(x) + coeffs[i]
    return acc
