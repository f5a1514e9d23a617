"""Bitwise gadgets over shared bits.

Analog of `online-phase/src/gadgets.rs:17-94`.  All inputs are authenticated
shares of values in {0, 1}; batch-first (the reference's `_batch` variants
are the only form here).
"""

from __future__ import annotations

from ..algebra.scalar import Scalar
from ..algebra.share import ScalarShare
from ..fabric.context import MpcFabric


def bit_xor(fabric: MpcFabric, a, b):
    """a ^ b = a + b - 2ab for shared bits (`gadgets.rs:17-38`).

    Costs one Beaver multiplication round over the batch.  Accepts
    `TracedShare` operands (the mul fuses with its level-mates).
    """
    from ..fabric.scheduler import TracedShare

    two = Scalar.from_ints(2)
    if isinstance(a, TracedShare):
        return a + b - (a * b) * two
    ab = fabric.mul(a, b)
    return a + b - ab.mul_public(two)


def bit_xor_public(fabric: MpcFabric, a, b: Scalar):
    """a ^ b with b public (`gadgets.rs:40-66`); no communication."""
    from ..fabric.scheduler import TracedShare

    two = Scalar.from_ints(2)
    # a + b - 2ab = a*(1 - 2b) + b
    one_minus_2b = Scalar.ones(b.shape) - b * two
    if isinstance(a, TracedShare):
        return a * one_minus_2b + b
    return fabric.add_public(a.mul_public(one_minus_2b), b)
