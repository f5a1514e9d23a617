"""LowGear offline phase (`offline-phase/src/lowgear/` analog)."""

from .core import LowGear
from .protocols import (
    beaver_mul,
    generate_inverse_tuples,
    generate_shared_bits,
    open_and_check_macs,
    public_coin_scalars,
)

__all__ = [
    "LowGear",
    "beaver_mul",
    "generate_inverse_tuples",
    "generate_shared_bits",
    "open_and_check_macs",
    "public_coin_scalars",
]
