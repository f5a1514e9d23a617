"""MPC gadget layer (`online-phase/src/gadgets.rs` analog)."""

from .bits import bit_xor, bit_xor_public
from .products import prefix_product

__all__ = ["bit_xor", "bit_xor_public", "prefix_product"]
