"""TPU-resident BGV (MP-SPDZ FHE replacement; see docs/bgv_design.md)."""

from .bgv import (
    Ciphertext,
    Keypair,
    add_ct,
    add_pt,
    decode_slots,
    decrypt,
    decrypt_slots,
    encode_slots,
    encrypt,
    encrypt_slots,
    keygen,
    mul_pt,
    rerandomize,
)
from .params import BgvParams, test_params

__all__ = [
    "BgvParams",
    "test_params",
    "Ciphertext",
    "Keypair",
    "keygen",
    "encrypt",
    "decrypt",
    "encrypt_slots",
    "decrypt_slots",
    "encode_slots",
    "decode_slots",
    "add_ct",
    "add_pt",
    "mul_pt",
    "rerandomize",
]
