"""Salted hash commitments over scalar batches.

Analog of `online-phase/src/commitment.rs:19-89`: a commitment to a batch of
values is `H(value[0] || ... || value[n-1] || blinder)` with SHA3-256, where
each value is its canonical big-endian 32-byte encoding, and the digest is
mapped into the scalar field via `from_be_bytes_mod_order`.  Used to gate
MAC-check openings (commit-before-reveal) in `open_authenticated`.

The hash itself runs host-side (it is O(n) bytes once per *round*, not per
gate); the committed values are computed on device.
"""

from __future__ import annotations

import hashlib

import numpy as np

from ..algebra.scalar import Scalar


def commit_bytes(data: bytes, blinder: Scalar) -> Scalar:
    """Commitment scalar for pre-serialized value bytes and a blinder
    (field-generic: the digest maps into the blinder's field)."""
    digest = hashlib.sha3_256(data + blinder.to_bytes_be()).digest()
    return type(blinder).from_be_bytes_mod_order(digest)


def verify_bytes(data: bytes, blinder: Scalar, commitment: Scalar) -> bool:
    expected = commit_bytes(data, blinder)
    return bool(np.all(np.asarray(expected.equals(commitment))))


def commit(values: Scalar, blinder: Scalar) -> Scalar:
    """Commitment scalar for a batch of values and a blinder."""
    return commit_bytes(values.to_bytes_be(), blinder)


def verify(values: Scalar, blinder: Scalar, commitment: Scalar) -> bool:
    """Check that `commitment` opens to (values, blinder)."""
    return verify_bytes(values.to_bytes_be(), blinder, commitment)
