"""SPDZ shares of curve points.

Analog of `online-phase/src/algebra/curve/share.rs:25-116`: a point share is
an additive share of a point plus a MAC point (mac_key * P shared
additively).  Linear ops mirror the scalar case; `add_public` keeps the
party-0 asymmetry (`curve/share.rs:57-60`).

Curve-generic: the contained point batch (Ed25519 `CurvePoint` by default,
`bn254.G1`, ...) carries the group law, mirroring the reference's
`C: CurveGroup` genericity (`online-phase/src/lib.rs:75-78`).  Both curve
classes expose the same batch interface (`_add_raw`, `_eager`, `mul`,
`sum`, ...), so every method here is curve-agnostic.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax

from .curve import CurvePoint
from .scalar import Scalar
from .share import PARTY0


@dataclass
class PointShare:
    """Additive share + MAC share of a batch of curve points."""

    share: CurvePoint
    mac: CurvePoint

    @property
    def shape(self):
        return self.share.shape

    @property
    def size(self):
        return self.share.size

    def __add__(self, other: "PointShare"):
        if self.share._eager(other.share):
            return _ps_add(self, other)
        return PointShare(self.share + other.share, self.mac + other.mac)

    def __sub__(self, other: "PointShare"):
        if self.share._eager(other.share):
            return _ps_sub(self, other)
        return PointShare(self.share - other.share, self.mac - other.mac)

    def __neg__(self):
        return PointShare(-self.share, -self.mac)

    def mul_public(self, rhs: Scalar):
        """Scale by a public scalar (`curve/share.rs:84-97`)."""
        return PointShare(self.share.mul(rhs), self.mac.mul(rhs))

    def add_public(self, rhs: CurvePoint, mac_key: Scalar, party_id: int):
        """Add a public point: party 0 updates the share; both parties add
        mac_key_share * rhs to the MAC (`curve/share.rs:57-60`)."""
        share = self.share + rhs if party_id == PARTY0 else self.share
        return PointShare(share, self.mac + rhs.mul(mac_key))

    def sub_public(self, rhs: CurvePoint, mac_key: Scalar, party_id: int):
        return self.add_public(-rhs, mac_key, party_id)

    def __getitem__(self, idx):
        return PointShare(self.share[idx], self.mac[idx])

    def reshape(self, *shape):
        return PointShare(self.share.reshape(*shape), self.mac.reshape(*shape))

    def sum(self, axis=0):
        return PointShare(self.share.sum(axis), self.mac.sum(axis))

    @classmethod
    def concatenate(cls, items, axis=0):
        return cls(
            CurvePoint.concatenate([i.share for i in items], axis),
            CurvePoint.concatenate([i.mac for i in items], axis),
        )

    @classmethod
    def identity(cls, shape=(), curve=CurvePoint):
        return cls(curve.identity(shape), curve.identity(shape))

    @property
    def curve(self):
        return type(self.share)

    def __repr__(self):
        return f"PointShare(shape={self.shape})"


# paired (share, mac) group ops: one dispatch per point-share op instead of
# two group-law dispatches (same rationale as `share._add2`)
@jax.jit
def _ps_add(a: "PointShare", b: "PointShare") -> "PointShare":
    return PointShare(a.share._add_raw(b.share), a.mac._add_raw(b.mac))


@jax.jit
def _ps_sub(a: "PointShare", b: "PointShare") -> "PointShare":
    return PointShare(a.share._add_raw(-b.share), a.mac._add_raw(-b.mac))


def scalar_share_mul_point(scalar_share, point: CurvePoint) -> PointShare:
    """[x] * P for public P -> PointShare (`scalar/share.rs:137-160`)."""
    return PointShare(point.mul(scalar_share.share), point.mul(scalar_share.mac))


jax.tree_util.register_pytree_node(
    PointShare,
    lambda s: ((s.share, s.mac), None),
    lambda aux, ch: PointShare(ch[0], ch[1]),
)
