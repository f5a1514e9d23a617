"""SPDZ secret-share algebra: (share, MAC) pairs with local linear ops.

TPU-native analog of `online-phase/src/algebra/scalar/share.rs:32-191` and
`algebra/curve/share.rs:25-116`.  A `ScalarShare` holds a *batch* of
authenticated shares as two limb arrays; every op is a fused vectorized
kernel over the whole batch.  This layer is pure and local (no communication)
— the exact algebra the protocol layers build on:

  - linear ops act on share and MAC together (`share.rs:85-133`)
  - `add_public` adds to party 0's share only, while BOTH parties add
    `mac_key_share * rhs` to the MAC (`share.rs:74-78`) — the party-0
    asymmetry that makes additive shares of public constants well-defined.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax

from . import limbs as lb
from .scalar import FieldArray, Scalar, _broadcast_limbs

PARTY0 = 0
PARTY1 = 1


# -- paired (share, mac) kernels ------------------------------------------
# Every linear share op touches both the share and the MAC array.  Fusing
# the pair into ONE jitted function halves the dispatch count per gate —
# which is the dominant cost for small batches: JAX dispatch overhead on
# CPU (the tracer's gate_throughput path), and a full tunnel round trip per
# dispatch in eager sync mode on TPU.  Broadcasting happens inside the jit
# so it fuses instead of costing its own dispatch.  The pair kernels are
# used only for EAGER operands: under an enclosing trace the plain Scalar
# ops inline instead, so big traced graphs don't gain a pjit nesting level
# (deeply nested pjits blow up the XLA CPU compiler).


def _tracer(*arrays) -> bool:
    return any(isinstance(a, jax.core.Tracer) for a in arrays)


@functools.partial(jax.jit, static_argnums=0)
def _add2(spec, xs, xm, ys, ym):
    return (lb.add(spec, *_broadcast_limbs(xs, ys)),
            lb.add(spec, *_broadcast_limbs(xm, ym)))


@functools.partial(jax.jit, static_argnums=0)
def _sub2(spec, xs, xm, ys, ym):
    return (lb.sub(spec, *_broadcast_limbs(xs, ys)),
            lb.sub(spec, *_broadcast_limbs(xm, ym)))


@functools.partial(jax.jit, static_argnums=0)
def _neg2(spec, xs, xm):
    return lb.neg(spec, xs), lb.neg(spec, xm)


@functools.partial(jax.jit, static_argnums=0)
def _mul2(spec, xs, xm, r):
    return (lb.mont_mul(spec, *_broadcast_limbs(xs, r)),
            lb.mont_mul(spec, *_broadcast_limbs(xm, r)))


@functools.partial(jax.jit, static_argnums=(0, 5))
def _add_public2(spec, xs, xm, r, k, is_p0):
    share = lb.add(spec, *_broadcast_limbs(xs, r)) if is_p0 else xs
    kr = lb.mont_mul(spec, *_broadcast_limbs(k, r))
    return share, lb.add(spec, *_broadcast_limbs(xm, kr))


@dataclass
class ScalarShare:
    """Additive share + SPDZ MAC share of a batch of field elements.

    Generic over the share field: the contained `FieldArray` subclass
    (Curve25519 `Scalar` by default, `bn254.Fr`, ...) carries the field
    spec, mirroring the reference's genericity over `C: CurveGroup`
    (`online-phase/src/lib.rs:75-78`).  All kernels read the spec from the
    operand, never from a module-level constant."""

    share: Scalar
    mac: Scalar

    @property
    def field(self):
        return type(self.share)

    @property
    def shape(self):
        return self.share.shape

    @property
    def size(self):
        return self.share.size

    # -- linear algebra (local; `share.rs:85-133`) -------------------------
    def __add__(self, other: "ScalarShare"):
        if _tracer(self.share.limbs, other.share.limbs):
            return ScalarShare(self.share + other.share, self.mac + other.mac)
        s, m = _add2(self.share.spec, self.share.limbs, self.mac.limbs,
                     other.share.limbs, other.mac.limbs)
        return ScalarShare(self.field(s), self.field(m))

    def __sub__(self, other: "ScalarShare"):
        if _tracer(self.share.limbs, other.share.limbs):
            return ScalarShare(self.share - other.share, self.mac - other.mac)
        s, m = _sub2(self.share.spec, self.share.limbs, self.mac.limbs,
                     other.share.limbs, other.mac.limbs)
        return ScalarShare(self.field(s), self.field(m))

    def __neg__(self):
        if _tracer(self.share.limbs):
            return ScalarShare(-self.share, -self.mac)
        s, m = _neg2(self.share.spec, self.share.limbs, self.mac.limbs)
        return ScalarShare(self.field(s), self.field(m))

    def mul_public(self, rhs: Scalar):
        """Multiply by a public value: scales share and MAC (`share.rs:124-133`)."""
        if isinstance(rhs, int):
            rhs = self.field.from_ints(rhs)
        if _tracer(self.share.limbs, rhs.limbs):
            return ScalarShare(self.share * rhs, self.mac * rhs)
        s, m = _mul2(self.share.spec, self.share.limbs, self.mac.limbs,
                     rhs.limbs)
        return ScalarShare(self.field(s), self.field(m))

    def __mul__(self, rhs):
        if isinstance(rhs, FieldArray):
            return self.mul_public(rhs)
        return NotImplemented

    __rmul__ = __mul__

    def add_public(self, rhs: Scalar, mac_key: Scalar, party_id: int):
        """Add a public value (`share.rs:74-78`): party 0 updates the share,
        both parties update the MAC by `mac_key_share * rhs`."""
        if _tracer(self.share.limbs, rhs.limbs, mac_key.limbs):
            share = self.share + rhs if party_id == PARTY0 else self.share
            return ScalarShare(share, self.mac + mac_key * rhs)
        s, m = _add_public2(self.share.spec, self.share.limbs,
                            self.mac.limbs, rhs.limbs, mac_key.limbs,
                            party_id == PARTY0)
        return ScalarShare(self.field(s), self.field(m))

    def sub_public(self, rhs: Scalar, mac_key: Scalar, party_id: int):
        return self.add_public(-rhs, mac_key, party_id)

    def matmul_public_right(self, rhs: Scalar) -> "ScalarShare":
        """[X] @ E for public E: linear, applies to share and MAC."""
        return ScalarShare(self.share @ rhs, self.mac @ rhs)

    def matmul_public_left(self, lhs: Scalar) -> "ScalarShare":
        """D @ [X] for public D."""
        return ScalarShare(lhs @ self.share, lhs @ self.mac)

    # -- batch structure ---------------------------------------------------
    def __getitem__(self, idx):
        return ScalarShare(self.share[idx], self.mac[idx])

    def reshape(self, *shape):
        return ScalarShare(self.share.reshape(*shape), self.mac.reshape(*shape))

    @classmethod
    def concatenate(cls, items, axis=0):
        f = type(items[0].share)
        return cls(
            f.concatenate([it.share for it in items], axis=axis),
            f.concatenate([it.mac for it in items], axis=axis),
        )

    def sum(self, axis=0):
        """Share-wise sum (the `Sum` impl at `share.rs:104-111`)."""
        return ScalarShare(self.share.sum(axis), self.mac.sum(axis))

    @classmethod
    def zeros(cls, shape=(), field=Scalar):
        return cls(field.zeros(shape), field.zeros(shape))

    def __repr__(self):
        return f"ScalarShare(shape={self.shape})"


jax.tree_util.register_pytree_node(
    ScalarShare,
    lambda s: ((s.share, s.mac), None),
    lambda aux, ch: ScalarShare(ch[0], ch[1]),
)
