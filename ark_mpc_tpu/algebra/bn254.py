"""Second field/curve instantiation: BN254 (alt_bn128) G1.

The reference is generic over `C: CurveGroup` and its tests instantiate
`ark_bn254::G1Projective` (`online-phase/src/lib.rs:75-78`).  This module
instantiates the SAME generic limb engine (`algebra/limbs.py`) at BN254's
base and scalar fields and implements G1 in JACOBIAN coordinates over it —
proving the `FieldSpec`/`FieldArray` kernel layering is generic over the
prime and the curve shape (short Weierstrass here vs twisted Edwards for
the Curve25519 north star), not incidentally single-curve.

Both BN254 primes are ~254 bits, far from pseudo-Mersenne, so every
operation exercises the generic Montgomery REDC path of the limb engine.

y^2 = x^3 + 3 over F_q; generator (1, 2); cofactor 1 (every F_q-rational
point is in the prime-order group, so the subgroup check is curve
membership).  Formulas: standard Jacobian add-2007-bl / dbl-2009-l.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import limbs as lb
from .limbs import NLIMBS, FieldSpec
from .scalar import FieldArray, _register

BN254_Q = 21888242871839275222246405745257275088696311157297823662689037894645226208583
BN254_R = 21888242871839275222246405745257275088548364400416034343698204186575808495617

BN254_BASE = FieldSpec(BN254_Q, "bn254-fq")
BN254_SCALAR = FieldSpec(BN254_R, "bn254-fr")


class Fq(FieldArray):
    """BN254 base-field element(s) (generic Montgomery limb engine)."""

    spec = BN254_BASE


class Fr(FieldArray):
    """BN254 scalar-field element(s)."""

    spec = BN254_SCALAR


_register(Fq)
_register(Fr)


def _dbl(x: Fq) -> Fq:
    return x + x


class G1:
    """BN254 G1 point batch in Jacobian coordinates (X, Y, Z); the point
    at infinity is Z == 0 (represented (1, 1, 0)).

    Implements the same batch-point interface as the Ed25519 `CurvePoint`
    (shape/reshape/concatenate/sum/mul/wire conversion), so the generic
    point-share protocols in `fabric/points.py` run unchanged over either
    curve — the analog of the reference's `C: CurveGroup` genericity for
    the point half (`online-phase/src/lib.rs:75-78`,
    `algebra/curve/authenticated_curve.rs`)."""

    base_field = None   # set below (Fq)
    scalar_field = None  # set below (Fr)

    def __init__(self, X: Fq, Y: Fq, Z: Fq):
        self.X, self.Y, self.Z = X, Y, Z

    @classmethod
    def generator(cls, shape=()) -> "G1":
        shape = (shape,) if isinstance(shape, int) else tuple(shape)
        return cls(Fq.from_ints(1).broadcast_to(shape),
                   Fq.from_ints(2).broadcast_to(shape),
                   Fq.ones(shape))

    @classmethod
    def identity(cls, shape=()) -> "G1":
        shape = (shape,) if isinstance(shape, int) else tuple(shape)
        return cls(Fq.ones(shape), Fq.ones(shape), Fq.zeros(shape))

    @property
    def shape(self):
        return self.X.shape

    @property
    def size(self):
        return self.X.size

    def _coords(self):
        return (self.X, self.Y, self.Z)

    def _eager(self, other=None) -> bool:
        t = jax.core.Tracer
        return not (isinstance(self.X.limbs, t) or
                    (other is not None and isinstance(other.X.limbs, t)))

    def __getitem__(self, idx):
        return G1(*(c[idx] for c in self._coords()))

    def reshape(self, *shape):
        return G1(*(c.reshape(*shape) for c in self._coords()))

    @classmethod
    def concatenate(cls, items, axis=0):
        return cls(*(Fq.concatenate([it._coords()[i] for it in items], axis)
                     for i in range(3)))

    def _slice(self, axis, start, stop):
        idx = (slice(None),) * axis + (slice(start, stop),)
        return self[idx]

    def _squeeze(self, axis):
        return G1(*(type(c)(jnp.squeeze(c.limbs, axis + 1))
                    for c in self._coords()))

    def sum(self, axis=0) -> "G1":
        """Tree-reduction point sum along a batch axis."""
        pt = self
        n = pt.shape[axis]
        while n > 1:
            half = n // 2
            s = pt._slice(axis, 0, half) + pt._slice(axis, half, 2 * half)
            if n % 2:
                s = G1.concatenate([s, pt._slice(axis, 2 * half, n)], axis)
            pt = s
            n = pt.shape[axis]
        return pt._squeeze(axis)

    def is_identity(self):
        return self.Z.is_zero()

    def double(self) -> "G1":
        if self._eager():
            return _g1_group_double(self)
        return self._double_raw()

    def _double_raw(self) -> "G1":
        """dbl-2009-l (a = 0)."""
        X1, Y1, Z1 = self.X, self.Y, self.Z
        A = X1.square()
        B = Y1.square()
        C = B.square()
        D = _dbl((X1 + B).square() - A - C)
        E = _dbl(A) + A
        F = E.square()
        X3 = F - _dbl(D)
        Y3 = E * (D - X3) - _dbl(_dbl(_dbl(C)))
        Z3 = _dbl(Y1 * Z1)
        return G1(X3, Y3, Z3)

    def __add__(self, other: "G1") -> "G1":
        """Complete addition: one jitted dispatch when eager, inlined
        under an enclosing trace (same policy as `CurvePoint.__add__`)."""
        if self._eager(other):
            return _g1_group_add(self, other)
        return self._add_raw(other)

    def __sub__(self, other: "G1") -> "G1":
        if self._eager(other):
            return _g1_group_sub(self, other)
        return self._add_raw(-other)

    def _add_raw(self, other: "G1") -> "G1":
        """add-2007-bl with identity/doubling handled by select (the
        branch-free form vectorized batches need)."""
        X1, Y1, Z1 = self.X, self.Y, self.Z
        X2, Y2, Z2 = other.X, other.Y, other.Z
        Z1Z1 = Z1.square()
        Z2Z2 = Z2.square()
        U1 = X1 * Z2Z2
        U2 = X2 * Z1Z1
        S1 = Y1 * Z2 * Z2Z2
        S2 = Y2 * Z1 * Z1Z1
        H = U2 - U1
        I = _dbl(H).square()  # noqa: E741
        J = H * I
        rr = _dbl(S2 - S1)
        V = U1 * I
        X3 = rr.square() - J - _dbl(V)
        Y3 = rr * (V - X3) - _dbl(S1 * J)
        Z3 = ((Z1 + Z2).square() - Z1Z1 - Z2Z2) * H
        out = G1(X3, Y3, Z3)

        same_x = H.is_zero()
        same_y = (S2 - S1).is_zero()
        dbl = self.double()
        # equal points -> double; opposite points -> identity
        out = out.select(~(same_x & same_y & ~self.is_identity()
                           & ~other.is_identity()), dbl)
        out = out.select(~(same_x & ~same_y & ~self.is_identity()
                           & ~other.is_identity()),
                         G1.identity(out.shape))
        out = out.select(~self.is_identity(), other)
        out = out.select(~other.is_identity(), self)
        return out

    def select(self, cond, alt: "G1") -> "G1":
        """elementwise: cond ? self : alt."""
        def sel(a: Fq, b: Fq) -> Fq:
            c = jnp.broadcast_to(cond, a.limbs.shape[1:])
            return Fq(jnp.where(c[None], a.limbs, b.limbs))

        return G1(sel(self.X, alt.X), sel(self.Y, alt.Y),
                  sel(self.Z, alt.Z))

    def __neg__(self) -> "G1":
        return G1(self.X, -self.Y, self.Z)

    def mul(self, scalar: Fr) -> "G1":
        """Double-and-select ladder over the canonical scalar bits — ONE
        jitted `fori_loop` program (an unrolled 254-step eager loop costs
        ~20k dispatches per call; the loop form compiles one body).

        Shapes are CANONICALIZED before the jit: broadcast point/scalar
        together, flatten, pad the batch up to a power of two (min 8) and
        slice back.  The ladder body is expensive for XLA:CPU (~minutes
        per compile), so every protocol-layer mul of any small batch must
        hit ONE cached compile instead of one per (point, scalar) shape
        pair — this took the BN254 point-protocol tests from 563 s to
        seconds after the first compile."""
        shape = jnp.broadcast_shapes(self.shape, scalar.shape)
        n = 1
        for s in shape:
            n *= s
        pad = max(8, 1 << (max(n - 1, 1)).bit_length())
        pt = self.broadcast_to(shape).reshape(n)
        sc = scalar.broadcast_to(shape).reshape(n)
        if pad != n:
            pt = G1.concatenate([pt, G1.identity((pad - n,))])
            sc = Fr.concatenate([sc, Fr.zeros((pad - n,))])
        out = _g1_scalar_mul(pt, sc)
        return out[:n].reshape(*shape)

    __mul__ = mul
    __rmul__ = mul

    def broadcast_to(self, shape) -> "G1":
        return G1(self.X.broadcast_to(shape), self.Y.broadcast_to(shape),
                  self.Z.broadcast_to(shape))

    def to_affine(self):
        zinv = self.Z.inverse()
        zi2 = zinv.square()
        return self.X * zi2, self.Y * zi2 * zinv

    def normalize(self) -> "G1":
        x, y = self.to_affine()
        pt = G1.from_affine(x, y)
        return pt.select(~self.is_identity(), G1.identity(pt.shape))

    def __repr__(self):
        return f"G1(shape={self.shape})"

    def equals(self, other: "G1"):
        """Jacobian equality: X1 Z2^2 == X2 Z1^2, Y1 Z2^3 == Y2 Z1^3."""
        Z1Z1, Z2Z2 = self.Z.square(), other.Z.square()
        ex = (self.X * Z2Z2).equals(other.X * Z1Z1)
        ey = (self.Y * Z2Z2 * other.Z).equals(other.Y * Z1Z1 * self.Z)
        both_id = self.is_identity() & other.is_identity()
        return both_id | (ex & ey & ~self.is_identity()
                          & ~other.is_identity())

    def is_on_curve(self):
        """Jacobian curve membership: Y^2 == X^3 + 3 Z^6."""
        z2 = self.Z.square()
        z6 = z2.square() * z2
        b3 = Fq.from_ints(3).broadcast_to(self.shape)
        rhs = self.X.square() * self.X + b3 * z6
        return self.Y.square().equals(rhs) | self.is_identity()

    def is_in_prime_subgroup(self):
        """BN254 G1 has cofactor 1: every F_q-rational point is in the
        prime-order group, so subgroup membership follows from curve
        membership alone (checked separately by the wire-ingestion
        validator).  Returns all-true of the batch shape."""
        return jnp.ones(self.shape, bool)

    @classmethod
    def from_affine(cls, x: Fq, y: Fq) -> "G1":
        return cls(x, y, Fq.ones(x.shape))

    @classmethod
    def from_wire_affine(cls, xc, yc) -> "G1":
        """Rebuild points from canonical affine limb arrays off the wire.
        The identity travels as (0, 0) — NOT a curve point (0 != 3 over
        F_q), so the encoding is unambiguous (arkworks uses an infinity
        flag bit; a coordinate sentinel keeps the wire format identical to
        the Ed25519 one: x || y limb arrays)."""
        x = Fq(lb.to_mont(BN254_BASE, xc))
        y = Fq(lb.to_mont(BN254_BASE, yc))
        is_id = x.is_zero() & y.is_zero()
        pt = cls.from_affine(x, y)
        return pt.select(~is_id, cls.identity(pt.shape))


G1.base_field = Fq
G1.scalar_field = Fr
# field -> curve link used by the generic point protocols
# (`fabric/points.py`): a fabric over Fr shares speaks G1 points.
Fr.curve = G1

jax.tree_util.register_pytree_node(
    G1,
    lambda p: ((p.X, p.Y, p.Z), None),
    lambda aux, ch: G1(*ch),
)

# single-dispatch eager group ops (policy of `curve.py:_group_add`)
_g1_group_add = jax.jit(G1._add_raw)
_g1_group_double = jax.jit(G1._double_raw)
_g1_group_sub = jax.jit(lambda p, q: p._add_raw(-q))


@jax.jit
def _g1_scalar_mul(point: G1, scalar: Fr) -> G1:
    """MSB-first double-and-select ladder under `lax.fori_loop` (256
    iterations; canonical Fr scalars are < 2^254, the top bits are zero).
    One compiled body — the graph is O(1) in the bit count, which keeps
    XLA:CPU compile time flat (`curve.py:_scalar_mul` policy)."""
    shape = jnp.broadcast_shapes(point.shape, scalar.shape)
    pt = point.broadcast_to(shape)
    canon = lb.from_mont(BN254_SCALAR, scalar.limbs)
    canon = jnp.broadcast_to(
        canon.reshape(canon.shape[:1] + (1,) * (len(shape) - len(scalar.shape))
                      + canon.shape[1:]),
        (NLIMBS,) + shape)

    def body(j, acc: G1) -> G1:
        bit_index = 255 - j
        limb = jax.lax.dynamic_index_in_dim(
            canon, bit_index >> 4, axis=0, keepdims=False)
        bit = (limb >> (bit_index.astype(jnp.uint32) & 15)) & 1
        acc = acc.double()
        added = acc + pt
        return added.select(bit == 1, acc)

    return jax.lax.fori_loop(0, 256, body, G1.identity(shape))
