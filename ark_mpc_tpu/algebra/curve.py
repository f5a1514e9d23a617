"""Batched Ed25519 group arithmetic over limb arrays.

TPU-native analog of the reference `CurvePoint<C>` wrapper
(`online-phase/src/algebra/curve/curve.rs:46-174,546-657`), instantiated for
the Curve25519 group (README north star): the twisted Edwards curve
-x^2 + y^2 = 1 + d x^2 y^2 over GF(2^255-19), prime-order subgroup of order
l (the scalar field).  A `CurvePoint` holds a *batch* of points in extended
twisted Edwards coordinates (X, Y, Z, T), each coordinate a limb array, so
group ops vectorize across the batch on the VPU.

Formulas are the complete unified add/double for a = -1 (RFC 8032 §5.1.4 /
Hisil-Wong-Carter-Dawson), valid for all prime-order-subgroup points: no
branches, so the kernels are trace-friendly.  Scalar multiplication is a
253-step double-and-select ladder under `lax.fori_loop`, fully parallel over
the batch; MSM = batched ladder + log-depth tree sum (the Pippenger
bucketing of `curve.rs:549-584` trades badly against TPU's scatter cost at
our batch sizes — measured choice, revisit with a Pallas kernel).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from . import limbs as lb
from .fields import BASE_FIELD, ED25519_PRIME, SCALAR_FIELD
from .limbs import NLIMBS
from .scalar import BaseFelt, Scalar

P = ED25519_PRIME
# Edwards d = -121665/121666 mod p, and 2d
ED_D = (-121665 * pow(121666, -1, P)) % P
ED_2D = (2 * ED_D) % P
# sqrt(-1) mod p (for decompression), = 2^((p-1)/4)
SQRT_M1 = pow(2, (P - 1) // 4, P)
# Standard base point
GEN_X = 15112221349535400772501151409588531511454012693041857206046113283949847762202
GEN_Y = 46316835694926478169428394003475163141307993866256225615783033603165251855960


def _const(value: int, shape):
    c = lb.to_mont(BASE_FIELD, jnp.asarray(lb.int_to_limbs(value), jnp.uint32))
    return BaseFelt(jnp.broadcast_to(
        jnp.reshape(c, (NLIMBS,) + (1,) * len(shape)), (NLIMBS,) + tuple(shape)
    ))


@dataclass
class CurvePoint:
    """Batch of Ed25519 points, extended coordinates (X, Y, Z, T), T=XY/Z."""

    X: BaseFelt
    Y: BaseFelt
    Z: BaseFelt
    T: BaseFelt

    # -- constructors ------------------------------------------------------
    @classmethod
    def identity(cls, shape=()):
        shape = (shape,) if isinstance(shape, int) else tuple(shape)
        return cls(
            BaseFelt.zeros(shape), BaseFelt.ones(shape),
            BaseFelt.ones(shape), BaseFelt.zeros(shape),
        )

    @classmethod
    def generator(cls, shape=()):
        shape = (shape,) if isinstance(shape, int) else tuple(shape)
        return cls.from_affine_ints(GEN_X, GEN_Y).broadcast_to(shape)

    @classmethod
    def from_affine(cls, x: BaseFelt, y: BaseFelt):
        return cls(x, y, BaseFelt.ones(x.shape), x * y)

    @classmethod
    def from_affine_ints(cls, x: int, y: int):
        return cls.from_affine(BaseFelt.from_ints(x), BaseFelt.from_ints(y))

    @property
    def shape(self):
        return self.X.shape

    @property
    def size(self):
        return self.X.size

    def broadcast_to(self, shape):
        shape = (shape,) if isinstance(shape, int) else tuple(shape)
        return CurvePoint(*(c.broadcast_to(shape) for c in self._coords()))

    def _coords(self):
        return (self.X, self.Y, self.Z, self.T)

    def __getitem__(self, idx):
        return CurvePoint(*(c[idx] for c in self._coords()))

    def reshape(self, *shape):
        return CurvePoint(*(c.reshape(*shape) for c in self._coords()))

    @classmethod
    def concatenate(cls, items, axis=0):
        return cls(*(BaseFelt.concatenate([it._coords()[i] for it in items], axis)
                     for i in range(4)))

    # -- group law ---------------------------------------------------------
    def __add__(self, other: "CurvePoint") -> "CurvePoint":
        """Complete unified addition (RFC 8032 §5.1.4)."""
        a = (self.Y - self.X) * (other.Y - other.X)
        b = (self.Y + self.X) * (other.Y + other.X)
        c = self.T * _const(ED_2D, self.T.shape) * other.T
        d = self.Z * other.Z
        d = d + d
        e, f, g, h = b - a, d - c, d + c, b + a
        return CurvePoint(e * f, g * h, f * g, e * h)

    def double(self) -> "CurvePoint":
        a = self.X.square()
        b = self.Y.square()
        zz = self.Z.square()
        c = zz + zz
        h = a + b
        xy = self.X + self.Y
        e = h - xy.square()
        g = a - b
        f = c + g
        return CurvePoint(e * f, g * h, f * g, e * h)

    def __neg__(self) -> "CurvePoint":
        return CurvePoint(-self.X, self.Y, self.Z, -self.T)

    def __sub__(self, other: "CurvePoint") -> "CurvePoint":
        return self + (-other)

    def select(self, mask, other: "CurvePoint") -> "CurvePoint":
        """Element-wise: mask ? self : other (mask shape = batch shape)."""
        def sel(a: BaseFelt, b: BaseFelt) -> BaseFelt:
            return BaseFelt(jnp.where(mask[None], a.limbs, b.limbs))

        return CurvePoint(*(sel(a, b) for a, b in
                            zip(self._coords(), other._coords())))

    def mul(self, scalar: Scalar) -> "CurvePoint":
        """Variable-base scalar multiplication, batched MSB-first ladder."""
        return _scalar_mul(self, scalar)

    def __mul__(self, scalar: Scalar) -> "CurvePoint":
        return self.mul(scalar)

    __rmul__ = __mul__

    @staticmethod
    def msm(scalars: Scalar, points: "CurvePoint") -> "CurvePoint":
        """Multi-scalar multiplication: sum_i scalars[i] * points[i]
        (`curve.rs:549-584` analog; batched ladder + tree-sum)."""
        prods = _scalar_mul(points, scalars)
        return prods.sum()

    def sum(self, axis=0) -> "CurvePoint":
        """Tree-reduction point sum along a batch axis."""
        pt = self
        n = pt.shape[axis]
        while n > 1:
            half = n // 2
            lo = pt._slice(axis, 0, half)
            hi = pt._slice(axis, half, 2 * half)
            s = lo + hi
            if n % 2:
                s = CurvePoint.concatenate([s, pt._slice(axis, 2 * half, n)], axis)
            pt = s
            n = pt.shape[axis]
        return pt._squeeze(axis)

    def _slice(self, axis, start, stop):
        idx = (slice(None),) * axis + (slice(start, stop),)
        return self[idx]

    def _squeeze(self, axis):
        return CurvePoint(*(type(c)(jnp.squeeze(c.limbs, axis + 1))
                            for c in self._coords()))

    # -- conversion / comparison ------------------------------------------
    def to_affine(self):
        """(x, y) affine coordinates; batched Fermat inversion of Z."""
        zinv = self.Z.inverse()
        return self.X * zinv, self.Y * zinv

    def normalize(self) -> "CurvePoint":
        x, y = self.to_affine()
        return CurvePoint.from_affine(x, y)

    def equals(self, other: "CurvePoint"):
        """Projective equality: X1 Z2 == X2 Z1 and Y1 Z2 == Y2 Z1."""
        return (
            (self.X * other.Z).equals(other.X * self.Z)
            & (self.Y * other.Z).equals(other.Y * self.Z)
        )

    def is_identity(self):
        return self.X.is_zero() & self.Y.equals(self.Z)

    def is_on_curve(self):
        """Projective curve membership + extended-coordinate consistency:
        (Y^2 - X^2) Z^2 == Z^4 + d X^2 Y^2  and  T Z == X Y.

        Points received off the wire MUST pass this (and the subgroup check)
        before use — the reference gets both for free from arkworks
        deserialization (`curve.rs:103-114`); skipping them enables
        invalid-curve / small-subgroup attacks on the MAC key share."""
        xx = self.X.square()
        yy = self.Y.square()
        zz = self.Z.square()
        lhs = (yy - xx) * zz
        rhs = zz.square() + _const(ED_D, self.shape) * xx * yy
        t_ok = (self.T * self.Z).equals(self.X * self.Y)
        return lhs.equals(rhs) & t_ok

    def is_in_prime_subgroup(self):
        """l * P == identity (l = the prime group order): combined with
        `is_on_curve` this is full arkworks-style validation."""
        return _mul_by_order(self).is_identity()

    def compress(self) -> bytes:
        """Ed25519 compressed encoding: 32B LE y with sign bit of x
        (serialization parity with `curve.rs:103-114` compressed ser/de)."""
        x, y = self.to_affine()
        xi = np.array(x.to_ints(), dtype=object)
        yi = np.array(y.to_ints(), dtype=object)
        out = bytearray()
        for xv, yv in zip(xi.reshape(-1), yi.reshape(-1)):
            enc = int(yv) | ((int(xv) & 1) << 255)
            out += enc.to_bytes(32, "little")
        return bytes(out)

    @classmethod
    def decompress(cls, data: bytes) -> "CurvePoint":
        """Inverse of `compress` (host-side; sqrt via p = 5 mod 8 trick)."""
        pts_x, pts_y = [], []
        for off in range(0, len(data), 32):
            enc = int.from_bytes(data[off : off + 32], "little")
            sign = enc >> 255
            y = enc & ((1 << 255) - 1)
            if y >= P:
                raise ValueError("invalid y")
            y2 = y * y % P
            u = (y2 - 1) % P
            v = (ED_D * y2 + 1) % P
            x2 = u * pow(v, -1, P) % P
            x = pow(x2, (P + 3) // 8, P)
            if x * x % P != x2:
                x = x * SQRT_M1 % P
            if x * x % P != x2:
                raise ValueError("not on curve")
            if x & 1 != sign:
                x = (-x) % P
            pts_x.append(x)
            pts_y.append(y)
        return cls.from_affine(
            BaseFelt.from_ints(pts_x), BaseFelt.from_ints(pts_y)
        )

    def __repr__(self):
        return f"CurvePoint(shape={self.shape})"


jax.tree_util.register_pytree_node(
    CurvePoint,
    lambda p: ((p.X, p.Y, p.Z, p.T), None),
    lambda aux, ch: CurvePoint(*ch),
)


@jax.jit
def _scalar_mul(point: CurvePoint, scalar: Scalar) -> CurvePoint:
    """MSB-first double-and-select ladder over the 253-bit scalar."""
    shape = jnp.broadcast_shapes(point.shape, scalar.shape)
    point = point.broadcast_to(shape)
    canon = lb.from_mont(SCALAR_FIELD, scalar.limbs)  # (16, *batch)
    canon = jnp.broadcast_to(
        canon.reshape(canon.shape[:1] + (1,) * (len(shape) - len(scalar.shape)) + canon.shape[1:]),
        (NLIMBS,) + shape,
    )
    nbits = SCALAR_FIELD.modulus.bit_length()  # 253

    def body(i, acc: CurvePoint) -> CurvePoint:
        bit_index = nbits - 1 - i
        limb = jax.lax.dynamic_index_in_dim(canon, bit_index >> 4, axis=0,
                                            keepdims=False)
        bit = (limb >> (bit_index.astype(jnp.uint32) & 15)) & 1
        acc = acc.double()
        added = acc + point
        return added.select(bit == 1, acc)

    acc0 = CurvePoint.identity(shape)
    return jax.lax.fori_loop(0, nbits, body, acc0)


@jax.jit
def _mul_by_order(point: CurvePoint) -> CurvePoint:
    """Multiply by the (public, constant) group order l — the subgroup
    check.  Same ladder as `_scalar_mul` but the bits are the order itself
    (which is not representable as a `Scalar`: l = 0 mod l)."""
    shape = point.shape
    canon = jnp.broadcast_to(
        jnp.asarray(lb.int_to_limbs(SCALAR_FIELD.modulus),
                    jnp.uint32).reshape((NLIMBS,) + (1,) * len(shape)),
        (NLIMBS,) + shape)
    nbits = SCALAR_FIELD.modulus.bit_length()

    def body(i, acc: CurvePoint) -> CurvePoint:
        bit_index = nbits - 1 - i
        limb = jax.lax.dynamic_index_in_dim(canon, bit_index >> 4, axis=0,
                                            keepdims=False)
        bit = (limb >> (bit_index.astype(jnp.uint32) & 15)) & 1
        acc = acc.double()
        added = acc + point
        return added.select(bit == 1, acc)

    return jax.lax.fori_loop(0, nbits, body, CurvePoint.identity(shape))


def hash_to_curve(data: bytes, n: int = 1) -> CurvePoint:
    """Map uniform bytes to curve points (Elligator2, RFC 9380 map for
    curve25519 -> Edwards), analog of `from_uniform_bytes` / SWU hash-to-curve
    at `curve.rs:143-167`.  Host-side (not a hot path)."""
    import hashlib

    pts = []
    for i in range(n):
        ctr = 0
        while True:
            h = hashlib.sha3_512(data + i.to_bytes(4, "little") +
                                 ctr.to_bytes(4, "little")).digest()
            r = int.from_bytes(h, "little") % P
            pt = _elligator2(r)
            if pt is not None:
                pts.append(pt)
                break
            ctr += 1
    xs = BaseFelt.from_ints([p[0] for p in pts])
    ys = BaseFelt.from_ints([p[1] for p in pts])
    # Clear cofactor: multiply by 8.
    pt = CurvePoint.from_affine(xs, ys)
    return pt.double().double().double()


def _elligator2(r: int):
    """Elligator2 map r -> Montgomery curve point -> Edwards (x, y) ints."""
    A = 486662
    # u = -A / (1 + 2 r^2); if u^3 + A u^2 + u is square use u, else -A - u
    rr2 = (2 * r * r) % P
    denom = (1 + rr2) % P
    if denom == 0:
        return None
    u = (-A * pow(denom, -1, P)) % P
    gu = (u * u % P * u + A * u % P * u + u) % P

    def legendre(a):
        return pow(a, (P - 1) // 2, P)

    if legendre(gu) != 1:
        u = (-A - u) % P
        gu = (u * u % P * u + A * u % P * u + u) % P
        if legendre(gu) != 1 and gu != 0:
            return None
    v = pow(gu, (P + 3) // 8, P)
    if v * v % P != gu:
        v = v * SQRT_M1 % P
    if v * v % P != gu:
        return None
    # Montgomery (u, v) -> Edwards: x = sqrt(-486664)*u/v, y = (u-1)/(u+1)
    c = pow((-486664) % P, (P + 3) // 8, P)
    if c * c % P != (-486664) % P:
        c = c * SQRT_M1 % P
    if v == 0 or (u + 1) % P == 0:
        return (0, 1)
    x = c * u % P * pow(v, -1, P) % P
    y = (u - 1) * pow(u + 1, -1, P) % P
    return (x, y)
