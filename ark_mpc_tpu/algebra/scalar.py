"""User-facing field-element arrays.

TPU-native analog of the reference `Scalar<C>` wrapper
(`online-phase/src/algebra/scalar/scalar.rs:43-372`): arithmetic operators,
random sampling, inversion, pow, byte/int conversion — but over *batches*: a
`Scalar` holds an arbitrary batch shape of field elements as one limb array,
so that "batch APIs" are the default representation (SURVEY.md §7 design
inversion) rather than a bolt-on.

Internally values are 16x16-bit limbs in Montgomery form, shape
``(16, *batch)`` uint32 (see `limbs.py`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import limbs as lb
from .fields import BASE_FIELD, SCALAR_FIELD
from .limbs import NLIMBS


class FieldArray:
    """An array of elements of one prime field (Montgomery-form limbs)."""

    spec = None  # set by subclass

    __array_priority__ = 1000  # win against numpy operator dispatch

    def __init__(self, limbs):
        self.limbs = limbs  # (16, *batch) uint32, Montgomery form

    # -- construction ------------------------------------------------------
    @classmethod
    def from_ints(cls, values):
        if isinstance(values, (int, np.integer)):
            arr = lb.pack_ints(cls.spec, [int(values)])
            return cls(arr.reshape(NLIMBS))
        vals = np.asarray(values, dtype=object)
        flat = [int(v) for v in vals.reshape(-1)]
        packed = lb.pack_ints(cls.spec, flat)
        return cls(packed.reshape((NLIMBS,) + vals.shape))

    @classmethod
    def zeros(cls, shape=()):
        shape = (shape,) if isinstance(shape, int) else tuple(shape)
        return cls(jnp.zeros((NLIMBS,) + shape, jnp.uint32))

    @classmethod
    def ones(cls, shape=()):
        shape = (shape,) if isinstance(shape, int) else tuple(shape)
        one = jnp.asarray(cls.spec.one_mont, jnp.uint32)
        return cls(jnp.broadcast_to(one.reshape((NLIMBS,) + (1,) * len(shape)),
                                    (NLIMBS,) + shape))

    @classmethod
    def random(cls, shape=(), rng: np.random.Generator | None = None):
        """Uniform field elements (negligible bias via 448-bit reduction).

        Host-side RNG: used for protocol blinders/masks where the sampling
        itself is not hot.  Defaults to an OS-entropy CSPRNG (`utils.csprng`)
        — these values are protocol secrets; a recoverable PRNG breaks
        commitment hiding and coin unpredictability.  Tests may pass a
        seeded generator explicitly.
        """
        shape = (shape,) if isinstance(shape, int) else tuple(shape)
        if rng is None:
            from ..utils.csprng import default_crypto_rng

            rng = default_crypto_rng()
        n = int(np.prod(shape)) if shape else 1
        wide = np.zeros((32, n), dtype=np.uint32)
        raw = rng.integers(0, 1 << 16, size=(28, n), dtype=np.uint32)
        wide[:28] = raw
        canon = lb.reduce_wide(cls.spec, jnp.asarray(wide))
        mont = lb.to_mont(cls.spec, canon)
        return cls(mont.reshape((NLIMBS,) + shape))

    # -- shape -------------------------------------------------------------
    @property
    def shape(self):
        return self.limbs.shape[1:]

    @property
    def size(self):
        return int(np.prod(self.shape)) if self.shape else 1

    def reshape(self, *shape):
        if len(shape) == 1 and isinstance(shape[0], (tuple, list)):
            shape = tuple(shape[0])
        return type(self)(self.limbs.reshape((NLIMBS,) + shape))

    def __getitem__(self, idx):
        if not isinstance(idx, tuple):
            idx = (idx,)
        return type(self)(self.limbs[(slice(None),) + idx])

    @classmethod
    def concatenate(cls, items, axis=0):
        return cls(jnp.concatenate([it.limbs for it in items], axis=axis + 1))

    def broadcast_to(self, shape):
        shape = (shape,) if isinstance(shape, int) else tuple(shape)
        return type(self)(jnp.broadcast_to(
            self.limbs.reshape(self.limbs.shape[:1] + (1,) * (len(shape) - len(self.shape)) + self.limbs.shape[1:]),
            (NLIMBS,) + shape))

    # -- arithmetic --------------------------------------------------------
    def _coerce(self, other):
        if isinstance(other, FieldArray):
            if type(other) is not type(self):
                raise TypeError("mixed fields")
            return other
        if isinstance(other, (int, np.integer)):
            return type(self).from_ints(int(other))
        return NotImplemented

    def _bin(self, other, fn):
        other = self._coerce(other)
        if other is NotImplemented:
            return NotImplemented
        a, b = self.limbs, other.limbs
        if a.shape != b.shape:
            a, b = _broadcast_limbs(a, b)
        return type(self)(fn(self.spec, a, b))

    def __add__(self, other):
        return self._bin(other, lb.add)

    __radd__ = __add__

    def __sub__(self, other):
        return self._bin(other, lb.sub)

    def __rsub__(self, other):
        return (-self) + other

    def __mul__(self, other):
        return self._bin(other, lb.mont_mul)

    __rmul__ = __mul__

    def __neg__(self):
        return type(self)(lb.neg(self.spec, self.limbs))

    def __truediv__(self, other):
        other = self._coerce(other)
        return self * other.inverse()

    def inverse(self):
        """Multiplicative inverse (0 -> 0); Fermat pow, fully batched."""
        return type(self)(lb.inverse(self.spec, self.limbs))

    def pow(self, e: int):
        """Fixed public exponent (recursive-squaring analog of
        `authenticated_scalar.rs:84-100` for public values)."""
        e = int(e)
        if e == 0:
            return type(self).ones(self.shape)
        bits = tuple((e >> i) & 1 for i in range(e.bit_length()))
        return type(self)(lb.mont_pow_fixed(self.spec, self.limbs, bits))

    def square(self):
        return self * self

    def sqrt(self):
        """Square roots (host-side Tonelli-Shanks; `scalar.rs` sqrt parity).

        Returns (roots, is_square): the canonical (smaller) root where one
        exists, 0 elsewhere, plus a numpy bool mask of which elements are
        quadratic residues.
        """
        p = self.spec.modulus
        vals = self.to_ints()
        roots, mask = [], []
        for v in vals:
            if v == 0:
                roots.append(0)
                mask.append(True)
                continue
            if pow(v, (p - 1) // 2, p) != 1:
                roots.append(0)
                mask.append(False)
                continue
            r = _tonelli_shanks(v, p)
            roots.append(min(r, p - r))
            mask.append(True)
        out = type(self).from_ints(roots).reshape(*self.shape)
        mask_arr = (np.array(mask).reshape(self.shape) if self.shape
                    else np.bool_(mask[0]))
        return out, mask_arr

    def matmul(self, other: "FieldArray") -> "FieldArray":
        """Field matrix product (m,k) @ (k,n) on the MXU (ops/matmul.py)."""
        other = self._coerce(other)
        from ..ops.matmul import mont_matmul

        return type(self)(mont_matmul(self.spec, self.limbs, other.limbs))

    def __matmul__(self, other):
        return self.matmul(other)

    def sum(self, axis=0):
        """Tree-reduction sum along a batch axis (log-depth modular adds)."""
        x = self.limbs
        ax = axis + 1
        n = x.shape[ax]
        while n > 1:
            half = n // 2
            lo = jax.lax.slice_in_dim(x, 0, half, axis=ax)
            hi = jax.lax.slice_in_dim(x, half, 2 * half, axis=ax)
            s = lb.add(self.spec, lo, hi)
            if n % 2:
                rest = jax.lax.slice_in_dim(x, 2 * half, n, axis=ax)
                s = jnp.concatenate([s, rest], axis=ax)
            x = s
            n = x.shape[ax]
        return type(self)(jnp.squeeze(x, axis=ax))

    # -- comparison / export ----------------------------------------------
    def equals(self, other):
        other = self._coerce(other)
        a, b = self.limbs, other.limbs
        if a.shape != b.shape:
            a, b = _broadcast_limbs(a, b)
        return lb.eq(a, b)

    def is_zero(self):
        return lb.is_zero(self.spec, self.limbs)

    def to_ints(self):
        return lb.unpack_ints(self.spec, self.limbs.reshape(NLIMBS, -1))

    def to_int(self):
        assert self.size == 1
        return self.to_ints()[0]

    def canonical_limbs(self):
        """Canonical (non-Montgomery) limb array, for hashing/serialization."""
        return lb.from_mont(self.spec, self.limbs)

    def to_bytes_be(self) -> bytes:
        """Canonical big-endian 32-byte encoding per element (flat batch order).

        Matches the role of `Scalar::to_bytes_be` in the reference commitment
        scheme (`commitment.rs:19-89`).
        """
        canon = np.asarray(jax.device_get(self.canonical_limbs())).reshape(NLIMBS, -1)
        # (n, 16) with the most-significant limb first, each limb 2 bytes BE
        return canon.astype(">u2")[::-1].T.tobytes()

    @classmethod
    def from_be_bytes_mod_order(cls, data: bytes):
        """Hash-output -> field element, reducing a 32-byte BE value mod m
        (`Scalar::from_be_bytes_mod_order` analog)."""
        v = int.from_bytes(data, "big")
        return cls.from_ints(v % cls.spec.modulus)

    def to_bytes_le(self) -> bytes:
        """Canonical little-endian 32-byte encoding per element
        (`Scalar::to_bytes` / dalek convention)."""
        canon = np.asarray(jax.device_get(self.canonical_limbs())).reshape(NLIMBS, -1)
        return canon.astype("<u2").T.tobytes()

    @classmethod
    def from_bytes_le(cls, data: bytes):
        """Inverse of `to_bytes_le` (batch: concatenated 32-byte chunks);
        values must be canonical (< modulus)."""
        vals = []
        for off in range(0, len(data), 32):
            v = int.from_bytes(data[off : off + 32], "little")
            if v >= cls.spec.modulus:
                raise ValueError("non-canonical encoding")
            vals.append(v)
        return cls.from_ints(vals)

    # -- biguint / radix-string conversions (`scalar.rs:109-139` to/from
    # BigUint and radix strings) -- Python ints ARE arbitrary precision, so
    # these are thin canonical wrappers over to_ints/from_ints.

    def to_biguint(self) -> int:
        """Canonical integer value (single element)."""
        return self.to_int()

    @classmethod
    def from_biguint(cls, v: int):
        """Integer (any size) reduced mod the field order."""
        return cls.from_ints(int(v) % cls.spec.modulus)

    @classmethod
    def from_radix_string(cls, s: str, radix: int = 10):
        """Parse a radix-`radix` string (2..36) and reduce mod the order
        (`Scalar::from_radix_string` analog)."""
        return cls.from_biguint(int(s.strip(), radix))

    def to_radix_string(self, radix: int = 10) -> str:
        v = self.to_biguint()
        if radix == 10:
            return str(v)
        if radix == 16:
            return format(v, "x")
        if radix == 2:
            return format(v, "b")
        digits = "0123456789abcdefghijklmnopqrstuvwxyz"
        if not 2 <= radix <= 36:
            raise ValueError("radix must be in [2, 36]")
        out = []
        while True:
            v, r = divmod(v, radix)
            out.append(digits[r])
            if v == 0:
                return "".join(reversed(out))

    def __repr__(self):
        if self.size <= 4:
            return f"{type(self).__name__}({self.to_ints()})"
        return f"{type(self).__name__}(shape={self.shape})"


def _tonelli_shanks(v: int, p: int) -> int:
    """Square root of a known QR mod odd prime p."""
    q, s = p - 1, 0
    while q % 2 == 0:
        q //= 2
        s += 1
    z = 2
    while pow(z, (p - 1) // 2, p) != p - 1:
        z += 1
    c = pow(z, q, p)
    t = pow(v, q, p)
    r = pow(v, (q + 1) // 2, p)
    m = s
    while t != 1:
        i, tt = 0, t
        while tt != 1:
            tt = tt * tt % p
            i += 1
        b = pow(c, 1 << (m - i - 1), p)
        r = r * b % p
        c = b * b % p
        t = t * c % p
        m = i
    return r


def _broadcast_limbs(a, b):
    shape = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    full = (NLIMBS,) + shape

    def expand(x):
        x = x.reshape(x.shape[:1] + (1,) * (len(shape) - (x.ndim - 1)) + x.shape[1:])
        return jnp.broadcast_to(x, full)

    return expand(a), expand(b)


class Scalar(FieldArray):
    """Element(s) of the Curve25519 scalar field (SPDZ value field)."""

    spec = SCALAR_FIELD


class BaseFelt(FieldArray):
    """Element(s) of GF(2^255 - 19), the Ed25519 coordinate field."""

    spec = BASE_FIELD


def _register(cls):
    jax.tree_util.register_pytree_node(
        cls,
        lambda s: ((s.limbs,), None),
        lambda aux, children: cls(children[0]),
    )


_register(Scalar)
_register(BaseFelt)
