"""Dense polynomial algebra, public and authenticated.

Analog of `online-phase/src/algebra/poly/*` (`DensePolynomialResult`
`poly/poly.rs:37-692`, `AuthenticatedDensePoly`
`poly/authenticated_poly.rs:39-575`): evaluation, +, -, x, inverse mod x^t,
and floor division via the reversal transform.

Divergence note (documented, deliberate): the reference multiplies via
radix-2 FFT over the scalar field (`authenticated_poly.rs:320-401`), which
requires high field 2-adicity. Curve25519's scalar field has 2-adicity 2, so
radix-2 NTT does not exist for it; multiplication here is a scan-form
convolution (public x public / public x share, local) and a *polynomial
Beaver triple* for share x share (one open round of 2 masked polynomials,
O(da+db) communication — the poly analog of the matrix-Beaver path). NTT
kernels exist in `ops/ntt.py` for NTT-friendly moduli (the BGV offline
phase's RNS primes) and power the same API there.

Shared polynomials are coefficient ScalarShares; a batch axis is the
coefficient index.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from .fields import SCALAR_FIELD
from . import limbs as lb
from .limbs import NLIMBS
from .scalar import Scalar
from .share import ScalarShare


# ---------------------------------------------------------------------------
# public convolution kernel (lax.scan over lhs coefficients)
# ---------------------------------------------------------------------------


@jax.jit
def _conv_coeffs(a_limbs, b_limbs):
    """Polynomial product coefficients: (16, da+1), (16, db+1) ->
    (16, da+db+1), all Montgomery form."""
    na, nb = a_limbs.shape[1], b_limbs.shape[1]
    out_n = na + nb - 1
    spec = SCALAR_FIELD

    def body(acc, i):
        ai = jax.lax.dynamic_slice_in_dim(a_limbs, i, 1, axis=1)  # (16,1)
        prod = lb.mont_mul(spec, jnp.broadcast_to(ai, b_limbs.shape), b_limbs)
        pad = jnp.zeros((NLIMBS, out_n - nb), jnp.uint32)
        shifted = jnp.concatenate([prod, pad], axis=1)
        shifted = _roll_cols(shifted, i)
        return lb.add(spec, acc, shifted), None

    acc0 = jnp.zeros((NLIMBS, out_n), jnp.uint32)
    acc, _ = jax.lax.scan(body, acc0, jnp.arange(na))
    return acc


def _roll_cols(x, i):
    # columns rolled right by i; top i columns were zero padding so no wrap
    return jnp.roll(x, i, axis=1)


@dataclass
class DensePoly:
    """Public polynomial with Scalar coefficients, low-degree first
    (`poly/poly.rs:37-41`)."""

    coeffs: Scalar

    @property
    def degree(self):
        return self.coeffs.shape[0] - 1

    @classmethod
    def from_ints(cls, ints):
        return cls(Scalar.from_ints(list(ints)))

    def __add__(self, other: "DensePoly"):
        a, b = _align(self.coeffs, other.coeffs)
        return DensePoly(a + b)

    def __sub__(self, other: "DensePoly"):
        a, b = _align(self.coeffs, other.coeffs)
        return DensePoly(a - b)

    def __neg__(self):
        return DensePoly(-self.coeffs)

    def __mul__(self, other):
        if isinstance(other, DensePoly):
            return DensePoly(Scalar(_conv_coeffs(self.coeffs.limbs,
                                                 other.coeffs.limbs)))
        if isinstance(other, Scalar):
            return DensePoly(self.coeffs * other)
        return NotImplemented

    def eval(self, x: Scalar) -> Scalar:
        """Horner evaluation (`poly/poly.rs` eval gate); x may be a batch."""
        n = self.coeffs.shape[0]
        acc = self.coeffs[n - 1].broadcast_to(x.shape)
        for i in range(n - 2, -1, -1):
            acc = acc * x + self.coeffs[i].broadcast_to(x.shape)
        return acc

    def rev(self, n: int | None = None) -> "DensePoly":
        """Coefficient reversal rev_n(f) = x^n f(1/x) (`poly/poly.rs` rev)."""
        n = self.degree if n is None else n
        c = self.extend(n + 1).coeffs
        return DensePoly(Scalar(c.limbs[:, ::-1]))

    def extend(self, n_coeffs: int) -> "DensePoly":
        cur = self.coeffs.shape[0]
        if cur >= n_coeffs:
            return self
        pad = jnp.zeros((NLIMBS, n_coeffs - cur), jnp.uint32)
        return DensePoly(Scalar(jnp.concatenate([self.coeffs.limbs, pad], axis=1)))

    def truncate(self, n_coeffs: int) -> "DensePoly":
        return DensePoly(self.coeffs[:n_coeffs])

    def inverse_mod_t(self, t: int) -> "DensePoly":
        """f^{-1} mod x^t by Newton iteration (role of the extended-Euclid
        gate `poly/mod.rs:39-74`): g <- g(2 - f g) doubling precision.
        Requires f(0) != 0."""
        c0 = self.coeffs[0]
        g = DensePoly(c0.inverse().reshape(1))
        two = DensePoly(Scalar.from_ints([2]))
        prec = 1
        while prec < t:
            prec = min(2 * prec, t)
            fg = (self.truncate(prec) * g).truncate(prec)
            g = (g * (two - fg)).truncate(prec)
        return g

    def __floordiv__(self, other: "DensePoly") -> "DensePoly":
        """Floor division via the reversal transform
        (`poly/poly.rs` div / `authenticated_poly.rs:446-575`)."""
        n, m = self.degree, other.degree
        if n < m:
            return DensePoly(Scalar.zeros(1))
        t = n - m + 1
        rev_f = self.rev(n)
        rev_g = other.rev(m)
        q_rev = (rev_f * rev_g.inverse_mod_t(t)).truncate(t)
        return q_rev.rev(t - 1)

    def to_ints(self):
        return self.coeffs.to_ints()


def _align(a: Scalar, b: Scalar):
    na, nb = a.shape[0], b.shape[0]
    if na == nb:
        return a, b
    n = max(na, nb)

    def pad(x, cur):
        z = jnp.zeros((NLIMBS, n - cur), jnp.uint32)
        return Scalar(jnp.concatenate([x.limbs, z], axis=1))

    return pad(a, na) if na < n else a, pad(b, nb) if nb < n else b


# ---------------------------------------------------------------------------
# authenticated polynomials
# ---------------------------------------------------------------------------


@dataclass
class AuthenticatedDensePoly:
    """Shared polynomial: coefficient ScalarShares
    (`poly/authenticated_poly.rs:39`)."""

    coeffs: ScalarShare

    @property
    def degree(self):
        return self.coeffs.shape[0] - 1

    def __add__(self, other):
        if isinstance(other, AuthenticatedDensePoly):
            sa, sb = _align_shares(self.coeffs, other.coeffs)
            return AuthenticatedDensePoly(sa + sb)
        return NotImplemented

    def __sub__(self, other):
        if isinstance(other, AuthenticatedDensePoly):
            sa, sb = _align_shares(self.coeffs, other.coeffs)
            return AuthenticatedDensePoly(sa - sb)
        return NotImplemented

    def __neg__(self):
        return AuthenticatedDensePoly(-self.coeffs)

    def mul_public(self, other: DensePoly) -> "AuthenticatedDensePoly":
        """Share x public polynomial product — local (linear in the share)."""
        share = _conv_coeffs(self.coeffs.share.limbs, other.coeffs.limbs)
        mac = _conv_coeffs(self.coeffs.mac.limbs, other.coeffs.limbs)
        return AuthenticatedDensePoly(ScalarShare(Scalar(share), Scalar(mac)))

    def scale(self, k: Scalar) -> "AuthenticatedDensePoly":
        return AuthenticatedDensePoly(self.coeffs.mul_public(k))

    def eval(self, x: Scalar) -> ScalarShare:
        """Evaluate at a public point: powers of x are public, so this is a
        local linear combination (`authenticated_poly.rs` eval via
        batch_mul_public powers)."""
        n = self.coeffs.shape[0]
        acc = self.coeffs[n - 1]
        for i in range(n - 2, -1, -1):
            acc = acc.mul_public(x) + self.coeffs[i]
        return acc

    def extend(self, n_coeffs: int) -> "AuthenticatedDensePoly":
        cur = self.coeffs.shape[0]
        if cur >= n_coeffs:
            return self
        z = ScalarShare.zeros(n_coeffs - cur)
        return AuthenticatedDensePoly(ScalarShare.concatenate([self.coeffs, z]))

    def truncate(self, n_coeffs: int) -> "AuthenticatedDensePoly":
        return AuthenticatedDensePoly(self.coeffs[:n_coeffs])

    def rev(self, n: int | None = None) -> "AuthenticatedDensePoly":
        n = self.degree if n is None else n
        c = self.extend(n + 1).coeffs
        return AuthenticatedDensePoly(
            ScalarShare(Scalar(c.share.limbs[:, ::-1]),
                        Scalar(c.mac.limbs[:, ::-1]))
        )


# -- fabric-level protocols (communication) ---------------------------------


def poly_mul(fabric, a: AuthenticatedDensePoly,
             b: AuthenticatedDensePoly) -> AuthenticatedDensePoly:
    """Shared x shared polynomial product via a polynomial Beaver triple:
    one coalesced open of (a - P, b - Q), then local convolutions
    (role of the FFT-based mul `authenticated_poly.rs:320-401`)."""
    da, db = a.degree, b.degree
    try:
        p_sh, q_sh, c_sh = fabric.offline.next_poly_triplet(da, db)
    except NotImplementedError:
        return _poly_mul_beaver_conv(fabric, a, b)
    p = AuthenticatedDensePoly(p_sh)
    q = AuthenticatedDensePoly(q_sh)
    c = AuthenticatedDensePoly(c_sh)
    masked = ScalarShare.concatenate([a.coeffs - p_sh, b.coeffs - q_sh])
    opened = fabric.open(masked)
    d = DensePoly(opened[: da + 1])
    e = DensePoly(opened[da + 1 :])
    res = q.mul_public(d) + p.mul_public(e) + c
    de = d * e
    return AuthenticatedDensePoly(
        fabric.add_public(res.coeffs, de.extend(da + db + 1).coeffs)
    )


def _poly_mul_beaver_conv(fabric, a: AuthenticatedDensePoly,
                          b: AuthenticatedDensePoly) -> AuthenticatedDensePoly:
    """Fallback share x share product from scalar triples: ONE Beaver round
    over all (da+1)(db+1) coefficient pairs, then diagonal sums."""
    na, nb = a.degree + 1, b.degree + 1

    def tile(share: ScalarShare, lhs: bool) -> ScalarShare:
        def t(s: Scalar) -> Scalar:
            if lhs:  # (16, na) -> (16, na, nb)
                rep = jnp.repeat(s.limbs[:, :, None], nb, axis=2)
            else:
                rep = jnp.repeat(s.limbs[:, None, :], na, axis=1)
            return Scalar(rep.reshape(NLIMBS, na * nb))

        return ScalarShare(t(share.share), t(share.mac))

    prod = fabric.mul(tile(a.coeffs, True), tile(b.coeffs, False))
    prod = prod.reshape(na, nb)
    out = ScalarShare.zeros(na + nb - 1)
    for i in range(na):
        row = prod[i]  # (nb,)
        parts = []
        if i:
            parts.append(ScalarShare.zeros(i))
        parts.append(row)
        if na - 1 - i:
            parts.append(ScalarShare.zeros(na - 1 - i))
        out = out + ScalarShare.concatenate(parts)
    return AuthenticatedDensePoly(out)


def poly_open(fabric, a: AuthenticatedDensePoly,
              authenticated: bool = True, defer: bool = False) -> DensePoly:
    """Open all coefficients (`authenticated_poly.rs:116-128`)."""
    if authenticated:
        return DensePoly(fabric.open_authenticated(a.coeffs, defer=defer))
    return DensePoly(fabric.open(a.coeffs))


def poly_inverse_mod_t(fabric, a: AuthenticatedDensePoly, t: int,
                       defer_check: bool = False) -> AuthenticatedDensePoly:
    """[f^{-1} mod x^t] via masked open (`authenticated_poly.rs:446-510`):
    sample shared random poly r, open r*f mod x^t, invert publicly, then
    f^{-1} = r * (r f)^{-1} locally."""
    r_coeffs = fabric.random_shared_scalars(t)
    r = AuthenticatedDensePoly(r_coeffs)
    rf = poly_mul(fabric, r, a.truncate(t) if a.degree >= t else a)
    rf_t = rf.truncate(t)
    rf_open = DensePoly(
        fabric.open_authenticated(rf_t.coeffs, defer=defer_check)
    )
    rf_inv = rf_open.inverse_mod_t(t)
    return r.mul_public(rf_inv).truncate(t)


def poly_div(fabric, f: AuthenticatedDensePoly, g: DensePoly,
             defer_check: bool = False) -> AuthenticatedDensePoly:
    """Floor division of a shared polynomial by a public one via the
    reversal transform (`authenticated_poly.rs:446-575`)."""
    n, m = f.degree, g.degree
    if n < m:
        return AuthenticatedDensePoly(ScalarShare.zeros(1))
    t = n - m + 1
    rev_f = f.rev(n)
    rev_g_inv = g.rev(m).inverse_mod_t(t)
    q_rev = rev_f.mul_public(rev_g_inv).truncate(t)
    return q_rev.rev(t - 1)


def _align_shares(a: ScalarShare, b: ScalarShare):
    na, nb = a.shape[0], b.shape[0]
    if na == nb:
        return a, b
    n = max(na, nb)

    def pad(x: ScalarShare, cur):
        return ScalarShare.concatenate([x, ScalarShare.zeros(n - cur)])

    return (pad(a, na) if na < n else a), (pad(b, nb) if nb < n else b)
