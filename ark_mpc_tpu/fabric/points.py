"""Authenticated curve-point protocols.

Analog of `online-phase/src/algebra/curve/authenticated_curve.rs` and the
point halves of `fabric.rs` (share_point `fabric.rs:603-650`): opening with
point MAC checks, Beaver scalar-x-point multiplication via the generator
trick, generator multiplication, and authenticated MSM.  Batch-first: one
open round moves the whole point batch as affine coordinate arrays.

Curve-generic (the reference's `C: CurveGroup`, `lib.rs:75-78`): every
protocol derives the curve class from its operands or from the fabric's
share field (`Scalar -> CurvePoint`, `bn254.Fr -> bn254.G1`).  The jitted
kernels are shared — jax caches per pytree node type, so one `@jax.jit`
serves both curves.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..algebra import limbs as lb
from ..algebra.curve import CurvePoint
from ..algebra.point_share import PointShare, scalar_share_mul_point
from ..algebra.scalar import Scalar
from ..algebra.share import ScalarShare
from . import commitment
from .context import MpcFabric, _combine_open
from .errors import AuthenticationError

# ---------------------------------------------------------------------------
# wire conversion: points travel as canonical affine coordinate limb arrays
# ---------------------------------------------------------------------------


@jax.jit
def _point_to_wire(pt):
    x, y = pt.to_affine()
    return (lb.from_mont(x.spec, x.limbs), lb.from_mont(y.spec, y.limbs))


@functools.partial(jax.jit, static_argnums=0)
def _point_from_wire(curve, xc, yc):
    return curve.from_wire_affine(xc, yc)


def _wire_arrays(pt: CurvePoint):
    xc, yc = _point_to_wire(pt)
    return np.asarray(jax.device_get(xc)), np.asarray(jax.device_get(yc))


@jax.jit
def _points_valid(pt):
    """Full received-point validation: on-curve AND prime-order subgroup
    (what arkworks deserialization enforces in the reference).  Without the
    subgroup check a malicious peer can inject small-order components and
    learn MAC-key-share bits from the revealed d = key*Q in the point MAC
    check; without the curve check, invalid-curve attacks apply."""
    return pt.is_on_curve() & pt.is_in_prime_subgroup()


def _point_from_wire_checked(curve, xc, yc):
    """Build a point batch from received affine coordinates, rejecting any
    invalid or out-of-subgroup point (malicious abort)."""
    pt = _point_from_wire(curve, jnp.asarray(xc), jnp.asarray(yc))
    ok = np.asarray(jax.device_get(_points_valid(pt)))
    if not ok.all():
        raise AuthenticationError(
            "received point failed curve/subgroup validation")
    return pt


def point_bytes_be(pt) -> bytes:
    """Canonical affine (x || y) big-endian bytes per point, vectorized —
    the `ToBytes` role for commitment hashing (`authenticated_curve.rs`
    point commitments hash point bytes)."""
    xc, yc = _point_to_wire(pt)
    xs = np.asarray(jax.device_get(xc)).reshape(lb.NLIMBS, -1)
    ys = np.asarray(jax.device_get(yc)).reshape(lb.NLIMBS, -1)
    xb = xs.astype(">u2")[::-1].T  # (n, 16) most-significant limb first
    yb = ys.astype(">u2")[::-1].T
    return np.concatenate([xb, yb], axis=1).tobytes()


# ---------------------------------------------------------------------------
# fused local kernels
# ---------------------------------------------------------------------------


@jax.jit
def _combine_point_open(mine: CurvePoint, theirs: CurvePoint) -> CurvePoint:
    return mine + theirs


@jax.jit
def _point_mac_check(mac_key: Scalar, opened: CurvePoint,
                     mac: CurvePoint) -> CurvePoint:
    """d = key_share * opened - mac_share (point form)."""
    return opened.mul(mac_key) - mac


@jax.jit
def _point_sum_is_identity(mine: CurvePoint, theirs: CurvePoint):
    return (mine + theirs).is_identity()


# ---------------------------------------------------------------------------
# protocols
# ---------------------------------------------------------------------------


def _fabric_curve(fabric: MpcFabric):
    """Curve class for a fabric: the share field's linked curve
    (`Scalar.curve = CurvePoint`, `Fr.curve = G1`)."""
    return getattr(fabric.field, "curve", CurvePoint)


def share_points(fabric: MpcFabric, points=None, sender: int = 0,
                 n: int | None = None) -> PointShare:
    """Input-share points via scalar masks and the generator trick
    (`fabric.rs:603-650`): sender sends P - mask*G; [P] = [mask]*G + masked."""
    curve = type(points) if points is not None else _fabric_curve(fabric)
    gen = curve.generator
    if fabric.party_id == sender:
        assert points is not None
        n = points.size
        flat = points.reshape(n)
        mask, mask_share = fabric.offline.next_local_input_mask_batch(n)
        masked = flat - gen((n,)).mul(mask)
        fabric.send_arrays(list(_wire_arrays(masked)))
        shape = points.shape
    else:
        assert n is not None
        mask_share = fabric.offline.next_counterparty_input_mask_batch(n)
        xc, yc = fabric.recv_arrays()
        masked = _point_from_wire_checked(curve, xc, yc)
        shape = (n,)
    mask_points = scalar_share_mul_point(mask_share, gen((n,)))
    out = mask_points.add_public(masked, fabric.mac_key, fabric.party_id)
    return out.reshape(*shape)


def share_public_points(fabric: MpcFabric, points) -> PointShare:
    """Both parties know the points; make a valid authenticated sharing."""
    return PointShare.identity(points.shape, curve=type(points)).add_public(
        points, fabric.mac_key, fabric.party_id
    )


def open_points(fabric: MpcFabric, ps: PointShare) -> CurvePoint:
    """Open without MAC check (`authenticated_curve.rs` open_batch analog):
    one exchange of affine share coordinates + one point-add kernel."""
    xa, ya = _wire_arrays(ps.share)
    theirs = fabric._exchange_arrays([xa, ya])
    their_pt = _point_from_wire_checked(ps.curve, theirs[0], theirs[1])
    return _combine_point_open(ps.share, their_pt)


def open_authenticated_points(fabric: MpcFabric, ps: PointShare,
                              defer: bool = False) -> CurvePoint:
    """Open + point MAC check (`authenticated_curve.rs:35-283`): commit to
    the check point's bytes, exchange, verify sum == identity."""
    opened = open_points(fabric, ps)
    d = _point_mac_check(fabric.mac_key, opened, ps.mac)
    flat = d.reshape(d.size)
    if defer:
        fabric._deferred_points.append(flat)
    else:
        run_point_mac_check(fabric, flat)
    return opened


def run_point_mac_check(fabric: MpcFabric, d) -> None:
    blinder = fabric.field.random((), fabric.rng)
    d_bytes = point_bytes_be(d)
    my_comm = commitment.commit_bytes(d_bytes, blinder)

    peer_comm = fabric.exchange_scalars(my_comm)
    xa, ya = _wire_arrays(d)
    theirs = fabric._exchange_arrays([xa, ya])
    peer_blinder = fabric.exchange_scalars(blinder)

    peer_d = _point_from_wire_checked(type(d), theirs[0], theirs[1])
    if not commitment.verify_bytes(point_bytes_be(peer_d), peer_blinder, peer_comm):
        raise AuthenticationError("point MAC check commitment failed")
    ok = np.asarray(jax.device_get(_point_sum_is_identity(d, peer_d)))
    if not ok.all():
        raise AuthenticationError("point MAC check failed")


def verify_deferred_points(fabric: MpcFabric) -> None:
    if not getattr(fabric, "_deferred_points", None):
        return
    ds = fabric._deferred_points
    d = ds[0] if len(ds) == 1 else type(ds[0]).concatenate(ds)
    fabric._deferred_points = []
    run_point_mac_check(fabric, d)


def mul_generator(fabric: MpcFabric, x: ScalarShare) -> PointShare:
    """[x] * G, local (`authenticated_curve.rs:754` batch_mul_generator)."""
    return scalar_share_mul_point(x, _fabric_curve(fabric).generator(x.shape))


def mul_public_point(x: ScalarShare, points: CurvePoint) -> PointShare:
    """[x] * P for public P, local."""
    return scalar_share_mul_point(x, points)


def beaver_mul_points(fabric: MpcFabric, x: ScalarShare,
                      ps: PointShare) -> PointShare:
    """[x * P] via the generator-trick Beaver protocol
    (`authenticated_curve.rs:653-712`): with scalar triple (a,b,c),
    open d = x - a and E = P - b*G; result = d*E + d*[bG] + [a]*E + [c]*G."""
    n = x.size
    xf = x.reshape(n)
    pf = ps.reshape(n)
    a, b, c = fabric.offline.next_triplet_batch(n)
    b_gen = mul_generator(fabric, b)

    # one coalesced round: scalar masks + point masks
    masked_scalar = (xf - a).share
    masked_point = (pf - b_gen).share
    ms = np.asarray(jax.device_get(masked_scalar.limbs))
    xa, ya = _wire_arrays(masked_point)
    theirs = fabric._exchange_arrays([ms, xa, ya])
    d = _combine_open(masked_scalar, fabric.field(jnp.asarray(theirs[0])))
    e_pt = _combine_point_open(
        masked_point, _point_from_wire_checked(ps.curve, theirs[1], theirs[2])
    )

    return _beaver_point_combine(fabric.party_id, a, b_gen, c, d, e_pt,
                                 fabric.mac_key).reshape(*x.shape)


def _beaver_point_combine_body(a: ScalarShare, b_gen: PointShare,
                               c: ScalarShare, d: Scalar, e_pt,
                               mac_key: Scalar, party_is_0: bool):
    # d*[bG] + [a]*E + [c]*G  then add_public(d*E)
    term_db = b_gen.mul_public(d)
    term_ae = scalar_share_mul_point(a, e_pt)
    term_c = scalar_share_mul_point(c, type(e_pt).generator(c.shape))
    res = term_db + term_ae + term_c
    de = e_pt.mul(d)
    share = res.share + de if party_is_0 else res.share
    mac = res.mac + de.mul(mac_key)
    return PointShare(share, mac)


_beaver_point_combine_core = functools.partial(jax.jit, static_argnums=(6,))(
    _beaver_point_combine_body)


def _beaver_point_combine(party_id, a, b_gen, c, d, e_pt, mac_key):
    # On TPU the fused jit = ONE dispatch for the whole combine (the
    # tunnel RTT dominates).  On CPU that same jit inlines ~7 independent
    # 256-step ladders into one XLA graph and compiles for ~3 minutes;
    # composing the already-jitted primitives eagerly instead reuses the
    # single cached ladder compile (~14 s total, shared with every other
    # point op).
    if jax.default_backend() == "tpu":
        return _beaver_point_combine_core(a, b_gen, c, d, e_pt, mac_key,
                                          party_id == 0)
    return _beaver_point_combine_body(a, b_gen, c, d, e_pt, mac_key,
                                      party_id == 0)


def msm_authenticated(fabric: MpcFabric, scalars: ScalarShare,
                      points: PointShare) -> PointShare:
    """Authenticated MSM = batched Beaver muls + tree point sum
    (`authenticated_curve.rs:785-818`)."""
    prods = beaver_mul_points(fabric, scalars, points)
    return prods.sum()


def msm_public_points(scalars: ScalarShare, points: CurvePoint) -> PointShare:
    """MSM with public points — one local kernel, no communication
    (`curve/curve.rs:616-657` msm_authenticated)."""
    return scalar_share_mul_point(scalars, points).sum()
