"""Fused protocol-step kernels and their multi-chip sharded forms.

This is the TPU replacement for the reference's executor hot loop
(`fabric/executor/single_threaded.rs:203-373`): instead of popping gates off
a queue, one jitted function evaluates *all* gates between two communication
points for the whole batch.  The flagship step is the authenticated Beaver
multiplication round plus the (deferrable) MAC-check fold:

    masks     d|e = (x - a).share | (y - b).share     -> one wire exchange
    combine   [xy] = de + d[b] + e[a] + [c]           (party-0 add_public)
    check     t    = key*(xy_open) - mac              (per element)
    fold      T    = sum_i r_i * t_i                  (random linear comb.)

Multi-chip (SURVEY §2 parallelism table): share vectors shard over a 1-D
`batch` mesh axis; every step stage is element-wise so XLA inserts **zero**
collectives; only the MAC-check fold reduces — per-chip partial modular sums,
then an integer `psum` of 16-bit limb columns (exact: columns < 2^21 for
<= 32 chips), then one Montgomery reduction of the column vector.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..algebra import limbs as lb
from ..algebra.fields import SCALAR_FIELD
from ..algebra.limbs import NLIMBS
from ..algebra.scalar import Scalar
from ..algebra.share import ScalarShare

# ---------------------------------------------------------------------------
# single-chip fused kernels
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(0,))
def beaver_mul_step(party_id: int, x: ScalarShare, y: ScalarShare,
                    a: ScalarShare, b: ScalarShare, c: ScalarShare,
                    d: Scalar, e: Scalar, mac_key: Scalar) -> ScalarShare:
    """Post-open Beaver combine (one fused kernel for the whole batch)."""
    de = d * e
    res = b.mul_public(d) + a.mul_public(e) + c
    return res.add_public(de, mac_key, party_id)


@jax.jit
def mac_check_fold(mac_key: Scalar, opened: Scalar, mac: Scalar,
                   coeffs: Scalar) -> Scalar:
    """Random-linear-combination MAC-check fold:
    T = sum_i r_i * (key*v_i - mac_i)   (offline `mac_check.rs:14-29` style,
    extended to the online deferred check per SURVEY §7(e))."""
    t = mac_key * opened - mac
    return (t * coeffs).sum()


def flagship_forward(x0: ScalarShare, y0: ScalarShare, a0: ScalarShare,
                     b0: ScalarShare, c0: ScalarShare, d: Scalar, e: Scalar,
                     mac_key0: Scalar, coeffs: Scalar):
    """The single-party fused forward step the driver compile-checks:
    Beaver combine for this party's shares + this party's MAC-check fold
    contribution for the (to-be-opened) product.  Pure & jittable."""
    z0 = beaver_mul_step(0, x0, y0, a0, b0, c0, d, e, mac_key0)
    # the party's share of the opened product (peer's share arrives on the
    # wire in the real protocol; the fold is linear so shares work)
    t0 = mac_check_fold(mac_key0, z0.share, z0.mac, coeffs)
    return z0, t0


# ---------------------------------------------------------------------------
# sharded (multi-chip) step
# ---------------------------------------------------------------------------


def make_mesh(n_devices: int | None = None, axis: str = "batch") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(devs[:n], (axis,))


def batch_sharding(mesh: Mesh, batch_ndim: int = 1) -> NamedSharding:
    """Limb axis replicated, leading batch axis sharded."""
    return NamedSharding(mesh, P(None, "batch", *([None] * (batch_ndim - 1))))


def shard_share(share: ScalarShare, mesh: Mesh) -> ScalarShare:
    sh = batch_sharding(mesh, len(share.shape))
    return ScalarShare(
        Scalar(jax.device_put(share.share.limbs, sh)),
        Scalar(jax.device_put(share.mac.limbs, sh)),
    )


def replicate(x, mesh: Mesh):
    full = NamedSharding(mesh, P(*([None] * x.limbs.ndim)))
    return type(x)(jax.device_put(x.limbs, full))


@functools.partial(jax.jit, static_argnums=(0, 1))
def sharded_mul_mac_step(mesh: Mesh, party_id: int, x, y, a, b, c, d, e,
                         mac_key, coeffs):
    """Full sharded training-step analog: Beaver combine (element-wise; no
    collectives) + MAC-check fold with per-chip partial sums reduced by an
    integer limb-column `psum` and one final Montgomery reduction."""
    z = beaver_mul_step(party_id, x, y, a, b, c, d, e, mac_key)

    spec = SCALAR_FIELD

    def local_fold(z_share, z_mac, key_l, coeff_l):
        key_b = jnp.broadcast_to(key_l, z_share.shape)
        t = lb.sub(spec, lb.mont_mul(spec, key_b, z_share), z_mac)
        r = lb.mont_mul(spec, t, coeff_l)
        # per-chip modular tree sum -> (16, 1)
        part = Scalar(r).sum().limbs.reshape(NLIMBS, 1)
        # integer psum of 16-bit limb columns: exact while n_chips <= 2^5
        tot = jax.lax.psum(part, "batch")
        return tot

    folded_cols = _shard_map(
        local_fold,
        mesh=mesh,
        in_specs=(P(None, "batch"), P(None, "batch"), P(None, None),
                  P(None, "batch")),
        out_specs=P(None, None),
    )(z.share.limbs, z.mac.limbs,
      jnp.broadcast_to(mac_key.limbs.reshape(NLIMBS, 1), (NLIMBS, 1)),
      coeffs.limbs)
    # Columns are integer sums of Montgomery-form limbs (< n_chips * 2^16
    # each); reducing the column vector mod m yields the Montgomery encoding
    # of the modular sum directly (Montgomery form is linear mod m).
    folded = Scalar(lb.reduce_wide(spec, folded_cols).reshape(NLIMBS))
    return z, folded


@functools.partial(jax.jit, static_argnums=(0,))
def sharded_rlc_fold(mesh: Mesh, t_limbs, coeff_limbs) -> Scalar:
    """sum_i coeff_i * t_i over a batch-sharded (16, n) limb array: per-chip
    modular partial sums, ONE integer `psum` of 16-bit limb columns (exact
    for <= 2^16 chips), one Montgomery reduction.  The fabric's deferred
    MAC check runs its random-linear-combination fold through this when a
    mesh is attached (VERDICT round-1 item 4)."""
    spec = SCALAR_FIELD

    def local(t, cf):
        r = lb.mont_mul(spec, t, cf)
        part = Scalar(r).sum().limbs.reshape(NLIMBS, 1)
        return jax.lax.psum(part, "batch")

    cols = _shard_map(
        local, mesh=mesh,
        in_specs=(P(None, "batch"), P(None, "batch")),
        out_specs=P(None, None),
    )(t_limbs, coeff_limbs)
    return Scalar(lb.reduce_wide(spec, cols).reshape(NLIMBS))


def _shard_map(f, mesh, in_specs, out_specs):
    # check_vma=False: the scan-form limb kernels build unvarying carry
    # inits inside the mapped function; the varying-axis inference check
    # rejects that even though the computation is correct per-shard.
    if hasattr(jax, "shard_map"):
        sm = jax.shard_map
    else:
        from jax.experimental.shard_map import shard_map as sm
    try:
        return sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                  check_vma=False)
    except TypeError:
        return sm(f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
                  check_rep=False)
