"""Prefix products of shared values.

Analog of `online-phase/src/gadgets.rs:105-148` (Bar-Ilan & Beaver blinded
telescoping products): blind v_i as b_inv[i-1] * v_i * b[i], open the blinded
values, build *public* prefix products, then unblind with b[0] (left) and
b_inv[i] (right).  Two Beaver rounds + one authenticated open round,
independent of n; the public prefix scan runs as a log-depth kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..algebra import limbs as lb
from ..algebra.fields import SCALAR_FIELD
from ..algebra.scalar import Scalar
from ..algebra.share import ScalarShare
from ..fabric.context import MpcFabric


@jax.jit
def _public_prefix_products(values: Scalar) -> Scalar:
    """Inclusive prefix product of public values, Hillis-Steele log-depth scan."""
    x = values.limbs  # (16, n)
    n = x.shape[1]
    shift = 1
    while shift < n:
        shifted = jnp.concatenate(
            [jnp.broadcast_to(jnp.asarray(SCALAR_FIELD.one_mont, jnp.uint32)[:, None], (x.shape[0], shift)),
             x[:, : n - shift]],
            axis=1,
        )
        x = lb.mont_mul(SCALAR_FIELD, x, shifted)
        shift *= 2
    return Scalar(x)


def prefix_product(fabric: MpcFabric, values,
                   defer_check: bool = False):
    """[v_1], ..., [v_n] -> [v_1], [v_1 v_2], ..., [prod v_i].

    Accepts a `TracedShare`: the blinded open flows through the tracer's
    mid-circuit `as_public()` path and the public prefix scan runs at
    flush time, so the gadget fuses with level-mates in a larger circuit.
    """
    from ..fabric.scheduler import TracedShare

    if isinstance(values, TracedShare):
        return _prefix_product_traced(values)
    n = values.size
    flat = values.reshape(n)
    b, b_inv = fabric.random_inverse_pairs(n + 1)

    # blinded_i = b_inv[i-1] * v_i * b[i]  (two Beaver rounds)
    partial = fabric.mul(b_inv[:n], flat)
    blinded = fabric.mul(partial, b[1:])

    blinded_open = fabric.open_authenticated(blinded, defer=defer_check)

    # public prefix products of the blinded openings
    prefixes = _public_prefix_products(blinded_open)

    # unblind: prefix_i * b[0] (left, a share scaled by the public prefix)
    # then one Beaver round with b_inv[i+1] to cancel the right blinder.
    left = ScalarShare(
        b[0].share.broadcast_to((n,)), b[0].mac.broadcast_to((n,))
    ).mul_public(prefixes)
    out = fabric.mul(left, b_inv[1:])
    return out.reshape(*values.shape)


def _prefix_product_traced(values):
    """Traced prefix product: same blinded-open protocol, expressed as
    traced nodes so its rounds fuse with the surrounding circuit and the
    public prefix scan runs on the mid-circuit opened value."""
    tracer = values.tracer
    fabric = tracer.fabric
    assert len(values.shape) == 1, "traced prefix_product expects a 1-D batch"
    n = int(values.shape[0])
    b, b_inv = fabric.random_inverse_pairs(n + 1)

    blinded = (tracer.wrap(b_inv[:n]) * values) * tracer.wrap(b[1:])
    prefixes = blinded.open().as_public().apply(_public_prefix_products)
    left = tracer.wrap(ScalarShare(
        b[0].share.broadcast_to((n,)), b[0].mac.broadcast_to((n,))))
    return (left * prefixes) * tracer.wrap(b_inv[1:])
