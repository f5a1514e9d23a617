"""Validate + time `beaver_chain_pallas` on the real TPU.

Correctness: chains K rounds at small n and compares (a) the final
authenticated outputs against the per-round `beaver_mul_step` reference,
and (b) every round's three fold inner products against explicit
Scalar-arithmetic inner products.

Timing: 2^22 x 16 chained rounds; reports auth mults/s for the mega-kernel
alone (the bench adds the MAC-check assembly on top).
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ark_mpc_tpu.algebra import limbs as lb
from ark_mpc_tpu.algebra.fields import SCALAR_FIELD as spec
from ark_mpc_tpu.algebra.scalar import Scalar
from ark_mpc_tpu.algebra.share import ScalarShare
from ark_mpc_tpu.offline.base import TrustedDealerSource
from ark_mpc_tpu.ops.fp_kernels import (
    beaver_chain_pallas,
    fold_columns_reduce,
    mont_mul_pallas,
)
from ark_mpc_tpu.parallel.step import beaver_mul_step


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def setup(n, rng):
    dealer = TrustedDealerSource(0, seed=42)
    key0 = dealer.get_mac_key_share()
    key1 = dealer._mac_key_shares[1]
    x = Scalar.random(n, rng)
    y = Scalar.random(n, rng)
    x0, x1 = dealer._deal(x)
    y0, y1 = dealer._deal(y)
    av, bv = Scalar.random(n, rng), Scalar.random(n, rng)
    a0, a1 = dealer._deal(av)
    b0, b1 = dealer._deal(bv)
    c0, c1 = dealer._deal(av * bv)
    cf = Scalar.random(n, rng)
    return key0, key1, x0, x1, y0, y1, a0, a1, b0, b1, c0, c1, cf


def run_chain(rounds, key0, key1, x0, x1, y0, y1, a0, a1, b0, b1, c0, c1, cf):
    e = (y0 - b0).share + (y1 - b1).share
    ea0 = Scalar(mont_mul_pallas(spec, e.limbs, a0.share.limbs))
    ea1 = Scalar(mont_mul_pallas(spec, e.limbs, a1.share.limbs))
    eam0 = Scalar(mont_mul_pallas(spec, e.limbs, a0.mac.limbs))
    eam1 = Scalar(mont_mul_pallas(spec, e.limbs, a1.mac.limbs))
    k0b = jnp.broadcast_to(key0.limbs.reshape(16, 1), (16, 128))
    k1b = jnp.broadcast_to(key1.limbs.reshape(16, 1), (16, 128))
    return beaver_chain_pallas(
        spec, rounds, x0.share.limbs, x1.share.limbs, e.limbs,
        a0.share.limbs, a1.share.limbs, b0.share.limbs, b1.share.limbs,
        b0.mac.limbs, b1.mac.limbs,
        c0.share.limbs, c1.share.limbs, c0.mac.limbs, c1.mac.limbs,
        ea0.limbs, ea1.limbs, eam0.limbs, eam1.limbs, k0b, k1b, cf.limbs)


def check_correctness():
    n, rounds = 2048, 3
    rng = np.random.default_rng(0)
    key0, key1, x0, x1, y0, y1, a0, a1, b0, b1, c0, c1, cf = setup(n, rng)
    # NOTE: beaver_chain_pallas macs use bm=a.mac etc — see arg order
    xf0_l, xf1_l, fold = run_chain(rounds, key0, key1, x0, x1, y0, y1,
                                   a0, a1, b0, b1, c0, c1, cf)
    # reference: chain with per-round fused steps
    want_v, want_m0, want_m1 = [], [], []
    cx0, cx1 = x0, x1
    for _ in range(rounds):
        d = (cx0 - a0).share + (cx1 - a1).share
        e = (y0 - b0).share + (y1 - b1).share
        z0 = beaver_mul_step(0, cx0, y0, a0, b0, c0, d, e, key0)
        z1 = beaver_mul_step(1, cx1, y1, a1, b1, c1, d, e, key1)
        v = z0.share + z1.share
        want_v.append((cf * v).sum())
        want_m0.append((cf * z0.mac).sum())
        want_m1.append((cf * z1.mac).sum())
        cx0, cx1 = z0, z1

    ok = True
    if not bool(jnp.all(xf0_l == cx0.share.limbs)):
        log("FAIL: xf0 mismatch")
        ok = False
    if not bool(jnp.all(xf1_l == cx1.share.limbs)):
        log("FAIL: xf1 mismatch")
        ok = False
    got = fold_columns_reduce(spec, fold)  # (16, rounds, 3)
    for r in range(rounds):
        for which, want in ((0, want_v[r]), (1, want_m0[r]),
                            (2, want_m1[r])):
            g = Scalar(got[:, r, which]).to_ints()
            w = want.to_ints()
            if g != w:
                log(f"FAIL: fold[{r},{which}] {g} != {w}")
                ok = False
    log("correctness:", "PASS" if ok else "FAIL")
    return ok


def time_chain(n=1 << 22, rounds=16):
    rng = np.random.default_rng(1)
    args = setup(n, rng)
    jax.device_get(args[2].share.limbs[0, 0])  # sync mode
    out = run_chain(rounds, *args)
    jax.block_until_ready(out)
    t0 = time.time()
    reps = 2
    for _ in range(reps):
        out = run_chain(rounds, *args)
        jax.block_until_ready(out)
    dt = (time.time() - t0) / reps
    log(f"chain n={n} rounds={rounds}: {dt*1e3:.1f} ms "
        f"-> {n*rounds/dt/1e6:.1f} M auth mults/s")


if __name__ == "__main__":
    if not check_correctness():
        sys.exit(1)
    time_chain()
