"""Headline benchmark: authenticated Beaver multiplication throughput.

Measures the BASELINE.json north-star config: 2^24 authenticated Beaver
multiplications (2^20-element batches x 16 rounds), batch-verified with ONE
MAC check, on the available TPU chip.  Both logical parties' online compute
runs on this single chip (a real deployment gives each party its own
chips), so the reported mults/sec/chip is conservative by ~2x.

The CPU anchor: ark-mpc publishes no numbers (BASELINE.md) and this image has
no Rust toolchain to run its criterion benches, so `vs_baseline` uses an
assumed 1e6 authenticated mults/sec for CPU ark-mpc — a generous estimate for
its per-gate futures fabric (`circuit_mul_throughput` / `batch_ops` measure
per-gate scheduling + JSON-serialized QUIC rounds).  Replace with a measured
anchor when a Rust toolchain is available.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import jax
import numpy as np

CPU_ANCHOR_MULTS_PER_SEC = 1e6


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    # 2^17 x 128 rounds = 2^24 total. Batches beyond ~2^18 OOM the 16 GB
    # HBM today because the unrolled limb convolution materializes
    # (16,16,n) uint32 temps (~1 GB each at 2^20) across the fused Beaver
    # graph; the planned Pallas tiling removes this ceiling.
    n = int(os.environ.get("BENCH_N", 1 << 17))
    rounds = int(os.environ.get("BENCH_ROUNDS", 128))

    from ark_mpc_tpu.algebra.scalar import Scalar
    from ark_mpc_tpu.fabric import commitment
    from ark_mpc_tpu.offline.base import TrustedDealerSource
    from ark_mpc_tpu.parallel.step import beaver_mul_step, mac_check_fold

    log(f"devices: {jax.devices()}  n={n} rounds={rounds}")

    # --- offline material (dealer; excluded from timing like the reference's
    # mock-beaver benches `circuit_mul_throughput.rs:11-44`) ---
    t0 = time.time()
    rng = np.random.default_rng(0)
    dealer = TrustedDealerSource(0, seed=42)
    key0 = dealer.get_mac_key_share()
    key1 = dealer._mac_key_shares[1]

    x = Scalar.random(n, rng)
    y = Scalar.random(n, rng)
    x0, x1 = dealer._deal(x)
    y0, y1 = dealer._deal(y)
    av = Scalar.random(n, rng)
    bv = Scalar.random(n, rng)
    a0, a1 = dealer._deal(av)
    b0, b1 = dealer._deal(bv)
    c0, c1 = dealer._deal(av * bv)
    coeffs = Scalar.random(n, rng)
    jax.block_until_ready((x0.share.limbs, c1.mac.limbs))
    log(f"offline dealer setup: {time.time()-t0:.1f}s")

    # --- fused two-party online round ---
    @jax.jit
    def both_parties_round(x0, x1, y0, y1, a0, b0, c0, a1, b1, c1,
                           key0, key1, coeffs, acc0, acc1):
        # mask + "exchange" (the wire is an on-chip add in this 1-chip bench)
        d = (x0 - a0).share + (x1 - a1).share
        e = (y0 - b0).share + (y1 - b1).share
        z0 = beaver_mul_step(0, x0, y0, a0, b0, c0, d, e, key0)
        z1 = beaver_mul_step(1, x1, y1, a1, b1, c1, d, e, key1)
        # open the product + deferred MAC-check fold contribution
        v = z0.share + z1.share
        t0 = mac_check_fold(key0, v, z0.mac, coeffs)
        t1 = mac_check_fold(key1, v, z1.mac, coeffs)
        return acc0 + t0, acc1 + t1, v

    rng0 = np.random.default_rng(7)

    def mac_check(acc0, acc1):
        """ONE commit-reveal MAC check for the whole program
        (`authenticated_scalar.rs:222-275` round structure over the
        random-linear-combination fold)."""
        blinder0, blinder1 = Scalar.random((), rng0), Scalar.random((), rng0)
        comm0 = commitment.commit(acc0, blinder0)
        comm1 = commitment.commit(acc1, blinder1)
        assert commitment.verify(acc0, blinder0, comm0)
        assert commitment.verify(acc1, blinder1, comm1)
        s = acc0 + acc1
        return bool(np.asarray(jax.device_get(s.is_zero())))

    acc0, acc1 = Scalar.zeros(()), Scalar.zeros(())
    # warmup / compile of the full round AND the check path
    w0, w1, v = both_parties_round(x0, x1, y0, y1, a0, b0, c0, a1, b1, c1,
                                   key0, key1, coeffs, acc0, acc1)
    jax.block_until_ready((w0.limbs, w1.limbs, v.limbs))
    assert mac_check(w0, w1), "warmup MAC check failed — correctness bug"
    log("compiled; warmup MAC check OK")

    t0 = time.time()
    for _ in range(rounds):
        acc0, acc1, v = both_parties_round(x0, x1, y0, y1, a0, b0, c0,
                                           a1, b1, c1, key0, key1, coeffs,
                                           acc0, acc1)
    jax.block_until_ready((acc0.limbs, acc1.limbs, v.limbs))
    elapsed = time.time() - t0

    t_check = time.time()
    ok = mac_check(acc0, acc1)
    check_time = time.time() - t_check
    if not ok:
        log("FATAL: MAC check failed — correctness bug")
        sys.exit(1)
    log(f"MAC check (1 for {n*rounds} mults): OK in {check_time:.3f}s")

    total = n * rounds
    mults_per_sec = total / (elapsed + check_time)
    log(f"online: {total} auth mults in {elapsed:.3f}s + check {check_time:.3f}s")
    print(json.dumps({
        "metric": "authenticated_beaver_mults_per_sec_per_chip",
        "value": round(mults_per_sec, 1),
        "unit": "mults/s",
        "vs_baseline": round(mults_per_sec / CPU_ANCHOR_MULTS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
