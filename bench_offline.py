"""Offline-phase (dealer-free LowGear) throughput benchmark.

Measures authenticated, sacrificed triples/second end-to-end over the
BGV-over-l pipeline — the analog of timing the reference's
`run_offline_phase` (`offline-phase/src/lowgear/mod.rs:178-190`,
triple batch flow `triplets.rs:30-64`).  Both parties run in-process over
the lockstep transport (the `execute_mock_mpc` harness), so the number is
compute-bound: ciphertext ops + ZK proofs + MAC checks, no real network.

Environment knobs:
  RING=proto|medium|production   ring preset            (default medium)
  BATCHES=N                      slot batches of triples (default 2)
  ZK_SEC=64                      proof soundness rows

Prints ONE JSON line:
  {"metric": "offline_triples_per_sec", "value": ..., "unit":
   "triples/s", ...}
"""

import json
import os
import sys
import time

import numpy as np

RING = os.environ.get("RING", "medium")
BATCHES = int(os.environ.get("BATCHES", "2"))
# long-running bench: key exchange + first-call jit compiles alone can take
# ~15 min at production rings through the remote-compile tunnel
os.environ.setdefault("ARK_MPC_MOCK_TIMEOUT", "14400")

# Persistent XLA compilation cache: compiled executables land on local disk
# keyed by program hash, so repeat runs (and fresh processes) skip the
# remote-compile tunnel entirely — first-compile latency there is minutes
# per program and was the dominant cost of every offline-phase run.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/.cache/ark_mpc_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")


def make_ring():
    from ark_mpc_tpu.offline.bgv.bgv_l import (
        default_ring,
        medium_ring,
        production_ring,
    )

    if RING == "proto":
        return default_ring()
    if RING == "production":
        return production_ring()
    return medium_ring()


def party(fabric):
    from ark_mpc_tpu.offline.lowgear.core import LowGear

    pid = fabric.party_id
    log = (lambda *a: print(f"[p{pid}]", *a, file=sys.stderr, flush=True)) \
        if pid == 0 else (lambda *a: None)

    t0 = time.time()
    ring = make_ring()
    log(f"ring m={ring.m} phi={ring.phi} slots={ring.slots} "
        f"({time.time() - t0:.1f}s build)")

    t0 = time.time()
    lg = LowGear(pid, fabric.transport, mode="bgv", ring=ring,
                 allow_insecure_ring=True,  # bench rings are sized for speed
                 rng=np.random.default_rng(300 + pid))
    setup_s = time.time() - t0
    log(f"key exchange + proofs: {setup_s:.1f}s")

    # warm-up at the MEASURED batch count: jit shapes depend on the
    # per-call U (proof fold, stacked encrypts), so warming at a smaller U
    # would push minutes of tunnel compiles into the timed region
    n_triples = ring.slots * BATCHES
    t0 = time.time()
    lg.generate_triples(n_triples)
    warm = len(lg.prep.triples)
    warm_s = time.time() - t0
    log(f"warm-up call ({warm} triples): {warm_s:.1f}s (compiles)")

    # steady-state triple throughput: BATCHES slot batches through the
    # full Fig.7 pair flow + sacrifice
    t0 = time.time()
    lg.generate_triples(n_triples)
    triples_s = time.time() - t0
    made = len(lg.prep.triples) - warm
    log(f"{made} sacrificed triples in {triples_s:.1f}s "
        f"({made / triples_s:.1f}/s)")

    # the remaining offline inventory (stocking order mirrors
    # `run_offline_phase`: randomness + extra triples feed the derived
    # protocols' Beaver rounds); REST=0 skips it (triples/s headline only)
    rest_s = 0.0
    if os.environ.get("REST", "1") == "1":
        n_inv = n_bits = ring.slots
        t0 = time.time()
        lg.generate_shared_randomness(2 * n_inv + n_bits)
        lg.generate_triples(n_inv + n_bits)
        lg.generate_inverse_tuples(n_inv)
        lg.generate_shared_bits(n_bits)
        lg.generate_input_masks(min(ring.slots, 64))
        rest_s = time.time() - t0
        log(f"randomness/inverse/bits/masks: {rest_s:.1f}s")

    return {
        "setup_s": round(setup_s, 2),
        "warmup_compile_s": round(warm_s, 2),
        "triples": int(made),
        "triples_s": round(triples_s, 2),
        "rest_s": round(rest_s, 2),
    }


def main():
    import jax

    from ark_mpc_tpu.fabric.simulator import execute_mock_mpc

    print(f"backend={jax.default_backend()} ring={RING} batches={BATCHES}",
          file=sys.stderr, flush=True)
    r0, _ = execute_mock_mpc(party)
    tps = r0["triples"] / r0["triples_s"]
    print(json.dumps({
        "metric": "offline_triples_per_sec",
        "value": round(tps, 2),
        "unit": "triples/s",
        "ring": RING,
        "detail": r0,
    }))


if __name__ == "__main__":
    main()
