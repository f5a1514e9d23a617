"""BGV plaintext/ciphertext op benchmark — mp-spdz-rs bench parity
(`mp-spdz-rs/benches/{plaintext_ops,plaintext_vec_ops,ciphertext_ops}.rs`).

Times the per-slot-batch primitives the offline phase is built from:
slot encode/decode, encrypt, decrypt, ct+ct, ct+pt, ct*pt, rerandomize
(drowning).  Amortization unit = one slot batch (`ring.slots` field
elements), matching the reference's per-batch accounting.

Env: RING=proto|medium|production (default medium), REPS=5.
"""

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import numpy as np

RING = os.environ.get("RING", "medium")
REPS = int(os.environ.get("REPS", "5"))


def main():
    from ark_mpc_tpu.algebra.scalar import Scalar
    from ark_mpc_tpu.offline.bgv import bgv_l as B

    if RING == "proto":
        ring = B.default_ring()
    elif RING == "production":
        ring = B.production_ring()
    else:
        ring = B.medium_ring()
    print(f"backend={jax.default_backend()} ring={RING} m={ring.m} "
          f"phi={ring.phi} slots={ring.slots}", file=sys.stderr, flush=True)

    rng = np.random.default_rng(11)
    key = jax.random.PRNGKey(12)
    k1, k2, k3 = jax.random.split(key, 3)

    t0 = time.time()
    kp = B.keygen_l(ring, k1)
    print(f"keygen: {time.time() - t0:.2f}s", file=sys.stderr, flush=True)

    slots = Scalar.random(ring.slots, rng)
    results = {}

    def bench(name, fn, sync):
        out = fn()
        jax.block_until_ready(jax.tree_util.tree_leaves(sync(out)))
        t0 = time.time()
        for _ in range(REPS):
            out = fn()
        jax.block_until_ready(jax.tree_util.tree_leaves(sync(out)))
        dt = (time.time() - t0) / REPS
        results[name] = round(dt * 1e3, 2)
        print(f"{name}: {dt*1e3:.2f} ms "
              f"({ring.slots/dt:,.0f} slot-elems/s)",
              file=sys.stderr, flush=True)
        return out

    pt = bench("encode", lambda: B.encode_slots_l(ring, slots),
               lambda o: o.limbs)
    ct = bench("encrypt", lambda: B.encrypt_l(ring, kp.pk_a, kp.pk_b, pt, k2),
               lambda o: (o.c0, o.c1))
    bench("ct_add_ct", lambda: B.add_ct_l(ring, ct, ct),
          lambda o: (o.c0, o.c1))
    bench("ct_add_pt", lambda: B.add_pt_l(ring, ct, pt),
          lambda o: (o.c0, o.c1))
    bench("ct_mul_pt", lambda: B.mul_pt_l(ring, ct, pt),
          lambda o: (o.c0, o.c1))
    bench("rerandomize_drown",
          lambda: B.rerandomize_l(ring, kp.pk_a, kp.pk_b, ct, k3),
          lambda o: (o.c0, o.c1))
    dec = bench("decrypt", lambda: B.decrypt_l(ring, kp.sk, ct),
                lambda o: o.limbs)
    got = bench("decode", lambda: B.decode_slots_l(ring, dec),
                lambda o: o.limbs)
    assert got.to_ints() == slots.to_ints(), "decrypt mismatch"

    total_ms = sum(results.values())
    print(json.dumps({
        "metric": "bgv_slot_elems_per_sec_full_cycle",
        "value": round(ring.slots / (total_ms / 1e3), 1),
        "unit": "elems/s",
        "ring": {"m": ring.m, "phi": ring.phi, "slots": ring.slots},
        "ops_ms": results,
    }))


if __name__ == "__main__":
    main()
