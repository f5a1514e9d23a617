"""WIRE-INCLUSIVE online benchmark: two real processes over TCP + TLS 1.3.

The headline bench (bench.py) runs both logical parties on one chip and
measures kernel-level Beaver throughput with the exchange as an on-chip
add.  This benchmark is the `batch_ops` analog the reference actually
ships (`online-phase/benches/batch_ops.rs:20-75`): two OS processes on
localhost, a real `TcpTransport` (TLS 1.3, length-prefixed binary
frames), `rounds` chained batched Beaver multiplications of a 2^20-element
batch, one authenticated open, ONE deferred folded MAC check — timed
INCLUDING all serialization and wire traffic, reporting bytes/messages
from the transport counters.

Default mode runs both parties on CPU: the image exposes a single
tunneled TPU chip and its dispatch path is not safe under two concurrent
client processes (see .claude/skills/verify).

BENCH_WIRE_TPU=1 puts the chip IN the loop: party 0 runs its kernels on
the tunneled TPU while party 1 runs on CPU, and the reported number is
the max-of-parties wall time — the reference's own convention
(`circuit_mul_throughput.rs:11-44`).  Every tunnel readback (including
the MAC-check value readback) lands inside the timed region.  Offline
material comes pre-stocked from the seeded dealer (the reference benches
against `PartyIDBeaverSource` mocks the same way).

Usage:
  python benchmarks/online_wire.py               # both parties CPU
  BENCH_WIRE_TPU=1 python benchmarks/online_wire.py   # party 0 on the chip
  BENCH_WIRE_N=1048576 BENCH_WIRE_ROUNDS=4 python benchmarks/online_wire.py
  python benchmarks/online_wire.py --party 0|1 --port P   # one party

Prints ONE JSON line {"metric": "online_wire_mults_per_sec", ...}.
"""

import argparse
import json
import os
import pathlib
import subprocess
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

N = int(os.environ.get("BENCH_WIRE_N", 1 << 20))
ROUNDS = int(os.environ.get("BENCH_WIRE_ROUNDS", 4))
SEED = 1234


def run_party(party: int, port: int) -> dict:
    import jax

    if os.environ.get("BENCH_WIRE_DEVICE") != "tpu":
        jax.config.update("jax_platforms", "cpu")
    import numpy as np  # noqa: F401

    from ark_mpc_tpu.fabric.context import MpcFabric
    from ark_mpc_tpu.fabric.transport import TcpTransport
    from ark_mpc_tpu.offline.base import TrustedDealerSource

    dealer = TrustedDealerSource(party, seed=SEED)
    # TPU mode: the peer blocks on recv while this party pays tunnel
    # compiles (minutes on first run), so the recv timeout must cover them
    transport = TcpTransport(party, "127.0.0.1", port, timeout=1800,
                             tls=True)
    fabric = MpcFabric(party, transport, dealer, collect_stats=True)
    print(f"[wire p{party}] backend={jax.default_backend()}",
          file=sys.stderr, flush=True)

    # pre-stock inputs + warm the kernels OUTSIDE the timed region
    x = dealer.next_shared_value_batch(N)
    y = dealer.next_shared_value_batch(N)
    z = fabric.mul(x, y)  # warm-up round (compiles kernels, opens wire)
    v = fabric.open_authenticated(z, defer=True)
    fabric.verify_deferred()
    jax.block_until_ready(v.limbs)
    ts = transport.stats
    base = (ts.bytes_sent, ts.bytes_recv, ts.msgs_sent, ts.msgs_recv)

    # barrier, then the timed program: ROUNDS chained muls + 1 open + 1
    # folded deferred MAC check — all wire traffic included
    transport.exchange(b"go")
    t0 = time.time()
    z = x
    for _ in range(ROUNDS):
        z = fabric.mul(z, y)
    opened = fabric.open_authenticated(z, defer=True)
    fabric.verify_deferred()
    jax.block_until_ready(opened.limbs)
    elapsed = time.time() - t0

    cur = (ts.bytes_sent, ts.bytes_recv, ts.msgs_sent, ts.msgs_recv)
    net = dict(zip(("bytes_sent", "bytes_recv", "msgs_sent", "msgs_recv"),
                   (c - b for c, b in zip(cur, base))))
    total = N * ROUNDS
    return {
        "party": party,
        "n": N,
        "rounds": ROUNDS,
        "elapsed_s": round(elapsed, 3),
        "mults_per_sec": round(total / elapsed, 1),
        "backend": jax.default_backend(),
        "net": net,
        "bytes_per_mult": round(net["bytes_sent"] / total, 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--party", type=int, default=None)
    ap.add_argument("--port", type=int, default=9617)
    args = ap.parse_args()

    if args.party is not None:
        res = run_party(args.party, args.port)
        print(json.dumps(res))
        return

    tpu_mode = os.environ.get("BENCH_WIRE_TPU") == "1"
    cpu_env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    if tpu_mode:
        # party 0 on the tunneled chip: drop ONLY cpu-forcing values of the
        # platform vars (a parent like bench.py sets JAX_PLATFORMS=cpu /
        # PALLAS_AXON_POOL_IPS=""); the image's real defaults
        # (JAX_PLATFORMS=axon, PALLAS_AXON_POOL_IPS=127.0.0.1) must
        # SURVIVE — deleting them outright detaches the axon plugin and
        # silently lands party 0 back on CPU
        p0_env = dict(os.environ)
        if p0_env.get("JAX_PLATFORMS", "axon") == "cpu":
            p0_env.pop("JAX_PLATFORMS", None)
        if p0_env.get("PALLAS_AXON_POOL_IPS", "x") == "":
            p0_env.pop("PALLAS_AXON_POOL_IPS", None)
        p0_env["BENCH_WIRE_DEVICE"] = "tpu"
    else:
        p0_env = cpu_env
    here = pathlib.Path(__file__).resolve()
    p1 = subprocess.Popen(
        [sys.executable, "-u", str(here), "--party", "1",
         "--port", str(args.port)],
        env=cpu_env, stdout=subprocess.PIPE, stderr=sys.stderr, text=True)
    time.sleep(1.0)
    p0 = subprocess.run(
        [sys.executable, "-u", str(here), "--party", "0",
         "--port", str(args.port)],
        env=p0_env, stdout=subprocess.PIPE, stderr=sys.stderr, text=True,
        check=True)
    p1.wait(timeout=1800)
    r0 = json.loads(p0.stdout.strip().splitlines()[-1])
    r1 = json.loads(p1.stdout.read().strip().splitlines()[-1])
    # max-of-parties wall time, the reference's convention
    # (`circuit_mul_throughput.rs:11-44`)
    elapsed = max(r0["elapsed_s"], r1["elapsed_s"])
    total = r0["n"] * r0["rounds"]
    print(json.dumps({
        "metric": "online_wire_mults_per_sec",
        "value": round(total / elapsed, 1),
        "unit": "mults/s",
        "n": r0["n"],
        "rounds": r0["rounds"],
        "bytes_per_mult_each_way": r0["bytes_per_mult"],
        "net_party0": r0["net"],
        "party_elapsed_s": {"p0": r0["elapsed_s"], "p1": r1["elapsed_s"]},
        "transport": "tcp+tls1.3 localhost, 2 processes, "
                     + (f"p0={r0['backend']} p1={r1['backend']}"),
    }))


if __name__ == "__main__":
    main()
