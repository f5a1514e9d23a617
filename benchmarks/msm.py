"""MSM: batched ladder vs scan-based Pippenger, 2^8 .. 2^16 points.

The reference benchmarks MSM via arkworks' chunked Pippenger
(`benches/native_msm.rs:14-31`, serial cutoff `curve.rs:34-39`).  This
records both our implementations so the `MSM_PIPPENGER_CUTOFF` crossover
is a measured number (BASELINE.md "MSM" table).

Run on TPU (default env) or CPU (`env PALLAS_AXON_POOL_IPS=
JAX_PLATFORMS=cpu python benchmarks/msm.py SIZES=8,10`).
"""

import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import numpy as np

from ark_mpc_tpu.algebra.curve import CurvePoint, _msm_pippenger, _scalar_mul
from ark_mpc_tpu.algebra.fields import SCALAR_FIELD
from ark_mpc_tpu.algebra.scalar import Scalar

L = SCALAR_FIELD.modulus
SIZES = [int(s) for s in os.environ.get("SIZES", "8,10,12,14,16").split(",")]
REPS = int(os.environ.get("REPS", "5"))


def ladder_msm(pts, s):
    return _scalar_mul(pts, s).sum()


def pallas_msm(pts, s):
    # the windowed-ladder mega-kernel + tree sum, 1 dispatch
    os.environ["ARK_MSM_FORCE"] = "ladder"
    try:
        return CurvePoint.msm(s, pts)
    finally:
        del os.environ["ARK_MSM_FORCE"]


def bucket_msm(pts, s):
    # the bucketed Pippenger pipeline (ops/msm_kernels.py)
    from ark_mpc_tpu.ops.msm_kernels import msm_bucket_tpu

    return msm_bucket_tpu(pts, s)


@jax.jit
def winsum_msm(pts, s):
    # gather-free Pippenger: per-window VMEM accumulators + Horner epilogue
    from ark_mpc_tpu.ops.curve_kernels import msm_windowsum_pallas

    return msm_windowsum_pallas(pts, s)


def cpu_anchor_msm(n: int) -> float:
    """Build + run the native multicore Pippenger anchor
    (`native/msm_anchor.cpp`, the `benches/native_msm.rs:14-31` stand-in);
    returns measured seconds per MSM of n points, or None."""
    import pathlib
    import subprocess

    src = pathlib.Path(__file__).resolve().parents[1] / "native" / \
        "msm_anchor.cpp"
    exe = "/tmp/ark_mpc_tpu_msm_anchor"
    try:
        subprocess.run(["g++", "-O3", "-march=native", "-funroll-loops",
                        "-o", exe, str(src), "-pthread"], check=True,
                       capture_output=True)
        out = subprocess.run([exe, str(n)], check=True, capture_output=True,
                             text=True).stdout
        import json as _json

        return float(_json.loads(out.strip().splitlines()[-1])["seconds"])
    except Exception as e:  # noqa: BLE001 - bench harness, report and skip
        print(f"cpu msm anchor unavailable: {e}", file=sys.stderr)
        return None


@jax.jit
def pallas_ladder_msm(pts, s):
    # the plain (pre-windowed) pallas ladder, for comparison
    from ark_mpc_tpu.ops.curve_kernels import ladder_pallas, scalar_mul_pallas

    return scalar_mul_pallas(pts, s, block=512, kernel=ladder_pallas).sum()


def bench(fn, *args):
    """Per-call seconds with the per-dispatch tunnel RTT subtracted.

    On the tunneled TPU, block_until_ready is acked optimistically, so
    the session is first flipped to synchronous mode via device_get
    (bench.py methodology) and every timed call is separately sync'd."""
    out = fn(*args)
    jax.device_get(out.X.limbs.ravel()[:1])
    t0 = time.time()
    for _ in range(REPS):
        out = fn(*args)
        jax.device_get(out.X.limbs.ravel()[:1])
    return max((time.time() - t0) / REPS - RTT, 1e-9)


rng = np.random.default_rng(1)
print(f"backend={jax.default_backend()} reps={REPS}", file=sys.stderr)


@jax.jit
def _nop(x):
    return x + 1


_x = jax.numpy.zeros((8,), jax.numpy.uint32)
jax.device_get(_nop(_x))  # compile + flip the tunnel to sync mode
t0 = time.time()
for _ in range(REPS):
    jax.device_get(_nop(_x))
RTT = (time.time() - t0) / REPS
print(f"dispatch RTT baseline: {RTT*1e3:.1f} ms (subtracted below)",
      file=sys.stderr)
# The XLA ladder/pippenger compiles take tens of minutes through the
# remote-compile tunnel at n >= 2^12 — bench them only when asked.
XLA_MAX = int(os.environ.get("XLA_MAX", "10"))  # log2 cap for XLA paths

PALLAS_LADDER = os.environ.get("PALLAS_LADDER", "1") == "1"
BUCKET = os.environ.get("BUCKET", "1") == "1"
WINSUM = os.environ.get("WINSUM", "1") == "1"

print(f"{'n':>8} {'winsum_ms':>10} {'bucket_ms':>10} {'pallas_ms':>10} "
      f"{'plad_ms':>10} {'cpu_ms':>10} {'ladder_ms':>12} "
      f"{'pippenger_ms':>12}", file=sys.stderr)
rows = []
for logn in SIZES:
    n = 1 << logn
    # uniform field elements (the x^4 generator used before is biased:
    # 1/4 of values are 0 mod 256, skewing Pippenger bucket occupancy)
    ks = Scalar.random((n,), rng)
    # distinct points: cheap pseudo-random multiples of G
    pts = CurvePoint.generator((n,)).mul(
        Scalar.from_ints([(7 * i + 3) % L for i in range(1, n + 1)]))
    jax.block_until_ready(pts.X.limbs)
    row = {"n": n}
    if WINSUM:
        tw = bench(winsum_msm, pts, ks)
        row["winsum_ms"] = round(tw * 1e3, 2)
    if BUCKET:
        tb = bench(bucket_msm, pts, ks)
        row["bucket_ms"] = round(tb * 1e3, 2)
    tk = bench(pallas_msm, pts, ks)
    row["pallas_ms"] = round(tk * 1e3, 2)
    if PALLAS_LADDER:
        tpl = bench(pallas_ladder_msm, pts, ks)
        row["pallas_ladder_ms"] = round(tpl * 1e3, 2)
    tc = cpu_anchor_msm(n)
    if tc is not None:
        row["cpu_anchor_ms"] = round(tc * 1e3, 2)
    if logn <= XLA_MAX:
        tl = bench(ladder_msm, pts, ks)
        tp = bench(_msm_pippenger, pts, ks)
        row.update(ladder_ms=round(tl * 1e3, 2),
                   pippenger_ms=round(tp * 1e3, 2))
    rows.append(row)
    print(f"{n:>8} {row.get('winsum_ms', float('nan')):>10} "
          f"{row.get('bucket_ms', float('nan')):>10} {row['pallas_ms']:>10} "
          f"{row.get('pallas_ladder_ms', float('nan')):>10} "
          f"{row.get('cpu_anchor_ms', float('nan')):>10} "
          f"{row.get('ladder_ms', float('nan')):>12} "
          f"{row.get('pippenger_ms', float('nan')):>12}",
          file=sys.stderr)

import json

best = rows[-1]
best_ms = min(v for k, v in best.items() if k.endswith("_ms"))
print(json.dumps({
    "metric": "msm_points_per_sec",
    "value": round(best["n"] / (best_ms / 1e3), 1),
    "unit": "points/s",
    "rows": rows,
}))
