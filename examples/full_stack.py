"""End-to-end two-process demo: LowGear offline phase -> checkpoint ->
online traced circuit + polynomial ops over TCP.

    python examples/full_stack.py --party 1 --port 9600 &
    python examples/full_stack.py --party 0 --port 9600
"""

import argparse
import pathlib
import sys
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--party", type=int, required=True, choices=[0, 1])
    ap.add_argument("--port", type=int, default=9600)
    ap.add_argument("--host", default="127.0.0.1")
    args = ap.parse_args()

    from ark_mpc_tpu import MpcFabric, Scalar, TcpTransport
    from ark_mpc_tpu.algebra.fields import CURVE25519_ORDER as L
    from ark_mpc_tpu.algebra.poly import AuthenticatedDensePoly, poly_mul, poly_open
    from ark_mpc_tpu.offline.lowgear.core import LowGear
    from ark_mpc_tpu.offline.structs import LowGearPrep, OfflineSizingParams

    transport = TcpTransport(args.party, args.host, args.port)

    # --- offline phase (real protocols; dealer-backed raw triples) ---
    lg = LowGear(args.party, transport)
    lg.run_offline_phase(OfflineSizingParams(
        num_triples=64, num_inverse_pairs=8, num_bits=8,
        num_randomness=16, num_input_masks=8,
    ))
    path = tempfile.mktemp(suffix=f"_prep{args.party}.npz")
    lg.get_offline_result().save(path)
    prep = LowGearPrep.load(path)
    print(f"party {args.party}: offline phase done "
          f"({len(prep.triples)} triples banked, checkpointed to npz)")

    # --- online: traced circuit over the offline material ---
    fabric = MpcFabric(args.party, transport, prep, collect_stats=True)
    xs = [3, 5, 7, 9]
    ys = [11, 13, 17, 19]
    sx = fabric.share_values(
        Scalar.from_ints(xs) if args.party == 0 else None, sender=0, n=4)
    sy = fabric.share_values(
        Scalar.from_ints(ys) if args.party == 1 else None, sender=1, n=4)

    tr = fabric.tracer()
    x, y = tr.wrap(sx), tr.wrap(sy)
    ip = (x * y).sum()          # inner product
    sq = (x * x - y) * Scalar.from_ints(2)
    o_ip, o_sq = ip.open(), sq.open()
    tr.run()
    want_ip = sum(a * b for a, b in zip(xs, ys)) % L
    want_sq = [(2 * (a * a - b)) % L for a, b in zip(xs, ys)]
    assert o_ip.value.to_ints() == [want_ip], "inner product mismatch"
    assert o_sq.value.to_ints() == want_sq, "traced circuit mismatch"

    # --- polynomial layer: shared poly product ---
    pa = AuthenticatedDensePoly(fabric.share_values(
        Scalar.from_ints([1, 2, 3]) if args.party == 0 else None, sender=0, n=3))
    pb = AuthenticatedDensePoly(fabric.share_values(
        Scalar.from_ints([4, 5]) if args.party == 1 else None, sender=1, n=2))
    prod = poly_open(fabric, poly_mul(fabric, pa, pb))
    assert prod.to_ints() == [4, 13, 22, 15], f"poly mul mismatch: {prod.to_ints()}"

    print(f"party {args.party}: online OK  ip={o_ip.value.to_ints()[0]} "
          f"poly=(1+2x+3x^2)(4+5x) opened correctly")
    print(f"party {args.party}: stats: {fabric.stats.dump(transport.stats)}")
    transport.close()


if __name__ == "__main__":
    main()
