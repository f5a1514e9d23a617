import sys, pathlib, argparse
sys.path.insert(0, "/root/repo")
ap = argparse.ArgumentParser(); ap.add_argument("--party", type=int); ap.add_argument("--port", type=int, default=9801)
args = ap.parse_args()
import numpy as np
from ark_mpc_tpu import LowGear, MpcFabric, OfflineSizingParams, Scalar, TcpTransport
tr = TcpTransport(args.party, "127.0.0.1", args.port, timeout=600)
from ark_mpc_tpu.offline.bgv.bgv_l import default_ring
# DEMO ONLY: the m=132 toy ring keeps this example CPU-runnable in minutes.
# Production callers omit `ring`/`allow_insecure_ring` and get the
# RLWE-secure m=118965 ring by default (OS-entropy secrets either way).
lg = LowGear(args.party, tr, mode="bgv", ring=default_ring(), allow_insecure_ring=True)
lg.run_offline_phase(OfflineSizingParams(num_triples=4, num_inverse_pairs=1,
                                         num_bits=1, num_randomness=2, num_input_masks=2))
online = MpcFabric(args.party, tr, lg.get_offline_result())
sx = online.share_values(Scalar.from_ints([6, 7]) if args.party == 0 else None, sender=0, n=2)
sy = online.share_values(Scalar.from_ints([8, 9]) if args.party == 1 else None, sender=1, n=2)
z = online.open_authenticated(online.mul(sx, sy))
assert z.to_ints() == [48, 63], z.to_ints()
print(f"party {args.party}: dealer-free BGV offline -> online over TCP OK, z = {z.to_ints()}")
tr.close()
