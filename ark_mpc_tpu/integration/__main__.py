"""Integration-registry driver: run every registered two-party test over a
real TCP connection.

    python -m ark_mpc_tpu.integration --party 1 --port 9600 &
    python -m ark_mpc_tpu.integration --party 0 --port 9600

Prints one JSON line {test_name: "ok" | "FAIL: ..."} and exits nonzero if
any test failed.  Reference analog: `integration/src/main.rs:101-224`
(clap CLI + inventory-registered tests over QUIC).
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--party", type=int, required=True, choices=[0, 1])
    ap.add_argument("--port", type=int, default=9600)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--tests", default="",
                    help="comma-separated subset of test names")
    ap.add_argument("--timeout", type=float, default=600.0)
    ap.add_argument("--quiet", action="store_true")
    args = ap.parse_args()

    from ark_mpc_tpu import MpcFabric, TcpTransport, TrustedDealerSource
    from ark_mpc_tpu.integration import run_registry

    log = (lambda *a: None) if args.quiet else (
        lambda *a: print(*a, file=sys.stderr, flush=True))

    transport = TcpTransport(args.party, args.host, args.port,
                             timeout=args.timeout)
    fabric = MpcFabric(args.party, transport,
                       TrustedDealerSource(args.party, seed=2026))
    only = [t for t in args.tests.split(",") if t] or None
    results = run_registry(fabric, only=only, log=log)
    transport.close()

    print(json.dumps(results))
    failed = [k for k, v in results.items() if v != "ok"]
    if failed:
        log(f"party {args.party}: {len(failed)} FAILED: {failed}")
        return 1
    log(f"party {args.party}: all {len(results)} integration tests ok")
    return 0


if __name__ == "__main__":
    sys.exit(main())
