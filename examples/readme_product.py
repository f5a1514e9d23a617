"""The README flow as a two-process CLI (integration config 1).

Analog of the reference README example (`/root/reference/README.md:24-29`)
and the integration harness entry (`integration/src/main.rs:81-98`): each
party runs its own process, connects over localhost TCP, shares its input,
multiplies, and opens with a MAC check.

    python examples/readme_product.py --party 0 --port 9123 &
    python examples/readme_product.py --party 1 --port 9123

Use --corrupt-mac to simulate a malicious party (the peer must abort with
AuthenticationError).
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--party", type=int, required=True, choices=[0, 1])
    ap.add_argument("--port", type=int, default=9123)
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--a", type=int, default=2, help="party 0's input")
    ap.add_argument("--b", type=int, default=3, help="party 1's input")
    ap.add_argument("--corrupt-mac", action="store_true",
                    help="act maliciously: corrupt our MAC share")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from ark_mpc_tpu import (
        AuthenticationError,
        MpcFabric,
        Scalar,
        ScalarShare,
        TcpTransport,
        TrustedDealerSource,
    )

    transport = TcpTransport(args.party, args.host, args.port)
    fabric = MpcFabric(args.party, transport,
                       TrustedDealerSource(args.party, seed=1234))

    sa = fabric.share_values(
        Scalar.from_ints([args.a]) if args.party == 0 else None, sender=0, n=1
    )
    sb = fabric.share_values(
        Scalar.from_ints([args.b]) if args.party == 1 else None, sender=1, n=1
    )
    product = fabric.mul(sa, sb)
    if args.corrupt_mac:
        product = ScalarShare(product.share, product.mac + Scalar.from_ints(1))
    try:
        opened = fabric.open_authenticated(product)
    except AuthenticationError as e:
        print(f"party {args.party}: ABORT (malicious peer detected): {e}")
        transport.close()
        sys.exit(3)
    print(f"party {args.party}: a*b = {opened.to_ints()[0]} "
          f"(rounds={fabric.n_rounds}, {transport.stats})")
    transport.close()


if __name__ == "__main__":
    main()
