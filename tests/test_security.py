"""Security-property tests: CSPRNG defaults, received-point validation,
ZKPoK gating of the MAC-share exchange.

Covers the round-1 advisor findings: deterministic RNG defaults (high),
non-cryptographic secret sampling (medium), missing on-curve/subgroup
validation of wire points (medium), ungated enc(mac_key_share) (medium).
"""

import numpy as np
import pytest

from ark_mpc_tpu.algebra.curve import ED25519_PRIME as P
from ark_mpc_tpu.algebra.curve import SQRT_M1, CurvePoint
from ark_mpc_tpu.fabric.errors import AuthenticationError
from ark_mpc_tpu.utils.csprng import CSPRNG, default_crypto_rng


class TestCSPRNG:
    def test_deterministic_when_seeded(self):
        a = CSPRNG(seed=7).integers(0, 1 << 16, size=(4, 5), dtype=np.uint32)
        b = CSPRNG(seed=7).integers(0, 1 << 16, size=(4, 5), dtype=np.uint32)
        assert a.tolist() == b.tolist()

    def test_unseeded_streams_differ(self):
        assert CSPRNG().bytes(32) != CSPRNG().bytes(32)
        assert default_crypto_rng().bytes(32) != default_crypto_rng().bytes(32)

    def test_ranges(self):
        r = CSPRNG(seed=1)
        v = r.integers(-100, 101, size=(1000,))
        assert v.min() >= -100 and v.max() <= 100
        big = 1 << 200
        w = r.integers(-big, big + 1, size=(50,))
        assert all(-big <= int(x) <= big for x in w)
        assert w.dtype == np.dtype(object)
        bits = r.integers(0, 2, size=(2000,))
        # both values occur (sanity, not a statistical test)
        assert set(np.unique(bits).tolist()) == {0, 1}

    def test_bytes_stream_consistency(self):
        r1, r2 = CSPRNG(seed=b"x"), CSPRNG(seed=b"x")
        assert r1.bytes(10) + r1.bytes(7) == r2.bytes(17)

    def test_default_secret_sampling_is_crypto(self):
        """Library defaults route through CSPRNG (no seeded PCG64)."""
        from ark_mpc_tpu.algebra.scalar import Scalar

        a = Scalar.random((4,))
        b = Scalar.random((4,))
        assert a.to_ints() != b.to_ints()


class TestPointValidation:
    def test_small_order_points_rejected(self):
        # order-2 point (0, -1) and order-4 point (sqrt(-1), 0) are ON the
        # curve but outside the prime-order subgroup
        for x, y in [(0, P - 1), (SQRT_M1, 0)]:
            pt = CurvePoint.from_affine_ints(x, y)
            assert bool(np.asarray(pt.is_on_curve()))
            assert not bool(np.asarray(pt.is_in_prime_subgroup()))

    def test_off_curve_rejected(self):
        pt = CurvePoint.from_affine_ints(2, 3)
        assert not bool(np.asarray(pt.is_on_curve()))

    def test_valid_points_pass(self):
        from ark_mpc_tpu.algebra.scalar import Scalar

        g = CurvePoint.generator((3,))
        ps = g.mul(Scalar.from_ints([1, 2, 12345]))
        assert np.asarray(ps.is_on_curve()).all()
        assert np.asarray(ps.is_in_prime_subgroup()).all()
        ident = CurvePoint.identity((2,))
        assert np.asarray(ident.is_on_curve()).all()
        assert np.asarray(ident.is_in_prime_subgroup()).all()

    def test_wire_ingestion_rejects_invalid(self):
        import jax

        from ark_mpc_tpu.algebra import limbs as lb
        from ark_mpc_tpu.fabric.points import (
            _point_from_wire_checked,
            _wire_arrays,
        )

        # a torsion point smuggled into a wire frame must abort
        bad = CurvePoint.from_affine_ints(0, P - 1)
        xc, yc = _wire_arrays(bad)
        with pytest.raises(AuthenticationError):
            _point_from_wire_checked(CurvePoint, xc, yc)
        good = CurvePoint.generator(())
        xg, yg = _wire_arrays(good)
        out = _point_from_wire_checked(CurvePoint, xg, yg)
        assert bool(np.asarray(out.equals(good)))


def _run_two_party(fn):
    """Lockstep two-party runner over raw transports (the simulator's baton
    pattern, but for offline-phase functions that take a transport)."""
    import threading

    from ark_mpc_tpu.fabric.transport import LockstepTransport

    t0, t1 = LockstepTransport.pair()
    sched = t0._sched
    transports = [t0, t1]
    results, errors = [None, None], [None, None]

    def run(pid):
        failed = False
        try:
            sched.acquire(pid)
            results[pid] = fn(pid, transports[pid])
        except BaseException as e:  # noqa: BLE001
            errors[pid] = e
            failed = True
        finally:
            sched.finish(pid, failed=failed)

    threads = [threading.Thread(target=run, args=(pid,), daemon=True)
               for pid in (0, 1)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    return results, errors


class TestMacShareGating:
    @pytest.mark.slow
    def test_key_exchange_rejects_bad_proof(self):
        """Tampering with the proved MAC-share ciphertext frame must abort
        the key exchange (the advisor's #33 gap: enc(mac_key_share) is now
        ZK-gated like enc(a))."""
        import jax

        from ark_mpc_tpu.offline.bgv.cyclotomic import CyclotomicRing
        from ark_mpc_tpu.offline.errors import KeyExchangeError
        from ark_mpc_tpu.offline.lowgear import triplets_l

        ring = CyclotomicRing(132, n_q_primes=21)

        def party(pid, tr):
            if pid == 0:
                orig = tr.exchange

                def corrupt_exchange(frame):
                    out = bytearray(orig(frame))
                    out[-1] ^= 1  # flip a bit of the peer's proof frame
                    return bytes(out)

                tr.exchange = corrupt_exchange
            return triplets_l.key_exchange_l(
                tr, ring, CSPRNG(seed=pid), jax.random.PRNGKey(pid))

        results, errors = _run_two_party(party)
        assert isinstance(errors[0], KeyExchangeError) or errors[0] is not None
