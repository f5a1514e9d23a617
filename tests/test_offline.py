"""Offline-phase tests: protocols, sacrifice, end-to-end offline -> online
(`offline-phase` tests and `integration/src/lowgear.rs` analogs)."""

import random

import numpy as np
import pytest

from ark_mpc_tpu import MpcFabric, Scalar
from ark_mpc_tpu.algebra.fields import CURVE25519_ORDER as L
from ark_mpc_tpu.fabric.simulator import execute_mock_mpc_dealer
from ark_mpc_tpu.offline.lowgear import protocols
from ark_mpc_tpu.offline.lowgear.core import LowGear
from ark_mpc_tpu.offline.structs import LowGearPrep, OfflineSizingParams

rng = random.Random(41)


def test_public_coin_agreement():
    def prog(fabric):
        return protocols.public_coin_scalars(fabric, 4).to_ints()

    r0, r1 = execute_mock_mpc_dealer(prog)
    assert r0 == r1


def test_open_and_check_macs():
    xs = [rng.randrange(L) for _ in range(6)]

    def prog(fabric):
        sh = fabric.share_values(
            Scalar.from_ints(xs) if fabric.party_id == 0 else None,
            sender=0, n=6)
        return protocols.open_and_check_macs(fabric, sh).to_ints()

    r0, r1 = execute_mock_mpc_dealer(prog)
    assert r0 == xs and r1 == xs


def test_inverse_tuples_protocol():
    def prog(fabric):
        a, a_inv = protocols.generate_inverse_tuples(fabric, 4)
        prod = fabric.mul(a, a_inv)
        return fabric.open_authenticated(prod).to_ints()

    r0, _ = execute_mock_mpc_dealer(prog)
    assert r0 == [1, 1, 1, 1]


def test_shared_bits_protocol():
    def prog(fabric):
        bits = protocols.generate_shared_bits(fabric, 8)
        return fabric.open_authenticated(bits).to_ints()

    r0, r1 = execute_mock_mpc_dealer(prog)
    assert r0 == r1
    assert all(v in (0, 1) for v in r0)


def test_lowgear_end_to_end_and_checkpoint(tmp_path):
    """Offline phase -> (checkpoint to disk) -> online multiplication
    (`integration/src/lowgear.rs:15-51` flow + SURVEY §5 checkpoint)."""
    sizing = OfflineSizingParams(
        num_triples=8, num_inverse_pairs=4, num_bits=4,
        num_randomness=8, num_input_masks=2,
    )
    x, y = rng.randrange(L), rng.randrange(L)

    def prog(fabric):
        # LowGear builds its own generation fabric on the shared transport
        # (its dealer's MAC key must match the material it generates).
        lg = LowGear(fabric.party_id, fabric.transport, rng=fabric.rng)
        lg.run_offline_phase(sizing)
        prep = lg.get_offline_result()

        # checkpoint round-trip (serde parity)
        path = tmp_path / f"prep_{fabric.party_id}.npz"
        prep.save(str(path))
        prep = LowGearPrep.load(str(path))

        # fresh online fabric consuming the offline result
        online = MpcFabric(fabric.party_id, fabric.transport, prep,
                           rng=fabric.rng)
        sx = online.share_values(
            Scalar.from_ints([x, x]) if fabric.party_id == 0 else None,
            sender=0, n=2,
        )
        sy = online.share_values(
            Scalar.from_ints([y, y]) if fabric.party_id == 1 else None,
            sender=1, n=2,
        )
        sz = online.mul(sx, sy)
        inv = online.inverse(sz)
        prod_open = online.open_authenticated(sz).to_ints()
        inv_open = online.open_authenticated(inv).to_ints()
        return prod_open, inv_open

    (p0, i0), (p1, i1) = execute_mock_mpc_dealer(prog)
    want = (x * y) % L
    assert p0 == p1 == [want, want]
    assert i0 == i1 == [pow(want, -1, L)] * 2


def test_sacrifice_detects_bad_triple():
    """A corrupted candidate triple must fail the sacrifice check."""
    from ark_mpc_tpu.algebra.share import ScalarShare
    from ark_mpc_tpu.offline.errors import SacrificeError

    def prog(fabric):
        lg = LowGear(fabric.party_id, fabric.transport, rng=fabric.rng)
        gen_fabric = lg.fabric
        a, b, c, b2, c2 = lg._raw_triple_pairs(4)
        # Simulate a generation-level fault: c is consistently authenticated
        # (MAC checks pass) but c != a*b — exactly what the sacrifice exists
        # to catch. Both parties shift their c share by a public constant via
        # add_public so share AND MAC stay consistent.
        one = Scalar.from_ints(1)
        c = c.add_public(one, gen_fabric.mac_key, fabric.party_id)
        # inline the sacrifice from generate_triples
        r = protocols.public_coin_scalars(gen_fabric, 4)
        rho = protocols.open_and_check_macs(gen_fabric, b.mul_public(r) - b2)
        tau_share = c.mul_public(r) - c2 - a.mul_public(rho)
        tau = protocols.open_and_check_macs(gen_fabric, tau_share)
        if not bool(np.asarray(tau.is_zero()).all()):
            raise SacrificeError("bad triple")
        return True

    with pytest.raises(Exception):
        execute_mock_mpc_dealer(prog)


def test_input_mask_surplus_kept_as_inventory():
    """bgv-mode input masks round up to whole slot-batch chunks; the
    surplus must be KEPT (like triples) so a later small request makes NO
    new BGV exchange (VERDICT r3 item 6; `lowgear/input_masks.rs:15-58`)."""
    import jax

    from ark_mpc_tpu.algebra.share import ScalarShare

    S = 12  # stub ring slot count
    calls: list[int] = []

    class StubTL:
        _STACK_CHUNK = 4

        @staticmethod
        def stack_chunk(ring):
            return 4

        @staticmethod
        def generate_input_masks_l(transport, setup, n, local_first, rng,
                                   jkey):
            calls.append(n)
            n_chunks = max(4, -(-max(1, -(-n // S)) // 4) * 4)
            total = n_chunks * S
            clear = Scalar.random(total, rng)
            zero = Scalar.zeros(total)
            return clear, ScalarShare(clear, clear), ScalarShare(zero, zero)

    lg = object.__new__(LowGear)
    lg.mode = "bgv"
    lg.party_id = 0
    lg.transport = None
    lg.setup = None
    lg.ring = None
    lg.rng = np.random.default_rng(0)
    lg._tl = StubTL
    lg._jkey = jax.random.PRNGKey(0)
    lg.prep = LowGearPrep(mac_key_share=Scalar.from_ints([1]))

    lg.generate_input_masks(5)
    assert calls == [5]
    assert len(lg.prep.my_mask_shares) == 48  # 4 chunks x 12 slots kept

    # second small request: served entirely from the surplus inventory
    lg.generate_input_masks(7)
    assert calls == [5]

    clear, share = lg.prep.next_local_input_mask_batch(7)
    assert clear.size == 7 and share.size == 7

    # a request beyond the remaining inventory generates only the deficit
    lg.generate_input_masks(60)
    assert calls == [5, 60 - 41]
