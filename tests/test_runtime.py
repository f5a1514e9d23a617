"""Runtime robustness: wire codec, transport failure paths, store errors."""

import numpy as np
import pytest

from ark_mpc_tpu import Scalar
from ark_mpc_tpu.algebra.share import ScalarShare
from ark_mpc_tpu.fabric import messages
from ark_mpc_tpu.fabric.simulator import execute_mock_mpc_dealer
from ark_mpc_tpu.offline.structs import LowGearPrep, _Store


def test_codec_roundtrip_all_kinds():
    items = [
        b"raw-bytes\x00\xff",
        np.arange(32, dtype=np.uint32).reshape(4, 8),          # limb16 path
        np.array([1 << 20, 5], dtype=np.uint32),               # u32 path
        np.array([0, 255, 7], dtype=np.uint8),
        np.array([-5, 1 << 40], dtype=np.int64),
    ]
    back = messages.decode_arrays(messages.encode_arrays(items))
    assert back[0] == items[0]
    for got, want in zip(back[1:], items[1:]):
        assert got.dtype == want.dtype and got.tolist() == want.tolist()


def test_peer_death_surfaces_original_error():
    """If one party dies mid-protocol, the peer gets a ConnectionError and
    the simulator surfaces the ROOT-CAUSE exception."""

    class Boom(RuntimeError):
        pass

    def prog(fabric):
        sx = fabric.share_values(
            Scalar.from_ints([1]) if fabric.party_id == 0 else None,
            sender=0, n=1)
        if fabric.party_id == 1:
            raise Boom("party 1 crashed")
        # party 0 now blocks on the peer in the next exchange
        return fabric.open_authenticated(sx)

    with pytest.raises(Boom):
        execute_mock_mpc_dealer(prog)


def test_store_exhaustion_error():
    store = _Store(1)
    store.add(ScalarShare(Scalar.from_ints([1, 2]), Scalar.from_ints([1, 2])))
    store.take(1)
    with pytest.raises(RuntimeError, match="exhausted"):
        store.take(5)


def test_store_split_take_across_batches():
    store = _Store(1)
    store.add(ScalarShare(Scalar.from_ints([1, 2]), Scalar.from_ints([5, 6])))
    store.add(ScalarShare(Scalar.from_ints([3, 4]), Scalar.from_ints([7, 8])))
    first = store.take(3)
    assert first.share.to_ints() == [1, 2, 3]
    rest = store.take(1)
    assert rest.share.to_ints() == [4]
    assert len(store) == 0


def test_lockstep_deadlock_fails_fast():
    """Both parties blocked on recv with empty inboxes is a protocol-order
    bug; it must surface IMMEDIATELY, not after the lockstep timeout (the
    reference's mock network fails fast on drop)."""
    import time

    from ark_mpc_tpu.fabric.simulator import execute_mock_mpc_dealer

    def prog(fabric):
        return fabric.transport.recv()  # nobody ever sends

    t0 = time.time()
    with pytest.raises(ConnectionError, match="deadlock"):
        execute_mock_mpc_dealer(prog)
    assert time.time() - t0 < 30, "deadlock detection took too long"
