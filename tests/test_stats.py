"""Observability counters (`test_stats.rs` analog: exercise the dump)."""

import json

from ark_mpc_tpu import Scalar
from ark_mpc_tpu.fabric.simulator import execute_mock_mpc_dealer
from ark_mpc_tpu.offline.base import TrustedDealerSource


def test_fabric_stats_dump():
    def prog(fabric):
        # rebuild with stats enabled on the same transport
        from ark_mpc_tpu import MpcFabric

        fab = MpcFabric(fabric.party_id, fabric.transport,
                        TrustedDealerSource(fabric.party_id, seed=7),
                        rng=fabric.rng, collect_stats=True)
        sx = fab.share_values(
            Scalar.from_ints([3, 4]) if fab.party_id == 0 else None,
            sender=0, n=2)
        sq = fab.mul(sx, sx)
        fab.open_authenticated(sq)
        assert fab.num_ops() >= 3  # num_gates analog (`fabric.rs:480-484`)
        return fab.stats.snapshot(fab.transport.stats)

    s0, s1 = execute_mock_mpc_dealer(prog)
    for s in (s0, s1):
        assert s["ops"]["beaver_mul"]["calls"] == 1
        assert s["ops"]["beaver_mul"]["elements"] == 2
        assert s["ops"]["open"]["calls"] == 1  # the authenticated open
        # (the Beaver mask exchange is timed under beaver_mul itself)
        assert s["ops"]["mac_check"]["calls"] == 1
        assert s["rounds"] >= 5
        assert s["network"]["bytes_sent"] > 0
        # dump is valid json
        json.loads(json.dumps(s))
