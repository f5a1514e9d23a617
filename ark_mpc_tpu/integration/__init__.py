"""Registered two-party integration tests over a real transport.

Analog of the reference's inventory-registered integration harness
(`/root/reference/integration/src/main.rs:101-224`): each test registers
with the `@integration_test` decorator and receives a live `MpcFabric`;
one driver process pair (`python -m ark_mpc_tpu.integration`) executes the
whole registry sequentially over a single real TCP connection.
`tests/test_integration_tcp.py` spawns both parties under pytest, so the
registry runs in CI over the real wire — including the malicious-abort
cases (both parties must observe `AuthenticationError`).

Unlike the reference (which boots a fresh QUIC session per `--test` match),
the whole registry shares one connection: the fabric is stateless between
tests apart from the deferred-check accumulators, which every test drains.
"""

from __future__ import annotations

import traceback
from typing import Callable

REGISTRY: dict[str, Callable] = {}


def integration_test(fn: Callable | None = None, *, name: str | None = None):
    """Register a two-party integration test: `f(fabric) -> None`, raising
    on failure.  Both parties run the same body (`execute_mock_mpc`-style
    closures, party-dependent inputs via `fabric.party_id`)."""

    def deco(f):
        REGISTRY[name or f.__name__] = f
        return f

    return deco(fn) if fn is not None else deco


def slow_integration_test(fn: Callable):
    """Register a case that only runs when named explicitly via `--tests`
    (minutes-long flows, e.g. the dealer-free LowGear e2e — the reference
    likewise picks these with `--test` in its harness, `main.rs:81-98`)."""
    fn.__slow__ = True
    return integration_test(fn)


def run_registry(fabric, only: list[str] | None = None,
                 log=None) -> dict[str, str]:
    """Execute every registered test against `fabric` in sorted-name order
    (both parties MUST iterate identically).  Returns {name: "ok" | "FAIL:
    ..."}; a transport-level failure aborts the run (the wire is dead)."""
    from . import cases  # noqa: F401  (import populates REGISTRY)

    results: dict[str, str] = {}
    for name in sorted(REGISTRY):
        if only and name not in only:
            continue
        if not only and getattr(REGISTRY[name], "__slow__", False):
            continue  # slow cases run only when explicitly selected
        if log:
            log(f"[party {fabric.party_id}] {name} ...")
        try:
            REGISTRY[name](fabric)
            results[name] = "ok"
        except ConnectionError:
            results[name] = "FAIL: transport died"
            raise
        except Exception:
            results[name] = "FAIL: " + traceback.format_exc(limit=3)
        # Drain any deferred-check state a failed test left behind so the
        # next test starts clean (parties stay in lockstep because both
        # observe the same failure).
        fabric._deferred.clear()
        fabric._deferred_points.clear()
    return results
