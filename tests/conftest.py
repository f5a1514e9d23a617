"""Test configuration: force the CPU backend.

The container's sitecustomize registers the tunneled `axon` TPU plugin at
interpreter start and it wins over JAX_PLATFORMS env settings; tests must run
on local CPU (the tunnel is slow and unsafe under concurrent dispatch from
the two simulated parties).  `jax.config.update` after import reliably forces
CPU.  Mirrors the reference's tier-1/tier-2 test strategy (SURVEY.md §4).

The two-party simulator additionally serializes party threads (lockstep
baton) — see `ark_mpc_tpu/fabric/transport.py:LockstepScheduler`.

Multi-chip sharding tests use `jax.config.update('jax_num_cpu_devices', 8)`
in a subprocess (tests/test_multichip.py) since device count is fixed at
backend init.
"""

import jax

jax.config.update("jax_platforms", "cpu")
