"""ark_mpc_tpu: a TPU-native SPDZ-style two-party MPC engine.

Brand-new JAX/XLA/Pallas implementation of the capabilities of
`renegade-fi/ark-mpc` (see SURVEY.md): maliciously secure 2PC over the
Curve25519 scalar field with SPDZ MACs, batch-first share arithmetic compiled
as fused vectorized kernels, a round-based coalescing runtime in place of a
per-gate futures fabric, authenticated curve operations, gadget and
polynomial layers, and (in progress) a TPU-resident LowGear offline phase.
"""

from .algebra.scalar import BaseFelt, Scalar
from .algebra.share import PARTY0, PARTY1, ScalarShare
from .fabric.context import MpcFabric
from .fabric.errors import (
    AuthenticationError,
    MpcError,
    NetworkError,
    SetupError,
)
from .fabric.simulator import execute_mock_mpc, execute_mock_mpc_dealer
from .fabric.transport import LocalTransport, TcpTransport
from .offline.base import PartyIDBeaverSource, PreprocessingPhase, TrustedDealerSource
from .offline.lowgear.core import LowGear
from .offline.structs import LowGearPrep, OfflineSizingParams

__all__ = [
    "Scalar",
    "BaseFelt",
    "ScalarShare",
    "PARTY0",
    "PARTY1",
    "MpcFabric",
    "MpcError",
    "AuthenticationError",
    "NetworkError",
    "SetupError",
    "execute_mock_mpc",
    "execute_mock_mpc_dealer",
    "LocalTransport",
    "TcpTransport",
    "PreprocessingPhase",
    "PartyIDBeaverSource",
    "TrustedDealerSource",
    "LowGear",
    "LowGearPrep",
    "OfflineSizingParams",
]

__version__ = "0.1.0"
