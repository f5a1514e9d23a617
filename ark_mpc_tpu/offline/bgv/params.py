"""BGV parameter sets.

Analog of the reference's `BGVParams` (`mp-spdz-rs/src/fhe/params.rs:41-95`,
backed by MP-SPDZ `FHE_Params`): ring dimension, plaintext modulus,
ciphertext RNS basis, noise parameters, and (de)serialization.

Round-1 instantiation: power-of-2 negacyclic rings with an NTT-friendly
plaintext prime (t = 1 mod 2N), which exercises the complete scheme —
keygen, encryption, slot packing, ct x pt products, drowning — end to end.
The Curve25519-order plaintext field requires the non-power-of-2 cyclotomic
backend (docs/bgv_design.md: m = 118965, GF(l^2) slots); its transform slots
into `NttPlan`'s place without touching this layer's callers.
"""

from __future__ import annotations

import numpy as np

from ...ops.modular32 import PrimeSpec, find_primes
from ...ops.ntt import NttPlan

DEFAULT_DROWN_SEC = 64  # statistical drowning security (reference uses 128
#                          with ~700-bit q; test params use 64 to keep the
#                          RNS basis small — sized in `for_drown_sec`)


class BgvParams:
    """One BGV parameter set (hashable; static under jit)."""

    def __init__(self, n: int, plaintext_modulus: int, q_bits: int = 30,
                 n_q_primes: int = 6, drown_sec: int = DEFAULT_DROWN_SEC,
                 cbd_k: int = 10):
        assert n & (n - 1) == 0
        assert (plaintext_modulus - 1) % (2 * n) == 0, (
            "plaintext modulus must be 1 mod 2N for slot packing"
        )
        self.n = n
        self.t = plaintext_modulus
        self.t_spec = PrimeSpec(plaintext_modulus)
        self.t_plan = NttPlan(plaintext_modulus, n, negacyclic=True)
        self.drown_sec = drown_sec
        self.cbd_k = cbd_k  # centered binomial parameter (sigma = sqrt(k/2))

        self.q_primes = find_primes(n_q_primes, order=2 * n, bits=q_bits)
        self.q_specs = tuple(PrimeSpec(q) for q in self.q_primes)
        self.q_plans = tuple(NttPlan(q, n, negacyclic=True)
                             for q in self.q_primes)
        self.q = int(np.prod([1], dtype=object))
        q = 1
        for p in self.q_primes:
            q *= p
        self.q = q
        # CRT reconstruction constants: q/q_i and (q/q_i)^-1 mod q_i
        self.q_hat = [q // p for p in self.q_primes]
        self.q_hat_inv = [pow(q // p, -1, p) for p in self.q_primes]

    @property
    def slots(self) -> int:
        """Plaintext slots per ciphertext (full packing: N)."""
        return self.n

    def max_drown_noise_bits(self) -> int:
        """Noise budget check helper: log2(q / (2t)) must exceed the drowned
        noise magnitude for correct decryption."""
        return (self.q // (2 * self.t)).bit_length() - 1

    def __hash__(self):
        return hash((self.n, self.t, self.q_primes[0], len(self.q_primes)))

    def __eq__(self, other):
        return (isinstance(other, BgvParams) and other.n == self.n
                and other.t == self.t and other.q_primes == self.q_primes)

    # -- serialization (`params.rs:70-95` serde parity) --------------------
    def to_dict(self) -> dict:
        return {
            "n": self.n,
            "t": self.t,
            "q_bits": self.q_primes[0].bit_length(),
            "n_q_primes": len(self.q_primes),
            "drown_sec": self.drown_sec,
            "cbd_k": self.cbd_k,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "BgvParams":
        return cls(d["n"], d["t"], d["q_bits"], d["n_q_primes"],
                   d["drown_sec"], d["cbd_k"])


def test_params(n: int = 1024) -> BgvParams:
    """Small parameter set for tests: ~29-bit plaintext prime, 6x30-bit q."""
    t = find_primes(1, order=2 * n, bits=29)[0]
    return BgvParams(n, t)
