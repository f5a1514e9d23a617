"""LowGear offline-phase orchestrator.

Analog of `offline-phase/src/lowgear/mod.rs:38-271` (component #23): holds
the per-party state, sequences `run_offline_phase` (`lowgear/mod.rs:178-190`)
— triples (with the pair-sacrifice malicious check), inverse tuples, shared
bits, shared randomness, input masks — and packages a serializable
`LowGearPrep` the online fabric consumes.

Two modes:

- mode="bgv" (the production path, dealer-free): raw triple pairs,
  authenticated randomness, and input masks come from the TPU-resident
  BGV-over-l pipeline (`triplets_l.py` — ZK-gated enc(a) exchange,
  homomorphic cross products with drowning, homomorphic MACs, Fig. 7 of
  LowGear / `lowgear/triplets.rs:30-234`), after a real key exchange with
  a proved enc(mac_share).  The pair sacrifice, MAC checks, inverse
  tuples, and bit generation run downstream as the real two-party
  protocol over the transport.
- mode="dealer" (tests only): raw candidate material comes from an
  honest-dealer source with identical shapes/semantics, so the downstream
  protocols can be exercised in isolation and fast.
"""

from __future__ import annotations

import numpy as np

from ...algebra.scalar import Scalar
from ...algebra.share import ScalarShare
from ...fabric.context import MpcFabric
from ...fabric.transport import Transport
from ..base import TrustedDealerSource
from ..errors import SacrificeError
from ..structs import LowGearPrep, OfflineSizingParams
from . import protocols


def resolve_bgv_ring(ring, allow_insecure_ring: bool):
    """Ring-selection policy for bgv-mode `LowGear`: default to the
    RLWE-secure production ring; refuse rings failing the 128-bit check
    unless the caller explicitly opted out (tests/CI harnesses)."""
    from ..bgv.bgv_l import production_ring, rlwe_secure_128

    if ring is None:
        ring = production_ring()
    if not allow_insecure_ring and not rlwe_secure_128(ring):
        raise ValueError(
            f"ring m={ring.m} (phi={ring.phi}) fails the 128-bit RLWE "
            f"security check and was not explicitly allowed; pass "
            f"allow_insecure_ring=True ONLY for tests/benchmarks "
            f"(docs/security_params.md §2)")
    return ring


class LowGear:
    """Per-party offline-phase state machine."""

    def __init__(self, party_id: int, transport: Transport,
                 rng: np.random.Generator | None = None,
                 dealer_seed: int = 0xA5A5, mode: str = "dealer",
                 ring=None, jkey=None, setup=None,
                 allow_insecure_ring: bool = False):
        """mode="bgv": fully dealer-free — raw triples, randomness, and
        input masks come from the BGV-over-l pipeline (`triplets_l.py`)
        after a real key exchange.  mode="dealer": honest-dealer raw
        material (fast; used by tests that exercise the downstream
        protocols in isolation).

        `setup`: a previously exchanged `SetupL` (see `get_setup_params` /
        `from_setup_params`) — skips the key exchange so a party can
        reconnect with a fresh transport between phases, mirroring
        `LowGear::new_from_params` (`lowgear/mod.rs:92-127`).

        SECURE BY DEFAULT: in bgv mode the ring defaults to the RLWE-secure
        production ring (`production_ring()`, m = 118965) and any ring
        failing the 128-bit RLWE check (`rlwe_secure_128`) — including the
        m = 132 prototype and the m = 1155 medium ring — is REFUSED unless
        `allow_insecure_ring=True` is passed explicitly (tests/CI only).
        The reference cannot construct insecure params at all
        (`fhe/params.rs:41-52` generates them from the modulus)."""
        self.party_id = party_id
        self.transport = transport
        self.mode = mode
        if rng is None:
            # SECURE DEFAULT: every secret this state machine draws (MAC key
            # share, triple secrets, input masks, BGV secret key, noise)
            # comes from OS entropy.  Deterministic generators are for tests
            # only and must be passed explicitly.
            from ...utils.csprng import default_crypto_rng

            rng = default_crypto_rng()
        self.rng = rng
        if mode == "bgv":
            import secrets as _secrets

            import jax

            from . import triplets_l

            self._tl = triplets_l
            self._jkey = jkey if jkey is not None else jax.random.PRNGKey(
                _secrets.randbits(63))
            candidate = setup.ring if setup is not None else ring
            self.ring = resolve_bgv_ring(candidate, allow_insecure_ring)
            if setup is not None:
                self.setup = setup
            else:
                self.setup = triplets_l.key_exchange_l(
                    transport, self.ring, self.rng, self._next_key())
            self.mac_key_share = self.setup.mac_key_share
            self._dealer = None
        else:
            # Both parties construct the dealer with the same seed, mirroring
            # `mock_lowgear_with_keys` (`offline-phase/src/lib.rs:125-232`).
            self._dealer = TrustedDealerSource(party_id, seed=dealer_seed)
            self.mac_key_share = self._dealer.get_mac_key_share()
        self.prep = LowGearPrep(mac_key_share=self.mac_key_share)
        # The generation fabric's Beaver rounds consume triples out of the
        # prep stores being built (bgv mode) or raw dealer material.
        source = self.prep if mode == "bgv" else self._dealer
        self.fabric = MpcFabric(party_id, transport, source, rng=self.rng)

    def _next_key(self):
        import jax

        self._jkey, sub = jax.random.split(self._jkey)
        return sub

    def _round_batches(self, n_batches: int) -> int:
        """Round a slot-batch count up to the stacked-dispatch chunk
        (`triplets_l.stack_chunk(ring)`) so all bgv-mode calls share one
        compiled shape set (tunnel compiles dominate otherwise)."""
        c = self._tl.stack_chunk(self.ring)
        return max(c, -(-n_batches // c) * c)

    # -- generation steps (`lowgear/mod.rs:178-190` sequencing) ------------

    def generate_triples(self, n: int) -> None:
        """Candidate triple pairs + pair sacrifice
        (`lowgear/triplets.rs:118-147`): with (a,b,c) and (a,b',c') sharing
        `a`, draw a public coin r, open rho = r*b - b', then check
        r*c - c' - rho*a opens to zero."""
        a, b, c, b2, c2 = self._raw_triple_pairs(n)
        n = a.size  # bgv mode rounds up to whole slot batches

        r = protocols.public_coin_scalars(self.fabric, n)
        rho_share = b.mul_public(r) - b2
        rho = protocols.open_and_check_macs(self.fabric, rho_share)
        tau_share = c.mul_public(r) - c2 - a.mul_public(rho)
        tau = protocols.open_and_check_macs(self.fabric, tau_share)
        if not bool(np.asarray(tau.is_zero()).all()):
            raise SacrificeError("triple sacrifice check failed")
        self.prep.triples.add(a, b, c)

    def generate_inverse_tuples(self, n: int) -> None:
        a, a_inv = protocols.generate_inverse_tuples(self.fabric, n)
        self.prep.inverse_pairs.add(a, a_inv)

    def generate_shared_bits(self, n: int) -> None:
        self.prep.bits.add(protocols.generate_shared_bits(self.fabric, n))

    def generate_shared_randomness(self, n: int) -> None:
        if self.mode == "bgv":
            # the real protocol: local sampling + homomorphic MAC
            # (`shared_random.rs:56-71`); all slot-batches under ONE
            # stacked exchange, batch count rounded to the compiled shape
            phi = self.ring.slots
            self.prep.randomness.add(
                self._tl.generate_authenticated_randomness_l(
                    self.transport, self.setup, self.rng, self._next_key(),
                    n_batches=self._round_batches((n + phi - 1) // phi)))
            return
        self.prep.randomness.add(
            protocols.generate_shared_randomness(self.fabric, n)
        )

    def generate_input_masks(self, n: int) -> None:
        """Input masks (`lowgear/input_masks.rs:15-58`).

        bgv mode generates in whole rounded-up slot-batch chunks and KEEPS
        the surplus: a later request that fits the existing inventory makes
        no BGV exchange at all.  (The skip decision is symmetric across
        parties — both stores shrink in lockstep as masks are consumed, so
        neither party blocks on a one-sided exchange.)"""
        if self.mode == "bgv":
            have = min(len(self.prep.my_mask_shares),
                       len(self.prep.counterparty_mask_shares))
            if have >= n:
                return  # served from the rounded-up surplus inventory
            clear, mine, cp = self._tl.generate_input_masks_l(
                self.transport, self.setup, n - have,
                local_first=(self.party_id == 0), rng=self.rng,
                jkey=self._next_key())
            self.prep.my_masks_clear.append(clear)
            self.prep.my_mask_shares.add(mine)
            self.prep.counterparty_mask_shares.add(cp)
            return
        # Both parties must consume the dealer streams in the SAME order:
        # stream 1 = party 0's local masks, stream 2 = party 1's. (The local/
        # counterparty dealer methods draw identically; they differ only in
        # returning the cleartext mask to its owner.)
        d = self._dealer
        if self.party_id == 0:
            clear, share = d.next_local_input_mask_batch(n)
            cp = d.next_counterparty_input_mask_batch(n)
        else:
            cp = d.next_counterparty_input_mask_batch(n)
            clear, share = d.next_local_input_mask_batch(n)
        self.prep.my_masks_clear.append(clear)
        self.prep.my_mask_shares.add(share)
        self.prep.counterparty_mask_shares.add(cp)

    def run_offline_phase(self, sizing: OfflineSizingParams) -> None:
        if self.mode == "bgv":
            # The derived protocols (inverse tuples, bits) run Beaver rounds
            # and draw randomness through the generation fabric, which in
            # bgv mode is backed by the prep stores themselves — so stock
            # enough BGV-generated material FIRST.
            extra_triples = sizing.num_inverse_pairs + sizing.num_bits
            extra_rand = 2 * sizing.num_inverse_pairs + sizing.num_bits
            self.generate_shared_randomness(sizing.num_randomness + extra_rand)
            self.generate_triples(sizing.num_triples + extra_triples)
        else:
            self.generate_triples(sizing.num_triples)
        self.generate_inverse_tuples(sizing.num_inverse_pairs)
        self.generate_shared_bits(sizing.num_bits)
        if self.mode != "bgv":
            self.generate_shared_randomness(sizing.num_randomness)
        self.generate_input_masks(sizing.num_input_masks)

    def get_offline_result(self) -> LowGearPrep:
        return self.prep

    # -- setup persistence (`lowgear/mod.rs:92-127` analog) -----------------

    def get_setup_params(self) -> bytes:
        """Serialize the post-key-exchange state — ring identity, own BGV
        keypair, counterparty PK, counterparty's proved enc(MAC share), and
        the MAC key share — so the offline phase can resume with a FRESH
        transport without redoing the key exchange.  Analog of
        `LowGear::get_setup_params` (`lowgear/mod.rs:92-104`); the reference
        uses it to reconnect between the offline and online phases
        (`integration/src/lowgear.rs:19-24`)."""
        assert self.mode == "bgv", "setup persistence is a bgv-mode feature"
        import io
        import json

        import jax

        r = self.ring
        kind = type(r).__name__
        meta = {"kind": kind, "m": int(r.m), "n_q": len(r.q_primes),
                "cbd_k": int(r.cbd_k), "drown_sec": int(r.drown_sec)}
        if kind == "PowerfulRing":
            meta["zk_sec"] = int(r.zk_sec)
            meta["u_max"] = int(r.u_max)
        st = self.setup
        get = lambda a: np.asarray(jax.device_get(a))  # noqa: E731
        buf = io.BytesIO()
        np.savez(
            buf,
            meta=np.frombuffer(json.dumps(meta).encode(), np.uint8),
            q_primes=np.asarray(r.q_primes, np.uint64),
            sk=get(st.keypair.sk), pk_a=get(st.keypair.pk_a),
            pk_b=get(st.keypair.pk_b),
            other_pk_a=get(st.other_pk_a), other_pk_b=get(st.other_pk_b),
            mac_c0=get(st.other_mac_enc.c0), mac_c1=get(st.other_mac_enc.c1),
            mac_key_share=np.frombuffer(
                self.mac_key_share.to_bytes_le(), np.uint8),
        )
        return buf.getvalue()

    @classmethod
    def from_setup_params(cls, party_id: int, transport: Transport,
                          blob: bytes,
                          rng: np.random.Generator | None = None,
                          jkey=None,
                          allow_insecure_ring: bool = False) -> "LowGear":
        """Rebuild a bgv-mode `LowGear` from `get_setup_params` output over
        a (possibly new) transport — no key exchange is performed.  Analog
        of `LowGear::new_from_params` (`lowgear/mod.rs:107-127`)."""
        import io
        import json

        import jax.numpy as jnp

        from ..bgv.bgv_l import CiphertextL, KeypairL
        from .triplets_l import SetupL

        with np.load(io.BytesIO(blob)) as z:
            meta = json.loads(z["meta"].tobytes().decode())
            q_primes = [int(q) for q in z["q_primes"]]
            arrs = {k: z[k] for k in ("sk", "pk_a", "pk_b", "other_pk_a",
                                      "other_pk_b", "mac_c0", "mac_c1")}
            mac_bytes = z["mac_key_share"].tobytes()

        if meta["kind"] == "PowerfulRing":
            from ..bgv.powerful import PowerfulRing

            ring = PowerfulRing(meta["m"], n_q_primes=meta["n_q"],
                                cbd_k=meta["cbd_k"],
                                drown_sec=meta["drown_sec"],
                                zk_sec=meta["zk_sec"], u_max=meta["u_max"])
        else:
            from ..bgv.cyclotomic import CyclotomicRing

            ring = CyclotomicRing(meta["m"], n_q_primes=meta["n_q"],
                                  cbd_k=meta["cbd_k"],
                                  drown_sec=meta["drown_sec"])
        if [int(q) for q in ring.q_primes] != q_primes:
            raise ValueError("reconstructed ring RNS basis mismatch")

        dev = {k: jnp.asarray(v) for k, v in arrs.items()}
        mac_key_share = Scalar.from_bytes_le(mac_bytes).reshape()
        st = SetupL(ring, KeypairL(ring, dev["sk"], dev["pk_a"], dev["pk_b"]),
                    dev["other_pk_a"], dev["other_pk_b"],
                    CiphertextL(dev["mac_c0"], dev["mac_c1"]), mac_key_share)
        return cls(party_id, transport, rng=rng, mode="bgv", jkey=jkey,
                   setup=st, allow_insecure_ring=allow_insecure_ring)

    # -- raw material (BGV swap-in point) ----------------------------------

    def _raw_triple_pairs(self, n: int):
        """-> ([a], [b], [c=ab], [b'], [c'=ab']) candidate authenticated
        triple pairs.

        bgv mode: the real pipeline — encrypt(a) exchange, homomorphic
        products with drowning, homomorphic MACs (`triplets.rs:30-114`),
        generated in slot-batches of ring.phi.  dealer mode keeps identical
        shapes/semantics for downstream-protocol tests."""
        if self.mode == "bgv":
            phi = self.ring.slots
            # all slot-batches' enc(a) ciphertexts under ONE amortized
            # ZK proof (`params.rs:65-67` batch structure); batch count
            # rounds up to the stacked-dispatch chunk so EVERY call (any
            # n) reuses one compiled shape set — remote-tunnel compiles
            # are minutes each, and the extra slot-batches are kept
            # inventory, not waste
            return self._tl.generate_triple_pairs_batch_l(
                self.transport, self.setup,
                self._round_batches((n + phi - 1) // phi),
                self.rng, self._next_key())
        d = self._dealer
        a_v = Scalar.random(n, d.rng)
        b_v = Scalar.random(n, d.rng)
        b2_v = Scalar.random(n, d.rng)
        a = d._mine(d._deal(a_v))
        b = d._mine(d._deal(b_v))
        c = d._mine(d._deal(a_v * b_v))
        b2 = d._mine(d._deal(b2_v))
        c2 = d._mine(d._deal(a_v * b2_v))
        return a, b, c, b2, c2
