"""The MPC fabric: an eager, round-based batched runtime.

This is the TPU-native inversion (SURVEY.md §7) of the reference's
`MpcFabric` computation-graph runtime (`online-phase/src/fabric.rs`,
`fabric/executor/*`): instead of allocating per-gate boxed closures on a
dynamic DAG driven by futures, *shares are arrays* and every protocol step is
a fused, jitted kernel over the whole batch followed by (at most) one
coalesced network flush.  The communication pattern of the reference's
batched paths is preserved exactly:

  - `open_batch`: one message each way carrying all n shares, then one local
    combine (`authenticated_scalar.rs:129-172`).
  - `open_authenticated_batch`: open + batched MAC-check values + ONE
    commitment + one value exchange + one blinder exchange — 4 messages each
    way regardless of n (`authenticated_scalar.rs:278-354`, SURVEY §3.3).
  - Beaver mul: one triple batch, one open round of the concatenated
    (d, e) masks, one combine kernel (`authenticated_scalar.rs:846-879`).
  - Party 0 always sends first (`fabric.rs:755-765`).

MAC checks can also be *deferred*: every authenticated open's check values
accumulate and are verified by a single commit-reveal round at the end of the
program (the SPDZ aggregated check; reference aggregates per-batch, we extend
per-program per SURVEY §7(e)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..algebra.scalar import Scalar
from ..algebra.share import PARTY0, PARTY1, ScalarShare
from ..offline.base import PreprocessingPhase
from . import commitment, messages
from .errors import AuthenticationError
from .transport import Transport

# ---------------------------------------------------------------------------
# fused local kernels (jitted once per shape; party_id/static)
# ---------------------------------------------------------------------------


@jax.jit
def _combine_open(my_share: Scalar, their_share: Scalar) -> Scalar:
    return my_share + their_share


@functools.partial(jax.jit, static_argnums=(0,))
def _beaver_combine(party_id: int, a: ScalarShare, b: ScalarShare,
                    c: ScalarShare, d: Scalar, e: Scalar,
                    mac_key: Scalar) -> ScalarShare:
    """[x*y] = d*e + d*[b] + e*[a] + [c]  (`authenticated_scalar.rs:826-841`)."""
    de = d * e
    res = b.mul_public(d) + a.mul_public(e) + c
    return res.add_public(de, mac_key, party_id)


@jax.jit
def _mask_lhs_rhs(x: ScalarShare, y: ScalarShare, a: ScalarShare,
                  b: ScalarShare) -> Scalar:
    """Share parts of (x - a, y - b) concatenated for one open round."""
    d = (x - a).share
    return type(d).concatenate([d, (y - b).share])


@jax.jit
def _mac_check_values(mac_key: Scalar, value: Scalar, mac: Scalar) -> Scalar:
    """d = key_share * opened_value - mac_share (`authenticated_scalar.rs:299-311`)."""
    return mac_key * value - mac


@jax.jit
def _check_zero_sum(mine: Scalar, theirs: Scalar):
    return (mine + theirs).is_zero()


@functools.partial(jax.jit, static_argnums=(0,))
def _input_share(party_id: int, mask_share: ScalarShare, masked: Scalar,
                 mac_key: Scalar) -> ScalarShare:
    """[v] = [mask] + (v - mask) as public (`fabric.rs:552-575`)."""
    return mask_share.add_public(masked, mac_key, party_id)


class MpcFabric:
    """Two-party SPDZ online-phase context for one party.

    Public surface mirrors `MpcFabric<C>` (`fabric.rs:163-185`) re-shaped
    batch-first: input sharing, opens, authenticated arithmetic, offline
    sampling passthroughs, and messaging.
    """

    def __init__(self, party_id: int, transport: Transport,
                 offline: PreprocessingPhase,
                 rng: np.random.Generator | None = None,
                 collect_stats: bool = False,
                 mesh=None):
        """`mesh`: optional `jax.sharding.Mesh` with a `batch` axis.  When
        attached, share vectors are sharded over the party's chips end-to-end
        (offline batches, input shares, opened values), Beaver rounds stay
        element-wise per-chip with zero collectives, and the deferred MAC
        check folds per-chip partial sums through ONE integer `psum`
        (`parallel/step.py:sharded_rlc_fold`).  Opens gather once per round
        for the wire.  This is the engine-property multi-chip path (SURVEY
        §7 step 7); reference role: `fabric/executor/*` +
        `network_sender.rs:97-173`."""
        assert party_id == transport.party_id
        self.party_id = party_id
        self.transport = transport
        self.offline = offline
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._shard1d = NamedSharding(mesh, P(None, "batch"))
        self.mac_key = offline.get_mac_key_share()
        # the share field (FieldArray subclass) is carried by the offline
        # source's MAC key: Curve25519 Scalar by default, bn254.Fr, ...
        # (the reference's C: CurveGroup genericity, lib.rs:75-78)
        self.field = type(self.mac_key)
        if rng is None:
            from ..utils.csprng import default_crypto_rng

            rng = default_crypto_rng()
        self.rng = rng
        if collect_stats:
            from ..utils.stats import FabricStats

            self.stats = FabricStats()
        else:
            self.stats = None
        # deferred MAC-check accumulators (flattened d-value Scalars / points)
        self._deferred: list[Scalar] = []
        self._deferred_points: list = []
        self.n_rounds = 0

    # -- mesh placement ----------------------------------------------------
    def _place(self, limbs):
        """Shard a (16, n) limb array over the mesh `batch` axis.

        No-op without a mesh.  Batches smaller than the mesh stay
        replicated (nothing to shard).  A batch LARGER than the mesh that
        does not divide it RAISES — silently skipping the sharding (the
        round-2 behavior) was a hidden perf/semantics cliff: the caller
        believes the vector is distributed while every chip holds all of
        it.  Pad the batch to a multiple of `mesh.size` at the
        application boundary instead."""
        if self.mesh is None:
            return limbs
        if limbs.ndim == 2 and limbs.shape[1] >= self.mesh.size:
            if limbs.shape[1] % self.mesh.size != 0:
                raise ValueError(
                    f"batch of {limbs.shape[1]} elements does not divide "
                    f"the {self.mesh.size}-device mesh; pad the batch to a "
                    f"multiple of the mesh size (mesh-attached fabrics "
                    f"shard every vector end-to-end)")
            return jax.device_put(limbs, self._shard1d)
        return limbs

    def _place_scalar(self, s: Scalar) -> Scalar:
        return type(s)(self._place(s.limbs))

    def _place_share(self, sh: ScalarShare) -> ScalarShare:
        return ScalarShare(self._place_scalar(sh.share),
                           self._place_scalar(sh.mac))

    def _timed(self, op: str, n: int = 0):
        if self.stats is None:
            import contextlib

            return contextlib.nullcontext()
        return self.stats.timed(op, n)

    # -- low-level messaging ----------------------------------------------
    def _exchange_arrays(self, items):
        """One coalesced frame each way; party 0 sends first."""
        self.n_rounds += 1
        if self.stats is not None:
            self.stats.rounds += 1
        frame = messages.encode_arrays(items)
        return messages.decode_arrays(self.transport.exchange(frame))

    def send_arrays(self, items):
        self.transport.send(messages.encode_arrays(items))

    def recv_arrays(self):
        return messages.decode_arrays(self.transport.recv())

    def exchange_scalars(self, s: Scalar) -> Scalar:
        """Exchange Montgomery-form limb arrays (`fabric.rs:751-765` analog)."""
        (theirs,) = self._exchange_arrays([np.asarray(jax.device_get(s.limbs))])
        return type(s)(jnp.asarray(theirs))

    # -- properties --------------------------------------------------------
    def mac_key_share(self) -> Scalar:
        return self.mac_key

    @property
    def peer_id(self) -> int:
        return PARTY1 if self.party_id == PARTY0 else PARTY0

    # -- input sharing (`fabric.rs:552-575`) -------------------------------
    def share_values(self, values: Scalar | None, sender: int,
                     n: int | None = None) -> ScalarShare:
        """Secret-share `values` held by `sender` into authenticated shares.

        The sender masks with an offline input mask and sends v - mask; both
        parties add the public masked value onto their mask share.
        """
        if self.party_id == sender:
            assert values is not None
            n = values.size
            flat = values.reshape(n)
            mask, mask_share = self.offline.next_local_input_mask_batch(n)
            masked = flat - mask
            self.send_arrays([np.asarray(jax.device_get(masked.limbs))])
            shape = values.shape
        else:
            assert n is not None
            mask_share = self.offline.next_counterparty_input_mask_batch(n)
            (raw,) = self.recv_arrays()
            masked = self.field(jnp.asarray(raw))
            shape = masked.shape
        mask_share = self._place_share(mask_share.reshape(mask_share.size))
        masked = self._place_scalar(masked.reshape(masked.size))
        out = _input_share(self.party_id, mask_share, masked, self.mac_key)
        return out.reshape(*shape)

    def share_public(self, values: Scalar) -> ScalarShare:
        """Both parties know `values`; produce a valid authenticated sharing
        (zero share + add_public), no communication."""
        return ScalarShare.zeros(values.shape).add_public(
            values, self.mac_key, self.party_id
        )

    # -- opening -----------------------------------------------------------
    def open(self, x: ScalarShare) -> Scalar:
        """Open shares without MAC check (`authenticated_scalar.rs:129-172`):
        one exchange of the share vector, one combine kernel.

        Mesh note: tracer flushes concatenate per-node batches of arbitrary
        sizes, so an open's total width may not divide the mesh even when
        every user-level op is aligned.  Unaligned widths fall back to a
        replicated combine (like `mul`) instead of hard-failing mid-flush;
        sharding resumes at the next aligned boundary."""
        with self._timed("open", x.size):
            mine = np.asarray(jax.device_get(x.share.limbs))  # mesh: gather
            (theirs,) = self._exchange_arrays([mine])
            theirs = jnp.asarray(theirs)
            if (self.mesh is not None
                    and theirs.shape[-1] % self.mesh.size != 0):
                placed = theirs
            else:
                placed = self._place(theirs)
            return _combine_open(x.share, type(x.share)(placed))

    def open_authenticated(self, x: ScalarShare, defer: bool = False) -> Scalar:
        """Open and check MACs (`authenticated_scalar.rs:278-354`).

        With `defer=True` the commit-reveal check round is postponed; call
        `verify_deferred()` once at the end of the program (one MAC-check
        round for the whole program).  Raises `AuthenticationError` on a bad
        MAC (malicious abort).
        """
        value = self.open(x)
        d = _mac_check_values(self.mac_key, value, x.mac)
        flat = d.reshape(d.size)
        if defer:
            self._deferred.append(flat)
        else:
            self._run_mac_check(flat)
        return value

    def verify_deferred(self, fold: bool | None = None) -> None:
        """Run ONE commit-reveal MAC check over every deferred open (and one
        for deferred point opens, if any).

        With `fold=True` (the default when a mesh is attached) the deferred
        check values are first collapsed to ONE scalar by a public-coin
        random linear combination — the SPDZ aggregated check (Damgard et
        al. full version §3; reference folds per-batch,
        `offline-phase mac_check.rs:14-29` style).  O(1) wire bytes instead
        of O(n), and on a mesh the fold reduces per-chip partial sums with
        one integer `psum` (`parallel/step.py:sharded_rlc_fold`)."""
        if self._deferred:
            d = self._deferred[0] if len(self._deferred) == 1 else \
                self.field.concatenate(self._deferred)
            self._deferred = []
            if fold is None:
                fold = self.mesh is not None
            if fold:
                self._run_mac_check_folded(d)
            else:
                self._run_mac_check(d)
        if self._deferred_points:
            from . import points as _points

            _points.verify_deferred_points(self)

    def public_coin_rng(self):
        """Jointly-seeded CSPRNG via commit-reveal seed exchange (3 small
        rounds).  Neither party can bias the coin: each commits to its
         32-byte seed contribution before either reveals
        (`offline protocols.public_coin_scalars` analog for the online
        fabric)."""
        from ..utils.csprng import CSPRNG

        mine = self.rng.bytes(32)
        blinder = self.field.random((), self.rng)
        my_comm = commitment.commit_bytes(mine, blinder)
        peer_comm = self.exchange_scalars(my_comm)
        (peer_seed,) = self._exchange_arrays([bytes(mine)])
        peer_blinder = self.exchange_scalars(blinder)
        if not commitment.verify_bytes(bytes(peer_seed), peer_blinder,
                                       peer_comm):
            raise AuthenticationError(
                "public coin commitment failed to verify")
        seeds = ((mine, bytes(peer_seed)) if self.party_id == PARTY0
                 else (bytes(peer_seed), mine))
        return CSPRNG(b"ark-mpc-tpu/public-coin" + seeds[0] + seeds[1])

    def _run_mac_check_folded(self, d: Scalar) -> None:
        """Fold d to one scalar with public-coin coefficients (sampled AFTER
        every d value is fixed), then one commit-reveal zero test."""
        coin = self.public_coin_rng()
        coeffs = self.field.random(d.size, coin)
        if self.mesh is not None and d.size % self.mesh.size == 0:
            from ..parallel.step import sharded_rlc_fold

            t = sharded_rlc_fold(self.mesh, self._place(d.limbs),
                                 self._place(coeffs.limbs))
        else:
            t = (d * coeffs).sum()
        self._run_mac_check(t.reshape(1))

    # -- curve-point protocols (`fabric/points.py`; lazy import to avoid
    # compiling curve kernels for scalar-only programs) --------------------
    def share_points(self, points=None, sender: int = 0, n: int | None = None):
        from . import points as _points

        return _points.share_points(self, points, sender, n)

    def share_public_points(self, points):
        from . import points as _points

        return _points.share_public_points(self, points)

    def open_points(self, ps):
        from . import points as _points

        return _points.open_points(self, ps)

    def open_authenticated_points(self, ps, defer: bool = False):
        from . import points as _points

        return _points.open_authenticated_points(self, ps, defer)

    def mul_points(self, x, ps):
        from . import points as _points

        return _points.beaver_mul_points(self, x, ps)

    def mul_generator(self, x):
        from . import points as _points

        return _points.mul_generator(self, x)

    def msm(self, scalars, points):
        from . import points as _points

        return _points.msm_authenticated(self, scalars, points)

    def _run_mac_check(self, d: Scalar) -> None:
        """Commit-exchange-reveal-verify of MAC check values
        (`authenticated_scalar.rs:222-354`, commit scheme `commitment.rs`)."""
        with self._timed("mac_check", d.size):
            return self._run_mac_check_inner(d)

    def _run_mac_check_inner(self, d: Scalar) -> None:
        blinder = self.field.random((), self.rng)
        my_comm = commitment.commit(d, blinder)

        # Round 1: exchange commitments.
        peer_comm = self.exchange_scalars(my_comm)
        # Round 2: exchange MAC-check values (canonical limbs, hash-ready).
        my_d_canon = np.asarray(jax.device_get(d.canonical_limbs()))
        (peer_d_canon,) = self._exchange_arrays([my_d_canon])
        # Round 3: exchange blinders.
        peer_blinder = self.exchange_scalars(blinder)

        # Verify: peer's commitment opens AND d_mine + d_peer == 0 pairwise.
        peer_d = self.field(
            _to_mont_arr(self.field.spec, jnp.asarray(peer_d_canon)))
        if not commitment.verify(peer_d, peer_blinder, peer_comm):
            raise AuthenticationError("MAC check commitment failed to verify")
        ok = np.asarray(jax.device_get(_check_zero_sum(d, peer_d)))
        if not ok.all():
            raise AuthenticationError("MAC check failed: shares of key*v - mac do not sum to zero")

    # -- authenticated arithmetic -----------------------------------------
    def mul(self, x: ScalarShare, y: ScalarShare) -> ScalarShare:
        """Beaver multiplication, element-wise over the batch
        (`authenticated_scalar.rs:846-879`): one triple batch, ONE open round
        for the concatenated (d, e) masks, one combine kernel."""
        shape = x.shape
        n = x.size
        with self._timed("beaver_mul", n):
            xf, yf = x.reshape(n), y.reshape(n)
            a, b, c = self.offline.next_triplet_batch(n)
            if self.mesh is not None and n % self.mesh.size == 0:
                # Mesh path: keep (d, e) as separate sharded vectors (the
                # concat+slice form would force a resharding collective).
                # Still ONE coalesced frame each way per round.
                a, b, c = (self._place_share(s) for s in (a, b, c))
                dm = (xf - a).share
                em = (yf - b).share
                d_th, e_th = self._exchange_arrays([
                    np.asarray(jax.device_get(dm.limbs)),
                    np.asarray(jax.device_get(em.limbs))])
                d = _combine_open(dm, self.field(self._place(jnp.asarray(d_th))))
                e = _combine_open(em, self.field(self._place(jnp.asarray(e_th))))
            else:
                masked = _mask_lhs_rhs(xf, yf, a, b)
                mine = np.asarray(jax.device_get(masked.limbs))
                (theirs,) = self._exchange_arrays([mine])
                opened = _combine_open(self.field(masked.limbs),
                                       self.field(jnp.asarray(theirs)))
                d, e = opened[:n], opened[n:]
            out = self._beaver_combine_dispatch(a, b, c, d, e)
            return out.reshape(*shape)

    def _beaver_combine_dispatch(self, a, b, c, d, e):
        """Post-open Beaver combine: Pallas-tiled fused kernel on TPU for
        tile-aligned batches (VMEM-resident conv/REDC — scales past the XLA
        path's ~2^18 HBM-temp ceiling; see bench.py), XLA elsewhere."""
        n = d.size
        per_shard = n // self.mesh.size if self.mesh is not None else n
        if jax.default_backend() == "tpu" and per_shard % 512 == 0:
            from ..ops.fp_kernels import beaver_round_pallas

            key_b = jnp.broadcast_to(
                self.mac_key.limbs.reshape(-1, 1), d.limbs.shape)

            def run(a_s, a_m, b_s, b_m, c_s, c_m, d_l, e_l, k_l):
                zs, zm = beaver_round_pallas(
                    self.field.spec, self.party_id,
                    a_s, a_m, b_s, b_m, c_s, c_m, d_l, e_l, k_l)
                return zs, zm

            if self.mesh is not None and n % self.mesh.size == 0:
                # shard_map the Pallas kernel: each chip runs the fused
                # combine on its batch shard (no collectives).
                from jax.sharding import PartitionSpec as P

                from ..parallel.step import _shard_map

                sp = P(None, "batch")
                run = _shard_map(run, mesh=self.mesh,
                                 in_specs=(sp,) * 9, out_specs=(sp, sp))
            zs, zm = run(
                a.share.limbs, a.mac.limbs, b.share.limbs, b.mac.limbs,
                c.share.limbs, c.mac.limbs, d.limbs, e.limbs, key_b)
            return ScalarShare(self.field(zs), self.field(zm))
        return _beaver_combine(self.party_id, a, b, c, d, e, self.mac_key)

    def mul_public(self, x: ScalarShare, k: Scalar) -> ScalarShare:
        return x.mul_public(k)

    def add_public(self, x: ScalarShare, k: Scalar) -> ScalarShare:
        return x.add_public(k, self.mac_key, self.party_id)

    def sub_public(self, x: ScalarShare, k: Scalar) -> ScalarShare:
        return x.sub_public(k, self.mac_key, self.party_id)

    def inverse(self, x: ScalarShare, defer_check: bool = False) -> ScalarShare:
        """Batched shared inversion via masked open
        (`authenticated_scalar.rs:50-82`): [x^-1] = r * open(x*r)^-1.
        Zero inputs map to zero output."""
        shape = x.shape
        n = x.size
        r = self.random_shared_scalars(n)
        m = self.mul(x.reshape(n), r)
        m_open = self.open_authenticated(m, defer=defer_check)
        m_inv = m_open.inverse()
        return r.mul_public(m_inv).reshape(*shape)

    def pow(self, x: ScalarShare, e: int) -> ScalarShare:
        """Public-exponent exponentiation (`authenticated_scalar.rs:84-100`).

        LSB-first square-and-multiply with the step's two independent
        products (result*base, base*base) batched into ONE width-2n Beaver
        round — exactly bit_length(e) rounds, vs ~1.5x that for the naive
        recursive squaring (each round on TPU is a dispatch + exchange, so
        round depth is the cost that matters here)."""
        e = int(e)
        if e == 0:
            return self.share_public(self.field.ones(x.shape))
        shape = x.shape
        n = x.size
        result, base = None, x.reshape(n)
        while True:
            if e & 1:
                if result is None:
                    result = base
                elif e > 1:
                    # one fused round: [result*base, base*base]
                    both = self.mul(
                        ScalarShare.concatenate([result, base]),
                        ScalarShare.concatenate([base, base]),
                    )
                    result, base = both[:n], both[n:]
                    e >>= 1
                    continue
                else:
                    result = self.mul(result, base)
            e >>= 1
            if e == 0:
                break
            base = self.mul(base, base)
        return result.reshape(*shape)

    # -- offline sampling passthroughs (`fabric.rs:876-978`); batches land
    # sharded when a mesh is attached ---------------------------------------
    def next_triple_batch(self, n: int):
        return tuple(self._place_share(s)
                     for s in self.offline.next_triplet_batch(n))

    def random_shared_scalars(self, n: int) -> ScalarShare:
        return self._place_share(self.offline.next_shared_value_batch(n))

    def random_inverse_pairs(self, n: int):
        return tuple(self._place_share(s)
                     for s in self.offline.next_shared_inverse_pair_batch(n))

    def random_shared_bits(self, n: int) -> ScalarShare:
        return self._place_share(self.offline.next_shared_bit_batch(n))

    # -- constants (`fabric.rs:499-546`) -----------------------------------
    def zero_authenticated(self, shape=()) -> ScalarShare:
        return ScalarShare.zeros(shape, field=self.field)

    def one_authenticated(self, shape=()) -> ScalarShare:
        return self.share_public(self.field.ones(shape))

    def tracer(self):
        """Start a batched-circuit trace (see fabric/scheduler.py)."""
        from .scheduler import Tracer

        return Tracer(self)

    def num_ops(self) -> int:
        """Total fabric operations executed so far (`fabric.rs:480-484`
        `num_gates` analog; requires `collect_stats=True`, else 0).

        NOTE: counts FUSED protocol invocations, not per-gate allocations —
        one `mul` over a batch of 2^20 elements counts as 1, where the
        reference's `num_gates` would count every allocated op id.  The
        batch-first design has no per-element gate allocation to count."""
        if self.stats is None:
            return 0
        return sum(self.stats.op_counts.values())

    def shutdown(self):
        self.transport.close()


@functools.partial(jax.jit, static_argnums=0)
def _to_mont_arr(spec, canon_limbs):
    from ..algebra import limbs as lb

    return lb.to_mont(spec, canon_limbs)
