"""Preprocessing-phase interface and test/dealer sources.

TPU-native analog of `online-phase/src/offline_prep.rs:12-170`: the trait the
online fabric consumes offline material through (MAC key share, input masks,
shared bits/values/inverse pairs, Beaver triples), batch-first, plus

  - `PartyIDBeaverSource`: the reference's deterministic mock
    (`offline_prep.rs:102-170`): a=2, b=3, c=6 with [a]=(1,1), [b]=(3,0),
    [c]=(2,4); MAC key share = party_id (global key = 1). Reproduced exactly
    so test vectors line up with the reference's mock-MPC tests.
  - `TrustedDealerSource`: honest-dealer randomized preprocessing generated
    from a seed both parties share (the `mock_lowgear_with_triples` analog,
    `offline-phase/src/lib.rs:125-232`) — used in benches and as the stand-in
    until the TPU LowGear phase (ark_mpc_tpu.offline.lowgear) produces real
    material.
"""

from __future__ import annotations

import numpy as np

from ..algebra.scalar import Scalar
from ..algebra.share import ScalarShare


class PreprocessingPhase:
    """Source of offline randomness for one party (batch-first API)."""

    def get_mac_key_share(self) -> Scalar:
        raise NotImplementedError

    def next_triplet_batch(self, n: int):
        """-> ([a], [b], [c]) ScalarShares of shape (n,) with c = a*b."""
        raise NotImplementedError

    def next_shared_value_batch(self, n: int) -> ScalarShare:
        raise NotImplementedError

    def next_shared_inverse_pair_batch(self, n: int):
        """-> ([r], [r^-1]) of shape (n,)."""
        raise NotImplementedError

    def next_shared_bit_batch(self, n: int) -> ScalarShare:
        raise NotImplementedError

    def next_local_input_mask_batch(self, n: int):
        """-> (mask cleartext Scalar(n,), [mask] ScalarShare(n,))."""
        raise NotImplementedError

    def next_counterparty_input_mask_batch(self, n: int) -> ScalarShare:
        raise NotImplementedError

    def next_matrix_triplet(self, m: int, k: int, n: int):
        """Matrix Beaver triple ([P](m,k), [Q](k,n), [P@Q](m,n)).

        Extension beyond the reference's scalar triples: makes shared matmul
        communication O(mk + kn) instead of O(mkn).
        """
        raise NotImplementedError

    def next_poly_triplet(self, da: int, db: int):
        """Polynomial Beaver triple: coefficient ScalarShares of random
        polys ([P] deg da, [Q] deg db, [P*Q]).  Powers the share x share
        polynomial product for fields without radix-2 NTT (see
        `algebra/poly.py`)."""
        raise NotImplementedError


class PartyIDBeaverSource(PreprocessingPhase):
    """Deterministic mock preprocessing (`offline_prep.rs:102-170`)."""

    def __init__(self, party_id: int):
        assert party_id in (0, 1)
        self.party_id = party_id

    def get_mac_key_share(self) -> Scalar:
        return Scalar.from_ints(self.party_id)

    def _const_share(self, share_val: int, value: int, n: int) -> ScalarShare:
        pid = self.party_id
        return ScalarShare(
            Scalar.from_ints([share_val] * n),
            Scalar.from_ints([pid * value] * n),
        )

    def next_triplet_batch(self, n: int):
        if self.party_id == 0:
            sa, sb, sc = 1, 3, 2
        else:
            sa, sb, sc = 1, 0, 4
        return (
            self._const_share(sa, 2, n),
            self._const_share(sb, 3, n),
            self._const_share(sc, 6, n),
        )

    def next_shared_value_batch(self, n: int) -> ScalarShare:
        pid = self.party_id
        return ScalarShare(
            Scalar.from_ints([pid] * n), Scalar.from_ints([pid] * n)
        )

    def next_shared_inverse_pair_batch(self, n: int):
        v = self.next_shared_value_batch(n)
        return v, self.next_shared_value_batch(n)

    def next_shared_bit_batch(self, n: int) -> ScalarShare:
        return self.next_shared_value_batch(n)

    def next_local_input_mask_batch(self, n: int):
        pid = self.party_id
        mask = Scalar.from_ints([3] * n)
        share = ScalarShare(
            Scalar.from_ints([pid * 3] * n), Scalar.from_ints([pid * 3] * n)
        )
        return mask, share

    def next_counterparty_input_mask_batch(self, n: int) -> ScalarShare:
        pid = self.party_id
        value = 3 * pid
        return ScalarShare(
            Scalar.from_ints([value] * n), Scalar.from_ints([pid * value] * n)
        )

    def next_matrix_triplet(self, m: int, k: int, n: int):
        pid = self.party_id

        def mat(shape, share_val, value):
            cnt = shape[0] * shape[1]
            return ScalarShare(
                Scalar.from_ints([share_val] * cnt).reshape(*shape),
                Scalar.from_ints([pid * value] * cnt).reshape(*shape),
            )

        # P = all-2, Q = all-3, C = P@Q = all-(6k); splits mirror the scalar
        # triple convention.
        c_share = 2 * k if pid == 0 else 4 * k
        return (
            mat((m, k), 1, 2),
            mat((k, n), 3 if pid == 0 else 0, 3),
            mat((m, n), c_share, 6 * k),
        )

    def next_poly_triplet(self, da: int, db: int):
        pid = self.party_id
        p_vals = [2] * (da + 1)
        q_vals = [3] * (db + 1)
        c_vals = [
            6 * (min(k, da) - max(0, k - db) + 1) for k in range(da + db + 1)
        ]

        def share_of(vals, share_vals):
            return ScalarShare(
                Scalar.from_ints(share_vals), Scalar.from_ints([pid * v for v in vals])
            )

        return (
            share_of(p_vals, [1] * (da + 1)),
            share_of(q_vals, [3 if pid == 0 else 0] * (db + 1)),
            share_of(c_vals, c_vals if pid == 0 else [0] * len(c_vals)),
        )


class TrustedDealerSource(PreprocessingPhase):
    """Honest-dealer randomized preprocessing from a shared seed.

    Both parties construct this with the same seed; each keeps only its own
    half.  The dealer samples the MAC key k = k0 + k1, values, and consistent
    MACs.  INSECURE by construction (a real deployment uses the LowGear
    phase); exists for tests/benches exactly like the reference's seeded mock
    lowgear helpers.
    """

    def __init__(self, party_id: int, seed: int = 0, field=Scalar):
        """`field`: the FieldArray subclass shares live in (Curve25519
        `Scalar` default; `bn254.Fr`, ... — the reference's `C: CurveGroup`
        genericity, `online-phase/src/lib.rs:75-78`)."""
        assert party_id in (0, 1)
        self.party_id = party_id
        self.field = field
        self.rng = np.random.default_rng(seed)
        key_halves = self._rand_scalars(2)
        self._mac_key_shares = key_halves
        self.mac_key = key_halves[0] + key_halves[1]

    def _rand_scalars(self, n) -> Scalar:
        return self.field.random(n, self.rng)

    def _deal(self, values: Scalar) -> tuple[ScalarShare, ScalarShare]:
        """Split values into two authenticated shares."""
        n = values.shape[0]
        s0 = self._rand_scalars(n)
        s1 = values - s0
        macs = values * self.mac_key
        m0 = self._rand_scalars(n)
        m1 = macs - m0
        return ScalarShare(s0, m0), ScalarShare(s1, m1)

    def _mine(self, pair):
        return pair[self.party_id]

    def get_mac_key_share(self) -> Scalar:
        return self._mac_key_shares[self.party_id]

    def next_triplet_batch(self, n: int):
        a = self._rand_scalars(n)
        b = self._rand_scalars(n)
        c = a * b
        return (
            self._mine(self._deal(a)),
            self._mine(self._deal(b)),
            self._mine(self._deal(c)),
        )

    def next_shared_value_batch(self, n: int) -> ScalarShare:
        return self._mine(self._deal(self._rand_scalars(n)))

    def next_shared_inverse_pair_batch(self, n: int):
        r = self._rand_scalars(n)
        r_inv = r.inverse()
        return self._mine(self._deal(r)), self._mine(self._deal(r_inv))

    def next_shared_bit_batch(self, n: int) -> ScalarShare:
        bits = self.field.from_ints(self.rng.integers(0, 2, size=n).tolist())
        return self._mine(self._deal(bits))

    # Input masks: the sending party calls `next_local_input_mask_batch` at
    # the same protocol step where the receiver calls
    # `next_counterparty_input_mask_batch`, so both draw the SAME mask and
    # share split from the synchronized dealer stream; each keeps its half.

    def next_local_input_mask_batch(self, n: int):
        mask = self._rand_scalars(n)
        shares = self._deal(mask)
        return mask, self._mine(shares)

    def next_counterparty_input_mask_batch(self, n: int) -> ScalarShare:
        mask = self._rand_scalars(n)
        shares = self._deal(mask)
        return self._mine(shares)

    def next_matrix_triplet(self, m: int, k: int, n: int):
        p = self._rand_scalars(m * k).reshape(m, k)
        q = self._rand_scalars(k * n).reshape(k, n)
        c = p @ q

        def deal_mat(v):
            flat = v.reshape(v.size)
            mine = self._mine(self._deal(flat))
            return mine.reshape(*v.shape)

        return deal_mat(p), deal_mat(q), deal_mat(c)

    def next_poly_triplet(self, da: int, db: int):
        from ..algebra.poly import _conv_coeffs

        p = self._rand_scalars(da + 1)
        q = self._rand_scalars(db + 1)
        c = self.field(_conv_coeffs(p.limbs, q.limbs))
        return (
            self._mine(self._deal(p)),
            self._mine(self._deal(q)),
            self._mine(self._deal(c)),
        )
