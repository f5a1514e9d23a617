"""Offline-phase data structures: sizing, stores, and the prep result.

Analog of `offline-phase/src/structs.rs`: `OfflineSizingParams`
(`structs.rs:27-37`), the generated-material stores, and `LowGearPrep`
(`structs.rs:122-196`) which implements `PreprocessingPhase` so the online
fabric consumes offline output directly.  The reference's `ValueMacBatch`
vector-of-(share,mac) is our batched `ScalarShare` itself.

Stores are serializable (numpy .npz) for the checkpoint/resume behavior the
reference gets from serde on its offline types (SURVEY §5 checkpoint note:
offline material is persistable; the online phase is re-runnable).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from ..algebra.limbs import NLIMBS
from ..algebra.scalar import Scalar
from ..algebra.share import ScalarShare
from .base import PreprocessingPhase


@dataclass
class OfflineSizingParams:
    """How much of each material to generate (`structs.rs:27-37`)."""

    num_triples: int = 1 << 12
    num_inverse_pairs: int = 1 << 10
    num_bits: int = 1 << 10
    num_randomness: int = 1 << 10
    num_input_masks: int = 1 << 10


class _Store:
    """FIFO store of batched ScalarShares, consumed via split-off
    (`structs.rs` LowGearPrep consuming stores via `split_off`)."""

    def __init__(self, parts: int):
        self.parts = parts
        self.items: list[tuple] = []  # list of tuples of ScalarShare

    def add(self, *shares):
        assert len(shares) == self.parts
        self.items.append(tuple(shares))

    def __len__(self):
        return sum(int(t[0].size) for t in self.items)

    def take(self, n: int):
        """Pop n elements (concatenating/splitting stored batches)."""
        taken: list[list[ScalarShare]] = [[] for _ in range(self.parts)]
        need = n
        while need > 0:
            if not self.items:
                raise RuntimeError(
                    f"offline store exhausted: need {need} more elements"
                )
            batch = self.items.pop(0)
            size = int(batch[0].size)
            if size <= need:
                for i, s in enumerate(batch):
                    taken[i].append(s)
                need -= size
            else:
                for i, s in enumerate(batch):
                    taken[i].append(s[:need])
                self.items.insert(0, tuple(s[need:] for s in batch))
                need = 0
        out = tuple(
            ScalarShare.concatenate(parts) if len(parts) > 1 else parts[0]
            for parts in taken
        )
        return out if self.parts > 1 else out[0]


@dataclass
class LowGearPrep(PreprocessingPhase):
    """Offline result consumed by the online fabric (`structs.rs:122-196`)."""

    mac_key_share: Scalar
    triples: _Store = field(default_factory=lambda: _Store(3))
    inverse_pairs: _Store = field(default_factory=lambda: _Store(2))
    bits: _Store = field(default_factory=lambda: _Store(1))
    randomness: _Store = field(default_factory=lambda: _Store(1))
    # input masks: (my cleartext masks, my shares of them) and counterparty
    my_masks_clear: list = field(default_factory=list)
    my_mask_shares: _Store = field(default_factory=lambda: _Store(1))
    counterparty_mask_shares: _Store = field(default_factory=lambda: _Store(1))

    def get_mac_key_share(self) -> Scalar:
        return self.mac_key_share

    def next_triplet_batch(self, n: int):
        return self.triples.take(n)

    def next_shared_inverse_pair_batch(self, n: int):
        return self.inverse_pairs.take(n)

    def next_shared_bit_batch(self, n: int):
        return self.bits.take(n)

    def next_shared_value_batch(self, n: int):
        return self.randomness.take(n)

    def next_local_input_mask_batch(self, n: int):
        # consume n cleartext masks across stored batches
        taken: list[Scalar] = []
        need = n
        while need > 0:
            if not self.my_masks_clear:
                raise RuntimeError("input-mask store exhausted")
            batch = self.my_masks_clear.pop(0)
            if batch.size <= need:
                taken.append(batch)
                need -= batch.size
            else:
                taken.append(batch[:need])
                self.my_masks_clear.insert(0, batch[need:])
                need = 0
        clear = taken[0] if len(taken) == 1 else Scalar.concatenate(taken)
        return clear, self.my_mask_shares.take(n)

    def next_counterparty_input_mask_batch(self, n: int):
        return self.counterparty_mask_shares.take(n)

    # -- persistence (checkpoint/resume parity) ----------------------------
    def save(self, path: str):
        arrays = {"mac_key": np.asarray(jax.device_get(self.mac_key_share.limbs))}
        for name, store in self._stores().items():
            for idx, batch in enumerate(store.items):
                for j, share in enumerate(batch):
                    arrays[f"{name}.{idx}.{j}.share"] = np.asarray(
                        jax.device_get(share.share.limbs))
                    arrays[f"{name}.{idx}.{j}.mac"] = np.asarray(
                        jax.device_get(share.mac.limbs))
        for idx, clear in enumerate(self.my_masks_clear):
            arrays[f"masks_clear.{idx}"] = np.asarray(jax.device_get(clear.limbs))
        np.savez_compressed(path, **arrays)

    @classmethod
    def load(cls, path: str) -> "LowGearPrep":
        data = np.load(path)
        prep = cls(mac_key_share=Scalar(jnp.asarray(data["mac_key"])))
        stores = prep._stores()
        batches: dict = {}
        for key in data.files:
            if key in ("mac_key",) or key.startswith("masks_clear."):
                continue
            name, idx, j, kind = key.rsplit(".", 3)
            batches.setdefault((name, int(idx)), {}).setdefault(int(j), {})[
                kind
            ] = jnp.asarray(data[key])
        for (name, idx) in sorted(batches, key=lambda t: t[1]):
            parts = batches[(name, idx)]
            shares = tuple(
                ScalarShare(Scalar(parts[j]["share"]), Scalar(parts[j]["mac"]))
                for j in sorted(parts)
            )
            stores[name].add(*shares)
        n_clear = sum(1 for k in data.files if k.startswith("masks_clear."))
        for idx in range(n_clear):
            prep.my_masks_clear.append(Scalar(jnp.asarray(data[f"masks_clear.{idx}"])))
        return prep

    def _stores(self):
        return {
            "triples": self.triples,
            "inverse_pairs": self.inverse_pairs,
            "bits": self.bits,
            "randomness": self.randomness,
            "my_mask_shares": self.my_mask_shares,
            "counterparty_mask_shares": self.counterparty_mask_shares,
        }
