"""Counting Bloom filter (numpy uint8 counters, saturating).

The reference's URL-seen set is an exact linear scan over a 1000-entry array
(`Serial Version/src/crawler.c:443-484`); the north rule replaces it with a
sharded counting-bloom + cuckoo hybrid sized for a 10^10-URL frontier. This
counting bloom is the cheap front gate: a negative is authoritative, a
positive falls through to the cuckoo filter / exact store (state/frontier.py).

Counting (not plain) so evicted/expired URLs can be *removed* — e.g. when a
host is quarantined and its pending URLs are dropped, or when re-crawl
windows reopen. Counters saturate at 255 and then never decrement (standard
counting-bloom practice) so deletes cannot corrupt other keys.
"""

from __future__ import annotations

import math

import numpy as np

_MASK64 = 0xFFFFFFFFFFFFFFFF


def _mix(h: int) -> int:
    # splitmix64 finalizer
    h = (h ^ (h >> 30)) * 0xBF58476D1CE4E5B9 & _MASK64
    h = (h ^ (h >> 27)) * 0x94D049BB133111EB & _MASK64
    return h ^ (h >> 31)


class CountingBloomFilter:
    def __init__(self, capacity: int, fp_rate: float = 0.01):
        capacity = max(1, capacity)
        self.capacity = capacity
        self.fp_rate = fp_rate
        m = max(8, int(-capacity * math.log(fp_rate) / (math.log(2) ** 2)))
        self.m = m
        self.k = max(1, round(m / capacity * math.log(2)))
        self.counters = np.zeros(m, dtype=np.uint8)
        self.n_items = 0

    def _indices(self, h: int) -> np.ndarray:
        # Kirsch-Mitzenmacher double hashing; MUST agree bit-for-bit with
        # the vectorized path (uint64 wraparound), so it delegates.
        return self._indices_many(np.array([h], dtype=np.uint64))[0]

    def add(self, h: int) -> None:
        idx = self._indices(h).astype(np.int64)
        c = self.counters[idx]
        self.counters[idx] = np.where(c < 255, c + 1, c)
        self.n_items += 1

    def remove(self, h: int) -> None:
        idx = self._indices(h).astype(np.int64)
        c = self.counters[idx]
        # Never decrement a saturated or zero counter.
        self.counters[idx] = np.where((c > 0) & (c < 255), c - 1, c)
        self.n_items = max(0, self.n_items - 1)

    def might_contain(self, h: int) -> bool:
        idx = self._indices(h).astype(np.int64)
        return bool((self.counters[idx] > 0).all())

    def add_many(self, hashes: np.ndarray) -> None:
        """Vectorized insert of a batch of 64-bit key hashes (saturating)."""
        if hashes.size == 0:
            return
        idx = self._indices_many(hashes).ravel()
        cnt = np.bincount(idx, minlength=self.m).astype(np.uint16)
        # saturated counters stay saturated: min(255, c + cnt)
        self.counters = np.minimum(self.counters.astype(np.uint16) + cnt, 255).astype(
            np.uint8
        )
        self.n_items += int(hashes.size)

    def _indices_many(self, hashes: np.ndarray) -> np.ndarray:
        h = hashes.astype(np.uint64)
        h1 = h.copy()
        h1 ^= h1 >> np.uint64(30)
        h1 *= np.uint64(0xBF58476D1CE4E5B9)
        h1 ^= h1 >> np.uint64(27)
        h1 *= np.uint64(0x94D049BB133111EB)
        h1 ^= h1 >> np.uint64(31)
        h2 = h1.copy()
        h2 ^= h2 >> np.uint64(30)
        h2 *= np.uint64(0xBF58476D1CE4E5B9)
        h2 ^= h2 >> np.uint64(27)
        h2 *= np.uint64(0x94D049BB133111EB)
        h2 ^= h2 >> np.uint64(31)
        h2 |= np.uint64(1)
        ks = np.arange(self.k, dtype=np.uint64)[None, :]
        return ((h1[:, None] + ks * h2[:, None]) % np.uint64(self.m)).astype(np.int64)

    def might_contain_many(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized membership for a batch of 64-bit key hashes."""
        if hashes.size == 0:
            return np.zeros(0, dtype=bool)
        idx = self._indices_many(hashes)
        return (self.counters[idx] > 0).all(axis=1)

    # -- snapshot / restore ------------------------------------------------
    def to_state(self) -> dict:
        return {
            "capacity": self.capacity,
            "fp_rate": self.fp_rate,
            "n_items": self.n_items,
            "counters": self.counters.tobytes(),
        }

    @classmethod
    def from_state(cls, state: dict) -> "CountingBloomFilter":
        f = cls(state["capacity"], state["fp_rate"])
        f.counters = np.frombuffer(state["counters"], dtype=np.uint8).copy()
        f.m = f.counters.shape[0]
        f.n_items = state["n_items"]
        return f
