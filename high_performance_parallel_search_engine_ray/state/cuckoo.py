"""Cuckoo filter (4-way buckets, 16-bit fingerprints, partial-key eviction).

Second stage of the frontier's URL-seen hybrid (north rule): the counting
bloom is the cheap front gate, the cuckoo filter supports deletes and lower
sustained false-positive rates, and an exact per-shard store confirms
positives so a bloom/cuckoo false positive can never drop a URL the
reference crawler would visit (SURVEY.md §7 "hard parts").

Deterministic: the eviction victim choice uses an internal LCG, not
``random``, so snapshots and replays are bit-stable.
"""

from __future__ import annotations

import numpy as np

_MASK64 = 0xFFFFFFFFFFFFFFFF
BUCKET_SIZE = 4
MAX_KICKS = 500


def _mix(h: int) -> int:
    h = (h ^ (h >> 30)) * 0xBF58476D1CE4E5B9 & _MASK64
    h = (h ^ (h >> 27)) * 0x94D049BB133111EB & _MASK64
    return h ^ (h >> 31)


class CuckooFilter:
    def __init__(self, capacity: int):
        # Power-of-two bucket count sized for ~95% load headroom.
        nbuckets = 1
        while nbuckets * BUCKET_SIZE < max(8, int(capacity / 0.95)):
            nbuckets <<= 1
        self.nbuckets = nbuckets
        self.table = np.zeros((nbuckets, BUCKET_SIZE), dtype=np.uint16)  # 0 = empty
        self.n_items = 0
        self._lcg = 0x9E3779B97F4A7C15
        # Set on the first failed insert. A full cuckoo filter would other-
        # wise pay MAX_KICKS evictions per add (a ~5ms/URL death spiral under
        # host skew) AND lose previously-inserted fingerprints to evictions,
        # breaking the authoritative-negative property. Once degraded, adds
        # are skipped and `contains` can no longer prove absence — callers
        # (FrontierShard) must fall back to the exact store, and the
        # condition is surfaced in stats/snapshots for resizing at the next
        # checkpoint compaction.
        self.degraded = False

    def _fingerprint(self, h: int) -> int:
        fp = _mix(h) & 0xFFFF
        return fp if fp != 0 else 1

    def _index1(self, h: int) -> int:
        return _mix(h ^ 0xA5A5A5A5) & (self.nbuckets - 1)

    def _alt_index(self, idx: int, fp: int) -> int:
        return (idx ^ _mix(fp)) & (self.nbuckets - 1)

    def _rand(self, bound: int) -> int:
        self._lcg = (self._lcg * 6364136223846793005 + 1442695040888963407) & _MASK64
        return (self._lcg >> 33) % bound

    def _bucket_insert(self, idx: int, fp: int) -> bool:
        row = self.table[idx]
        empty = np.nonzero(row == 0)[0]
        if empty.size:
            row[empty[0]] = fp
            return True
        return False

    def add(self, h: int) -> bool:
        """Insert; False when the filter is full (caller should grow/rotate)."""
        if self.degraded:
            return False
        fp = self._fingerprint(h)
        i1 = self._index1(h)
        i2 = self._alt_index(i1, fp)
        if self._bucket_insert(i1, fp) or self._bucket_insert(i2, fp):
            self.n_items += 1
            return True
        idx = i1 if self._rand(2) == 0 else i2
        for _ in range(MAX_KICKS):
            slot = self._rand(BUCKET_SIZE)
            fp, self.table[idx, slot] = int(self.table[idx, slot]), fp
            idx = self._alt_index(idx, fp)
            if self._bucket_insert(idx, fp):
                self.n_items += 1
                return True
        self.degraded = True
        return False

    def contains(self, h: int) -> bool:
        fp = self._fingerprint(h)
        i1 = self._index1(h)
        if (self.table[i1] == fp).any():
            return True
        i2 = self._alt_index(i1, fp)
        return bool((self.table[i2] == fp).any())

    def contains_many(self, hashes: np.ndarray) -> np.ndarray:
        """Vectorized membership probe over a uint64 hash array — the
        admission hot path calls this once per batch instead of paying
        numpy-scalar overhead per URL. Bit-identical to contains()."""

        def mixv(x: np.ndarray) -> np.ndarray:
            x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            return x ^ (x >> np.uint64(31))

        h = hashes.astype(np.uint64)
        with np.errstate(over="ignore"):
            fp = (mixv(h) & np.uint64(0xFFFF)).astype(np.uint16)
            fp[fp == 0] = 1
            i1 = (mixv(h ^ np.uint64(0xA5A5A5A5)) & np.uint64(self.nbuckets - 1)).astype(
                np.int64
            )
            i2 = (i1.astype(np.uint64) ^ mixv(fp.astype(np.uint64))) & np.uint64(
                self.nbuckets - 1
            )
        hit1 = (self.table[i1] == fp[:, None]).any(axis=1)
        hit2 = (self.table[i2.astype(np.int64)] == fp[:, None]).any(axis=1)
        return hit1 | hit2

    def remove(self, h: int) -> bool:
        fp = self._fingerprint(h)
        for idx in (self._index1(h), self._alt_index(self._index1(h), fp)):
            row = self.table[idx]
            hit = np.nonzero(row == fp)[0]
            if hit.size:
                row[hit[0]] = 0
                self.n_items -= 1
                return True
        return False

    # -- snapshot / restore ------------------------------------------------
    def to_state(self) -> dict:
        return {
            "nbuckets": self.nbuckets,
            "n_items": self.n_items,
            "lcg": self._lcg,
            "degraded": self.degraded,
            "table": self.table.tobytes(),
        }

    @classmethod
    def from_state(cls, state: dict) -> "CuckooFilter":
        f = cls.__new__(cls)
        f.nbuckets = state["nbuckets"]
        f.table = (
            np.frombuffer(state["table"], dtype=np.uint16)
            .reshape(state["nbuckets"], BUCKET_SIZE)
            .copy()
        )
        f.n_items = state["n_items"]
        f._lcg = state["lcg"]
        f.degraded = state.get("degraded", False)
        return f
