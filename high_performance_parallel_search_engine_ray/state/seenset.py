"""Spill-backed exact URL-seen store (the frontier's design-scale store).

The frontier docstring's contract (`state/frontier.py`): the bloom/cuckoo
filters are the front gate; the EXACT store behind them must hold 10^10/shards
URLs without holding 10^10/shards Python strings on the heap. This class is
that store:

- ``_delta``: a small in-memory set of recently added URLs (bounded by
  ``memory_cap``).
- ``_runs``: immutable sorted-by-hash runs spilled to disk when the delta
  fills. Per run the heap keeps ONLY the sorted uint64 hash array
  (8 bytes/URL, ~10x less than a Python str set); the URL strings live in
  the run's parquet file, read back one row group at a time for exact
  string confirmation on a hash hit (a 64-bit hash match alone is not
  "seen": at 10^10 URLs a couple of collisions are expected, and a
  collision would silently drop a URL the reference would crawl).

Probe cost model: membership checks that reach this store have already
passed the bloom+cuckoo gates, i.e. they are true duplicates or rare filter
false positives. A probe is O(1) delta-set hit, else per run one
np.searchsorted (in-memory) and — only when the hash matches — one cached
row-group read. Row groups are small (8k URLs) and dup probes cluster on hot
URLs, so the tiny LRU absorbs almost all disk reads.

Spill files are written atomically (tmp + rename) under ``spill_dir`` and
are immutable afterwards, so crawl checkpoints only record their paths
(``to_state``), not their contents — restore re-opens them in place.

Reference analog: the visited array (`Serial Version/src/crawler.c:443-484`)
— a process-global linear scan over full URL strings, the very thing this
replaces at scale.
"""

from __future__ import annotations

import os
import uuid
from collections import OrderedDict

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.hashing import stable_hash64

_ROW_GROUP = 8192
_RG_CACHE = 8


class SeenSet:
    """Exact set of URL strings with optional disk spilling.

    Drop-in for the plain ``set`` it replaces: supports ``in``, ``add``,
    ``len``, iteration, and ``==`` (tests compare whole stores). With
    ``spill_dir=None`` or ``memory_cap=None`` it never spills (pure
    in-memory behavior, the small-crawl fast path).
    """

    def __init__(self, spill_dir: str | None = None, memory_cap: int | None = None):
        self.spill_dir = spill_dir
        self.memory_cap = memory_cap
        self._delta: set[str] = set()
        self._run_paths: list[str] = []
        self._run_hashes: list[np.ndarray] = []  # sorted uint64 per run
        self._rg_cache: OrderedDict[tuple[int, int], list[str]] = OrderedDict()

    # -- core set protocol -------------------------------------------------
    def __contains__(self, url: str) -> bool:
        if url in self._delta:
            return True
        if not self._run_paths:
            return False
        h = np.uint64(stable_hash64(url))
        for ri in range(len(self._run_paths)):
            hs = self._run_hashes[ri]
            lo = int(np.searchsorted(hs, h, side="left"))
            hi = int(np.searchsorted(hs, h, side="right"))
            for idx in range(lo, hi):  # hash hit -> confirm the string
                if self._url_at(ri, idx) == url:
                    return True
        return False

    def add(self, url: str) -> None:
        # idempotent like set.add: a URL already in a spilled run must not
        # re-enter the delta (it would double-count len and duplicate
        # iteration). The probe is O(1) for delta residents; for genuinely
        # new URLs the run check is a few searchsorted's over in-memory
        # hash arrays (the crawl's admission path has already established
        # novelty via the filter gate, so this is belt-and-braces).
        if self._run_paths and url not in self._delta and url in self:
            return
        self._delta.add(url)
        if (
            self.memory_cap is not None
            and self.spill_dir is not None
            and len(self._delta) >= self.memory_cap
        ):
            self._spill()

    def __len__(self) -> int:
        return len(self._delta) + sum(len(h) for h in self._run_hashes)

    def __iter__(self):
        yield from self._delta
        for ri, path in enumerate(self._run_paths):
            t = pq.read_table(path, columns=["url"])
            yield from t["url"].to_pylist()

    def __eq__(self, other) -> bool:
        if isinstance(other, (SeenSet, set, frozenset)):
            return set(self) == set(other)
        return NotImplemented

    def __ne__(self, other) -> bool:
        eq = self.__eq__(other)
        return NotImplemented if eq is NotImplemented else not eq

    # -- spilling ----------------------------------------------------------
    def _spill(self) -> None:
        os.makedirs(self.spill_dir, exist_ok=True)
        urls = list(self._delta)
        hashes = np.array([stable_hash64(u) for u in urls], dtype=np.uint64)
        order = np.argsort(hashes, kind="stable")
        hashes = hashes[order]
        urls = [urls[i] for i in order]
        t = pa.table(
            {"hash": pa.array(hashes, pa.uint64()), "url": pa.array(urls, pa.string())}
        )
        path = os.path.join(self.spill_dir, f"run-{uuid.uuid4().hex}.parquet")
        tmp = path + ".tmp"
        pq.write_table(t, tmp, row_group_size=_ROW_GROUP)
        os.replace(tmp, path)
        self._run_paths.append(path)
        self._run_hashes.append(hashes)
        self._delta = set()

    def _url_at(self, run_idx: int, idx: int) -> str:
        rg = idx // _ROW_GROUP
        key = (run_idx, rg)
        urls = self._rg_cache.get(key)
        if urls is None:
            pf = pq.ParquetFile(self._run_paths[run_idx])
            urls = pf.read_row_group(rg, columns=["url"])["url"].to_pylist()
            self._rg_cache[key] = urls
            if len(self._rg_cache) > _RG_CACHE:
                self._rg_cache.popitem(last=False)
        else:
            self._rg_cache.move_to_end(key)
        return urls[idx % _ROW_GROUP]

    @property
    def run_count(self) -> int:
        return len(self._run_paths)

    def compact(self) -> list[str]:
        """Merge all spilled runs into one (k-way streaming merge over row
        groups — memory stays one row group per run, never the full store)
        and return the now-obsolete run paths. The CALLER owns deletion:
        old runs may still be referenced by the last durable checkpoint, so
        they must only be unlinked after a checkpoint that references the
        compacted state lands (LSM-style garbage collection; see
        FrontierShard.maybe_compact / ShardedCrawl._checkpoint). A crash
        between compaction and that checkpoint leaves the old manifest
        pointing at the old runs — still on disk, still correct; the
        compacted file simply leaks (harmless)."""
        import heapq

        if len(self._run_paths) <= 1:
            return []

        def run_iter(path):
            pf = pq.ParquetFile(path)
            for rg in range(pf.num_row_groups):
                t = pf.read_row_group(rg)
                yield from zip(t["hash"].to_numpy().tolist(), t["url"].to_pylist())

        out_path = os.path.join(self.spill_dir, f"run-{uuid.uuid4().hex}.parquet")
        tmp = out_path + ".tmp"
        schema = pa.schema([("hash", pa.uint64()), ("url", pa.string())])
        writer = pq.ParquetWriter(tmp, schema)
        merged_hashes: list[int] = []
        buf_h: list[int] = []
        buf_u: list[str] = []

        def flush():
            writer.write_table(
                pa.table(
                    {"hash": pa.array(buf_h, pa.uint64()),
                     "url": pa.array(buf_u, pa.string())}
                ),
                row_group_size=_ROW_GROUP,
            )
            merged_hashes.extend(buf_h)
            buf_h.clear()
            buf_u.clear()

        for h, u in heapq.merge(*(run_iter(p) for p in self._run_paths)):
            buf_h.append(h)
            buf_u.append(u)
            if len(buf_h) >= _ROW_GROUP:
                flush()
        if buf_h:
            flush()
        writer.close()
        os.replace(tmp, out_path)
        obsolete = list(self._run_paths)
        self._run_paths = [out_path]
        self._run_hashes = [np.array(merged_hashes, dtype=np.uint64)]
        self._rg_cache.clear()
        return obsolete

    # -- checkpoint state (runs are immutable on-disk; record paths only) --
    def to_state(self) -> dict:
        return {
            "spill_dir": self.spill_dir,
            "memory_cap": self.memory_cap,
            "delta": sorted(self._delta),
            "run_paths": list(self._run_paths),
        }

    @classmethod
    def from_state(cls, st) -> "SeenSet":
        # Backward compat: older checkpoints stored a plain sorted URL list.
        if isinstance(st, (list, tuple)):
            s = cls()
            s._delta = set(st)
            return s
        s = cls(spill_dir=st["spill_dir"], memory_cap=st["memory_cap"])
        s._delta = set(st["delta"])
        for path in st["run_paths"]:
            hs = pq.read_table(path, columns=["hash"])["hash"].to_numpy()
            s._run_paths.append(path)
            s._run_hashes.append(hs.astype(np.uint64))
        return s
