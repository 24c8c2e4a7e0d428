"""Frontier shard: URL-seen dedup + politeness + robots + priority queue.

One instance per shard, run as a Ray actor (wrapped in pipelines/crawl.py).
This is the engine's replacement for the reference's process-global visited
array + circular FIFO (`Serial Version/src/crawler.c:443-484,1040-1079`),
redesigned for a 10^10-URL frontier per the north rule:

- URL-seen = counting-bloom front gate -> cuckoo filter -> exact per-shard
  store. Negatives from the filters are authoritative (no exact probe at
  all); positives are CONFIRMED against the exact store, so a filter false
  positive can never drop a URL the reference would crawl. The exact store
  is ``state/seenset.SeenSet``: an in-memory delta set that spills sorted
  hash+URL runs to disk at ``seen_memory_cap`` entries, probed by
  searchsorted over per-run hash arrays with string confirmation from the
  run file (8 bytes of heap per spilled URL instead of a Python string).
- Politeness = per-host virtual-time release scheduling: host h releases at
  most one URL per `crawl_delay_ms(h) * salt_k(h)` of virtual time
  (reference analog: the 200-500 ms sleep, `Serial Version/src/crawler.c:1380`).
- Robots = per-host disallow prefixes (north-rule addition; see state/robots.py).
- Priority = (depth asc, priority desc, discovered_seq asc) heap per host —
  the "depth/priority-ordered URL queue"; priority comes from the OpenMP
  pattern scorer (`OpenMP Version/src/crawler.c:650-732`).
- Failure circuit breaker = per-host consecutive-failure quarantine
  (reference: global 10-consecutive-failure abort, `crawler.c:1075`).

Shard routing & skew (salt splitting): a URL's shard is derived from its
HOST's hash so politeness state is local to one actor; a configured hot host
is salt-split over `salt_k` sub-shards keyed by the URL hash, each sub-shard
enforcing `delay * salt_k`, so the combined fetch rate still respects the
per-host delay with zero cross-actor coordination. See `shard_for`.
"""

from __future__ import annotations

import heapq
import pickle

import numpy as np
import pyarrow as pa

from ..functions.hashing import stable_hash64
from .bloom import CountingBloomFilter
from .cuckoo import CuckooFilter
from .robots import RobotsCache
from .seenset import SeenSet

_SALT_STRIDE = 0x9E3779B1

RELEASE_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("depth", pa.int32()),
        ("priority", pa.int32()),
        ("discovered_seq", pa.int64()),
        ("url_hash", pa.uint64()),
    ]
)


def shard_for(url_hash: int, host_hash: int, salt_k: int, num_shards: int) -> int:
    """Shard id for a canonical URL. salt_k=1 for normal hosts (pure host
    routing); hot hosts fan over salt_k sub-shards keyed by the URL hash."""
    if salt_k > 1:
        sub = url_hash % salt_k
        return (host_hash + sub * _SALT_STRIDE) % num_shards
    return host_hash % num_shards


class FrontierShard:
    """Plain object (Ray-agnostic) so it unit-tests without a cluster."""

    def __init__(
        self,
        shard_id: int,
        num_shards: int,
        expected_urls: int = 100_000,
        robots_rows=None,
        hot_hosts: dict[str, int] | None = None,
        quarantine_after: int = 10,
        use_filters: bool = True,
        seen_spill_dir: str | None = None,
        seen_memory_cap: int | None = None,
        audit: bool = False,
    ):
        self.shard_id = shard_id
        self.num_shards = num_shards
        self.bloom = CountingBloomFilter(expected_urls)
        self.cuckoo = CuckooFilter(expected_urls)
        self.seen_exact = SeenSet(seen_spill_dir, seen_memory_cap)
        self.use_filters = use_filters
        self.pending: dict[str, list] = {}
        self.robots = RobotsCache.from_rows(robots_rows or [])
        self.hot_hosts = dict(hot_hosts or {})
        self.clock_ms = 0.0
        self.next_free_ms: dict[str, float] = {}
        self.host_failures: dict[str, int] = {}
        self.quarantined: set[str] = set()
        self.quarantine_after = quarantine_after
        # Per-shard admission counter; discovered_seq = n*num_shards+shard_id
        # is globally unique and monotone within a shard — deterministic
        # because each shard admits its round's candidates in one sorted call.
        self._next_seq = 0
        self.stats = {
            "admitted": 0,
            "dup": 0,
            "robots_blocked": 0,
            "quarantined_drop": 0,
            "released": 0,
            "filter_false_positives": 0,
        }
        # Politeness-conformance audit mode (diagnostic; off on the hot
        # path). O(hosts) state only: per host we track the last virtual
        # release time, the minimum observed gap, release count, and
        # per-host robots blocks — enough to PROVE the per-host min-gap
        # and robots claims from a finished crawl (north rule: politeness
        # + robots gating), deterministic under the virtual clock.
        self.audit = audit
        self._audit_last_ms: dict[str, float] = {}
        self._audit_min_gap: dict[str, float] = {}
        self._audit_released: dict[str, int] = {}
        self._audit_robots: dict[str, int] = {}

    # -- seen-set hybrid ---------------------------------------------------
    def _seen(self, url: str, h: int) -> bool:
        if self.use_filters:
            if not self.bloom.might_contain(h):
                return False  # authoritative negative
            if not self.cuckoo.degraded and not self.cuckoo.contains(h):
                return False  # authoritative negative
            # Filter positive: confirm against the exact store.
            if url in self.seen_exact:
                return True
            self.stats["filter_false_positives"] += 1
            return False
        return url in self.seen_exact

    def _mark(self, url: str, h: int) -> None:
        if self.use_filters:
            self.bloom.add(h)
            self.cuckoo.add(h)
        self.seen_exact.add(url)

    # -- admission ---------------------------------------------------------
    def admit(self, batch: dict) -> dict:
        """Admit a batch of candidate URLs (dict columns: url, host, depth,
        priority, optional url_hash). Caller must pre-sort by discovery order
        (parent_seq, link_ord) so first-discovery-wins is deterministic;
        discovered_seq is assigned here from the shard-local counter.

        Hot path: the bloom (bulk, vectorized) + cuckoo negatives are
        AUTHORITATIVE — a never-seen URL skips the exact store entirely,
        which is what lets the exact store live (partly) on disk at design
        scale. Only filter positives (true dups + rare false positives)
        probe the SeenSet, whose own fast path is an O(1) in-memory delta
        hit. False positives are counted against the exact store."""
        urls = batch["url"]
        hosts = batch["host"]
        depths = batch["depth"]
        prios = batch["priority"]
        hashes = batch.get("url_hash")
        admitted = dup = robots_blocked = quarantined = 0
        new_hashes: list[int] = []
        # bloom add_many runs AFTER the loop, so same-batch re-occurrences
        # (cross-fetcher dups in a merged round) need a batch-local guard
        # or the bloom-negative shortcut would re-admit them.
        batch_added: set[str] = set()
        maybe = None
        if self.use_filters and hashes is not None:
            h_arr = np.asarray(hashes, dtype=np.uint64)
            # one vectorized pass per batch for BOTH filters; the loop then
            # reads precomputed booleans (dup-heavy rounds probe the cuckoo
            # for every duplicate — per-URL numpy-scalar calls dominated)
            maybe = self.bloom.might_contain_many(h_arr)
            if not self.cuckoo.degraded:
                maybe = maybe & self.cuckoo.contains_many(h_arr)
        for i in range(len(urls)):
            url = str(urls[i])
            host = str(hosts[i])
            if host in self.quarantined:
                quarantined += 1
                continue
            if not self.robots.allowed(host, url):
                robots_blocked += 1
                if self.audit:
                    self._audit_robots[host] = self._audit_robots.get(host, 0) + 1
                continue
            if url in batch_added:
                dup += 1
                continue
            h = int(hashes[i]) if hashes is not None else stable_hash64(url)
            if maybe is not None:
                if not maybe[i]:
                    pass  # authoritative filter negative: definitely new
                elif url in self.seen_exact:
                    dup += 1
                    continue
                else:
                    # filters said "maybe seen"; the exact store disagrees
                    self.stats["filter_false_positives"] += 1
            else:
                # per-item path (callers that pass no url_hash, e.g. seeds)
                if self.use_filters and not self.bloom.might_contain(h):
                    pass
                elif (
                    self.use_filters
                    and not self.cuckoo.degraded  # degraded: can't prove absence
                    and not self.cuckoo.contains(h)
                ):
                    pass
                elif url in self.seen_exact:
                    dup += 1
                    continue
                elif self.use_filters:
                    self.stats["filter_false_positives"] += 1
            batch_added.add(url)
            self.seen_exact.add(url)
            if self.use_filters:
                new_hashes.append(h)
                if not self.cuckoo.add(h):
                    self.stats["cuckoo_degraded"] = 1
            seq = self._next_seq * self.num_shards + self.shard_id
            self._next_seq += 1
            heapq.heappush(
                self.pending.setdefault(host, []),
                (int(depths[i]), -int(prios[i]), seq, url, h),
            )
            admitted += 1
        if self.use_filters and new_hashes:
            self.bloom.add_many(np.array(new_hashes, dtype=np.uint64))
        self.stats["admitted"] += admitted
        self.stats["dup"] += dup
        self.stats["robots_blocked"] += robots_blocked
        self.stats["quarantined_drop"] += quarantined
        return {
            "shard": self.shard_id,
            "admitted": admitted,
            "dup": dup,
            "robots_blocked": robots_blocked,
            "quarantined_drop": quarantined,
        }

    def admit_tables(self, refs: list) -> dict:
        """Direct-shuffle admission: receive the round's fetcher output
        tables (as ObjectRefs; resolved here with zero-copy plasma reads),
        select this shard's rows, and admit in deterministic discovery
        order. This replaces a Ray Data groupby-shuffle for the crawl's
        inner loop: the BFS feedback loop re-executes every round, and a
        per-round Dataset execution carries ~1-2s of fixed scheduling
        latency that dwarfs the actual shuffle at round granularity. On a
        multi-node cluster the fetchers would return per-shard slices so
        each shard pulls only its bytes; single-node plasma makes the
        full-table read zero-copy either way."""
        import time

        import pyarrow.compute as pc

        t0 = time.perf_counter()
        try:
            import ray

            tabs = [ray.get(r) if not isinstance(r, pa.Table) else r for r in refs]
        except ImportError:  # pragma: no cover
            tabs = refs
        t_get = time.perf_counter() - t0
        links_parts = []
        outcome_hosts: list[str] = []
        outcome_ok: list[bool] = []
        fetched_ok = 0
        fetch_failed = 0
        for t in tabs:
            mine = t.filter(pc.equal(t["shard"], self.shard_id))
            if mine.num_rows == 0:
                continue
            is_link = pc.equal(mine["kind"], "link")
            links = mine.filter(is_link)
            outs = mine.filter(pc.invert(is_link))
            if links.num_rows:
                links_parts.append(links)
            if outs.num_rows:
                outcome_hosts.extend(outs["host"].to_pylist())
                oks = outs["link_ord"].to_pylist()
                outcome_ok.extend(bool(x) for x in oks)
        t_filter = time.perf_counter() - t0 - t_get
        if outcome_hosts:
            self.record_outcomes(outcome_hosts, outcome_ok)
            fetched_ok = sum(outcome_ok)
            fetch_failed = len(outcome_ok) - fetched_ok
        stats = {"shard": self.shard_id, "admitted": 0, "dup": 0,
                 "robots_blocked": 0, "quarantined_drop": 0}
        if links_parts:
            merged = pa.concat_tables(links_parts).sort_by(
                [("parent_seq", "ascending"), ("link_ord", "ascending")]
            )
            stats = self.admit(
                {
                    "url": merged["url"].to_pylist(),
                    "host": merged["host"].to_pylist(),
                    "depth": merged["depth"].to_pylist(),
                    "priority": merged["priority"].to_pylist(),
                    "url_hash": merged["url_hash"].to_pylist(),
                }
            )
        stats["fetched_ok"] = fetched_ok
        stats["fetch_failed"] = fetch_failed
        stats["t_get"] = round(t_get, 3)
        stats["t_filter"] = round(t_filter, 3)
        stats["t_total"] = round(time.perf_counter() - t0, 3)
        return stats

    # -- politeness-gated release -------------------------------------------
    def _effective_delay(self, host: str) -> float:
        return float(self.robots.crawl_delay_ms(host)) * self.hot_hosts.get(host, 1)

    def release(self, budget_ms: float, max_urls: int | None = None) -> pa.Table:
        """Advance the virtual clock by ``budget_ms`` and release every
        pending URL whose host's politeness window opens inside it, in
        (depth, -priority, seq) order per host."""
        end = self.clock_ms + budget_ms
        out = {
            k: []
            for k in ("url", "host", "depth", "priority", "discovered_seq", "url_hash")
        }
        n = 0
        for host in sorted(self.pending.keys()):
            if host in self.quarantined:
                continue
            heap = self.pending[host]
            delay = self._effective_delay(host)
            t = max(self.next_free_ms.get(host, self.clock_ms), self.clock_ms)
            while heap and t < end:
                if max_urls is not None and n >= max_urls:
                    break
                depth, negp, seq, url, uh = heapq.heappop(heap)
                if self.audit:
                    last = self._audit_last_ms.get(host)
                    if last is not None:
                        gap = t - last
                        cur = self._audit_min_gap.get(host)
                        if cur is None or gap < cur:
                            self._audit_min_gap[host] = gap
                    self._audit_last_ms[host] = t
                    self._audit_released[host] = self._audit_released.get(host, 0) + 1
                out["url"].append(url)
                out["host"].append(host)
                out["depth"].append(depth)
                out["priority"].append(-negp)
                out["discovered_seq"].append(seq)
                out["url_hash"].append(uh)
                t += delay
                n += 1
            self.next_free_ms[host] = t
            if max_urls is not None and n >= max_urls:
                break
        self.clock_ms = end
        self.stats["released"] += n
        return pa.table(
            {
                "url": pa.array(out["url"], pa.string()),
                "host": pa.array(out["host"], pa.string()),
                "depth": pa.array(out["depth"], pa.int32()),
                "priority": pa.array(out["priority"], pa.int32()),
                "discovered_seq": pa.array(out["discovered_seq"], pa.int64()),
                "url_hash": pa.array(out["url_hash"], pa.uint64()),
            }
        )

    def record_outcomes(self, hosts: list[str], ok_flags: list[bool]) -> None:
        """Per-host failure circuit breaker (reference analog: abort after 10
        consecutive failures; here: quarantine the host)."""
        for host, ok in zip(hosts, ok_flags):
            if ok:
                self.host_failures[host] = 0
            else:
                c = self.host_failures.get(host, 0) + 1
                self.host_failures[host] = c
                if c >= self.quarantine_after:
                    self.quarantined.add(host)

    def pending_count(self) -> int:
        return sum(len(v) for v in self.pending.values())

    # -- seen-set compaction (LSM-style; crawl checkpoint drives it) -------
    def maybe_compact_seen(self, max_runs: int = 4) -> int:
        """Merge spilled seen-set runs when they exceed ``max_runs`` (each
        run costs one searchsorted per membership probe). Obsolete run
        files are retained until gc_seen_runs() — the last durable
        checkpoint may still reference them."""
        if self.seen_exact.run_count > max_runs:
            self._obsolete_seen_runs = getattr(
                self, "_obsolete_seen_runs", []
            ) + self.seen_exact.compact()
        return self.seen_exact.run_count

    def gc_seen_runs(self) -> int:
        """Unlink runs obsoleted by compaction — call ONLY after a
        checkpoint that references the compacted state is durable. Crash
        before this leaks the files (harmless; the old manifest's runs are
        intact)."""
        import os as _os

        n = 0
        for p in getattr(self, "_obsolete_seen_runs", []):
            try:
                _os.unlink(p)
                n += 1
            except FileNotFoundError:
                pass
        self._obsolete_seen_runs = []
        return n

    def get_stats(self) -> dict:
        return dict(self.stats, pending=self.pending_count(), shard=self.shard_id)

    def politeness_audit(self) -> pa.Table:
        """Per-host politeness/robots conformance rows (requires
        ``audit=True``). One row per host this shard released or
        robots-blocked: the minimum observed virtual gap between releases
        must be >= the host's effective crawl delay (crawl_delay x hot-host
        salt factor — each sub-shard of a salted host spaces its own stream
        salt_k x delay apart so the host's AGGREGATE rate honors the
        delay). Deterministic under the virtual clock."""
        if not getattr(self, "audit", False):
            raise RuntimeError("politeness_audit requires FrontierShard(audit=True)")
        hosts = sorted(set(self._audit_released) | set(self._audit_robots))
        rows = []
        for h in hosts:
            delay = self._effective_delay(h)
            min_gap = self._audit_min_gap.get(h)
            n_rel = self._audit_released.get(h, 0)
            rows.append(
                {
                    "host": h,
                    "shard": self.shard_id,
                    "n_released": n_rel,
                    # -1.0 = fewer than 2 releases, no gap to measure
                    "min_gap_ms": -1.0 if min_gap is None else round(min_gap, 6),
                    "effective_delay_ms": round(delay, 6),
                    "robots_blocked": self._audit_robots.get(h, 0),
                    # 1e-6 absorbs float accumulation in the virtual clock
                    "politeness_ok": min_gap is None or min_gap + 1e-6 >= delay,
                }
            )
        schema = pa.schema(
            [
                ("host", pa.string()),
                ("shard", pa.int32()),
                ("n_released", pa.int64()),
                ("min_gap_ms", pa.float64()),
                ("effective_delay_ms", pa.float64()),
                ("robots_blocked", pa.int64()),
                ("politeness_ok", pa.bool_()),
            ]
        )
        return pa.Table.from_pylist(rows, schema=schema)

    def seen_count(self) -> int:
        return len(self.seen_exact)

    def runtime_node(self) -> str:
        """Node this actor landed on — placement diagnostics."""
        from ..functions.placement import current_node_id

        return current_node_id()

    # -- snapshot / restore (per-partition checkpoint payload) -------------
    def snapshot(self) -> bytes:
        return pickle.dumps(
            {
                "shard_id": self.shard_id,
                "num_shards": self.num_shards,
                "bloom": self.bloom.to_state(),
                "cuckoo": self.cuckoo.to_state(),
                # paths + delta only — spilled runs are immutable files on
                # disk and are NOT re-serialized into the checkpoint payload
                "seen_exact": self.seen_exact.to_state(),
                "use_filters": self.use_filters,
                "pending": {h: sorted(v) for h, v in self.pending.items()},
                "robots": self.robots,
                "hot_hosts": self.hot_hosts,
                "clock_ms": self.clock_ms,
                "next_free_ms": self.next_free_ms,
                "host_failures": self.host_failures,
                "quarantined": sorted(self.quarantined),
                "quarantine_after": self.quarantine_after,
                "stats": self.stats,
                "next_seq": self._next_seq,
            }
        )

    def snapshot_to(self, path: str) -> int:
        """Write this shard's checkpoint payload to ``path`` from INSIDE the
        actor (tmp + atomic rename). All shards serialize and write in
        parallel; the driver only awaits — with 32 shards the pre-allocated
        filter state is ~80 MB total, which the round-2 driver wrote
        serially (~2-4 s of Amdahl serial time per checkpoint at bench
        scale). Assumes the checkpoint dir is reachable from every node
        (shared storage on a real cluster — the standard checkpoint
        contract)."""
        import os

        payload = self.snapshot()
        tmp = f"{path}.tmp"
        with open(tmp, "wb") as f:
            f.write(payload)
        os.replace(tmp, path)
        return len(payload)

    @classmethod
    def restore(cls, payload: bytes) -> "FrontierShard":
        st = pickle.loads(payload)
        f = cls.__new__(cls)
        f.shard_id = st["shard_id"]
        f.num_shards = st["num_shards"]
        f.bloom = CountingBloomFilter.from_state(st["bloom"])
        f.cuckoo = CuckooFilter.from_state(st["cuckoo"])
        f.seen_exact = SeenSet.from_state(st["seen_exact"])
        f.use_filters = st["use_filters"]
        f.pending = {h: list(v) for h, v in st["pending"].items()}
        for heap in f.pending.values():
            heapq.heapify(heap)
        f.robots = st["robots"]
        f.hot_hosts = st["hot_hosts"]
        f.clock_ms = st["clock_ms"]
        f.next_free_ms = st["next_free_ms"]
        f.host_failures = st["host_failures"]
        f.quarantined = set(st["quarantined"])
        f.quarantine_after = st["quarantine_after"]
        f.stats = st["stats"]
        f._next_seq = st["next_seq"]
        # audit mode is a diagnostic, not crawl state: a restored shard
        # starts with audit off and empty audit tallies
        f.audit = False
        f._audit_last_ms = {}
        f._audit_min_gap = {}
        f._audit_released = {}
        f._audit_robots = {}
        return f
