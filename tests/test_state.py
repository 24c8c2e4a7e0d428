"""Counting bloom, cuckoo filter, frontier shard: admit/dedupe/politeness/
robots/snapshot semantics (SURVEY.md §5.4)."""

import numpy as np
import pyarrow as pa

from high_performance_parallel_search_engine_ray.functions.hashing import stable_hash64
from high_performance_parallel_search_engine_ray.state.bloom import CountingBloomFilter
from high_performance_parallel_search_engine_ray.state.cuckoo import CuckooFilter
from high_performance_parallel_search_engine_ray.state.frontier import (
    FrontierShard,
    shard_for,
)


def test_bloom_membership_and_counting():
    f = CountingBloomFilter(10_000, 0.01)
    keys = [stable_hash64(f"url-{i}") for i in range(5000)]
    for k in keys:
        f.add(k)
    assert all(f.might_contain(k) for k in keys)
    others = np.array([stable_hash64(f"other-{i}") for i in range(5000)], dtype=np.uint64)
    fp = int(f.might_contain_many(others).sum())
    assert fp < 200  # ~1% design rate
    # counting: remove restores negatives (unsaturated counters)
    f2 = CountingBloomFilter(1000, 0.01)
    h = stable_hash64("x")
    f2.add(h)
    assert f2.might_contain(h)
    f2.remove(h)
    assert not f2.might_contain(h)


def test_bloom_vectorized_agrees_with_scalar():
    f = CountingBloomFilter(2000, 0.01)
    keys = [stable_hash64(f"k{i}") for i in range(1000)]
    for k in keys[:500]:
        f.add(k)
    arr = np.array(keys, dtype=np.uint64)
    vec = f.might_contain_many(arr)
    for k, v in zip(keys, vec):
        assert f.might_contain(k) == bool(v)


def test_cuckoo_add_contains_remove():
    f = CuckooFilter(10_000)
    keys = [stable_hash64(f"url-{i}") for i in range(8000)]
    for k in keys:
        assert f.add(k)
    assert all(f.contains(k) for k in keys)
    fp = sum(f.contains(stable_hash64(f"nope-{i}")) for i in range(5000))
    assert fp < 100
    for k in keys[:1000]:
        assert f.remove(k)
    assert f.n_items == 7000


def test_cuckoo_snapshot_roundtrip():
    f = CuckooFilter(1000)
    for i in range(500):
        f.add(stable_hash64(f"u{i}"))
    g = CuckooFilter.from_state(f.to_state())
    assert all(g.contains(stable_hash64(f"u{i}")) for i in range(500))
    assert (g.table == f.table).all()


def _mk_shard(**kw):
    return FrontierShard(
        0,
        4,
        expected_urls=10_000,
        robots_rows=[
            {"host": "a.example", "disallow": ["/private/"], "crawl_delay_ms": 100},
            {"host": "b.example", "disallow": [], "crawl_delay_ms": 200},
        ],
        **kw,
    )


def _admit(sh, urls, hosts, depth=1, prio=1):
    return sh.admit(
        {
            "url": urls,
            "host": hosts,
            "depth": [depth] * len(urls),
            "priority": [prio] * len(urls),
        }
    )


def test_frontier_admit_dedup_and_robots():
    sh = _mk_shard()
    r = _admit(
        sh,
        ["https://a.example/x", "https://a.example/x", "https://a.example/private/y"],
        ["a.example"] * 3,
    )
    assert r["admitted"] == 1
    assert r["dup"] == 1
    assert r["robots_blocked"] == 1


def test_frontier_filter_positive_confirmed_by_exact_store():
    sh = _mk_shard()
    _admit(sh, ["https://a.example/x"], ["a.example"])
    # second admit of same URL must be dup via exact confirmation
    r = _admit(sh, ["https://a.example/x"], ["a.example"])
    assert r["dup"] == 1 and r["admitted"] == 0


def test_frontier_politeness_release_rate():
    sh = _mk_shard()
    urls = [f"https://a.example/p{i}" for i in range(10)]
    _admit(sh, urls, ["a.example"] * 10)
    t = sh.release(450)  # delay 100ms -> at most ceil(450/100) = 5 in window
    assert t.num_rows == 5
    t2 = sh.release(450)
    assert t2.num_rows in (4, 5)
    total = t.num_rows + t2.num_rows
    t3 = sh.release(10_000)
    assert total + t3.num_rows == 10


def test_frontier_release_order_depth_priority_seq():
    sh = _mk_shard()
    sh.admit(
        {
            "url": ["https://b.example/low", "https://b.example/high", "https://b.example/d2"],
            "host": ["b.example"] * 3,
            "depth": [1, 1, 2],
            "priority": [1, 5, 9],
        }
    )
    t = sh.release(10_000)
    assert t["url"].to_pylist() == [
        "https://b.example/high",  # depth 1, priority 5
        "https://b.example/low",  # depth 1, priority 1
        "https://b.example/d2",  # depth 2 (depth dominates priority)
    ]


def test_frontier_quarantine():
    sh = _mk_shard(quarantine_after=3)
    sh.record_outcomes(["a.example"] * 3, [False, False, False])
    r = _admit(sh, ["https://a.example/z"], ["a.example"])
    assert r["quarantined_drop"] == 1
    # success resets the counter for another host
    sh.record_outcomes(["b.example", "b.example"], [False, True])
    assert sh.host_failures["b.example"] == 0


def test_frontier_snapshot_roundtrip():
    sh = _mk_shard()
    _admit(sh, [f"https://a.example/{i}" for i in range(20)], ["a.example"] * 20)
    sh.release(250)
    snap = sh.snapshot()
    sh2 = FrontierShard.restore(snap)
    assert sh2.seen_exact == sh.seen_exact
    assert sh2.pending_count() == sh.pending_count()
    assert sh2.clock_ms == sh.clock_ms
    # restored shard continues identically
    a = sh.release(1000)
    b = sh2.release(1000)
    assert a.to_pydict() == b.to_pydict()


def test_shard_for_salt_split():
    # normal host: every URL of the host lands on its home shard
    hh = stable_hash64("x.example")
    shards = {shard_for(stable_hash64(f"u{i}"), hh, 1, 16) for i in range(50)}
    assert len(shards) == 1
    # hot host with salt_k=4 fans over up to 4 shards, deterministically
    shards4 = {shard_for(stable_hash64(f"u{i}"), hh, 4, 16) for i in range(200)}
    assert 1 < len(shards4) <= 4
    assert shard_for(stable_hash64("u1"), hh, 4, 16) == shard_for(
        stable_hash64("u1"), hh, 4, 16
    )


# -- spill-backed exact seen-set (state/seenset.py) --------------------------

def test_seenset_spill_membership(tmp_path):
    """Exact membership across spills: every added URL stays a member, every
    absent URL stays absent, len is exact, iteration covers everything."""
    from high_performance_parallel_search_engine_ray.state.seenset import SeenSet

    s = SeenSet(spill_dir=str(tmp_path / "spill"), memory_cap=50)
    urls = [f"https://site{i % 7}.example.org/p/{i}" for i in range(500)]
    for u in urls:
        if u not in s:
            s.add(u)
    assert s.run_count >= 9  # definitely spilled
    assert len(s) == 500
    for u in urls:
        assert u in s
    for i in range(500, 600):
        assert f"https://site0.example.org/p/{i}" not in s
    assert set(s) == set(urls)


def test_seenset_equals_plain_set(tmp_path):
    from high_performance_parallel_search_engine_ray.state.seenset import SeenSet

    s = SeenSet(spill_dir=str(tmp_path / "sp"), memory_cap=10)
    ref = set()
    for i in range(100):
        u = f"https://x.example.org/{i}"
        s.add(u)
        ref.add(u)
    assert s == ref
    assert not (s == (ref | {"https://x.example.org/extra"}))


def test_seenset_state_roundtrip_preserves_runs(tmp_path):
    """to_state/from_state records run PATHS (not contents) and reopens
    them; the restored store answers identically."""
    from high_performance_parallel_search_engine_ray.state.seenset import SeenSet

    s = SeenSet(spill_dir=str(tmp_path / "sp"), memory_cap=20)
    urls = [f"https://h{i % 3}.example.org/a/{i}" for i in range(150)]
    for u in urls:
        s.add(u)
    st = s.to_state()
    assert len(st["delta"]) < 150  # most URLs live in runs, not the payload
    s2 = SeenSet.from_state(st)
    assert len(s2) == 150
    assert all(u in s2 for u in urls)
    assert "https://h0.example.org/a/999" not in s2
    # legacy checkpoint payloads (plain sorted list) still restore
    s3 = SeenSet.from_state(sorted(urls))
    assert len(s3) == 150 and urls[0] in s3


def test_frontier_spilled_seen_matches_inmemory(tmp_path):
    """A shard with a tiny spill cap admits exactly what an in-memory shard
    admits (dup/admit decisions are spill-invariant)."""
    import random

    from high_performance_parallel_search_engine_ray.functions.hashing import (
        stable_hash64,
    )
    from high_performance_parallel_search_engine_ray.state.frontier import (
        FrontierShard,
    )

    rng = random.Random(7)
    sh_mem = FrontierShard(0, 1)
    sh_spill = FrontierShard(
        0, 1, seen_spill_dir=str(tmp_path / "sp"), seen_memory_cap=32
    )
    for _ in range(20):
        urls = [
            f"https://s{rng.randrange(4)}.example.org/p/{rng.randrange(300)}"
            for _ in range(100)
        ]
        batch = {
            "url": urls,
            "host": [u.split("/")[2] for u in urls],
            "depth": [1] * len(urls),
            "priority": [1] * len(urls),
            "url_hash": [stable_hash64(u) for u in urls],
        }
        r1 = sh_mem.admit(dict(batch))
        r2 = sh_spill.admit(dict(batch))
        assert (r1["admitted"], r1["dup"]) == (r2["admitted"], r2["dup"])
    assert sh_spill.seen_exact.run_count > 0
    assert sh_mem.seen_exact == sh_spill.seen_exact
    # snapshot/restore round-trips the spilled store
    restored = FrontierShard.restore(sh_spill.snapshot())
    assert restored.seen_exact == sh_mem.seen_exact


def test_seenset_compaction(tmp_path):
    """compact() merges runs into one, preserves exact membership, and the
    caller-owned GC contract holds (old files intact until deleted)."""
    import os

    from high_performance_parallel_search_engine_ray.state.seenset import SeenSet

    s = SeenSet(spill_dir=str(tmp_path / "sp"), memory_cap=25)
    urls = [f"https://h{i % 5}.example.org/x/{i}" for i in range(300)]
    for u in urls:
        s.add(u)
    assert s.run_count >= 5
    obsolete = s.compact()
    assert s.run_count == 1
    assert all(os.path.exists(p) for p in obsolete)  # caller owns deletion
    assert len(s) == 300
    assert all(u in s for u in urls)
    assert f"https://h0.example.org/x/999" not in s
    # state round-trip after compaction
    s2 = SeenSet.from_state(s.to_state())
    assert set(s2) == set(urls)
    # second compact is a no-op (single run)
    assert s.compact() == []


def test_frontier_compaction_gc(tmp_path):
    import os

    from high_performance_parallel_search_engine_ray.functions.hashing import (
        stable_hash64,
    )
    from high_performance_parallel_search_engine_ray.state.frontier import (
        FrontierShard,
    )

    sh = FrontierShard(0, 1, seen_spill_dir=str(tmp_path / "sp"), seen_memory_cap=16)
    urls = [f"https://a.example.org/p/{i}" for i in range(200)]
    sh.admit(
        {"url": urls, "host": ["a.example.org"] * 200, "depth": [1] * 200,
         "priority": [1] * 200, "url_hash": [stable_hash64(u) for u in urls]}
    )
    assert sh.seen_exact.run_count > 4
    sh.maybe_compact_seen(max_runs=4)
    assert sh.seen_exact.run_count == 1
    assert sh._obsolete_seen_runs
    old = list(sh._obsolete_seen_runs)
    n = sh.gc_seen_runs()
    assert n == len(old)
    assert not any(os.path.exists(p) for p in old)
    # membership still exact after compaction + gc
    r = sh.admit(
        {"url": urls[:50], "host": ["a.example.org"] * 50, "depth": [1] * 50,
         "priority": [1] * 50, "url_hash": [stable_hash64(u) for u in urls[:50]]}
    )
    assert r["dup"] == 50 and r["admitted"] == 0


def test_seenset_add_idempotent_across_spills(tmp_path):
    """set.add semantics: re-adding a URL that already lives in a spilled
    run must not double-count or duplicate iteration."""
    from high_performance_parallel_search_engine_ray.state.seenset import SeenSet

    s = SeenSet(spill_dir=str(tmp_path / "sp"), memory_cap=10)
    urls = [f"https://x.example.org/{i}" for i in range(50)]
    for u in urls:
        s.add(u)
    assert s.run_count > 0
    for u in urls:  # every one of these is in a run or the delta already
        s.add(u)
    assert len(s) == 50
    assert sorted(s) == sorted(urls)


def test_frontier_politeness_audit():
    # audit mode: per-host min release gap must equal/exceed the host's
    # effective crawl delay; robots blocks counted per host
    sh = _mk_shard(audit=True)
    _admit(sh, [f"https://a.example/p{i}" for i in range(6)], ["a.example"] * 6)
    _admit(sh, [f"https://b.example/q{i}" for i in range(4)], ["b.example"] * 4)
    _admit(sh, ["https://a.example/private/x"], ["a.example"])  # robots block
    # release across several small windows so gaps span round boundaries
    for _ in range(8):
        sh.release(300)
    t = sh.politeness_audit()
    rows = {r["host"]: r for r in t.to_pylist()}
    assert rows["a.example"]["robots_blocked"] == 1
    assert rows["b.example"]["robots_blocked"] == 0
    assert rows["a.example"]["n_released"] == 6
    assert rows["b.example"]["n_released"] == 4
    # min gap == the exact delay (release() paces at exactly delay)
    assert rows["a.example"]["min_gap_ms"] == 100.0
    assert rows["b.example"]["min_gap_ms"] == 200.0
    assert all(r["politeness_ok"] for r in t.to_pylist())


def test_frontier_audit_off_raises():
    sh = _mk_shard()
    try:
        sh.politeness_audit()
        raise AssertionError("expected RuntimeError")
    except RuntimeError:
        pass


def test_pagestore_lru_bound(tmp_path):
    """PageStore with max_cached keeps at most that many bucket tables and
    evicts least-recently-used; unbounded mode never evicts."""
    from high_performance_parallel_search_engine_ray.sources.corpus import (
        generate_corpus,
    )
    from high_performance_parallel_search_engine_ray.stages.fetch import PageStore

    corpus = generate_corpus("t1-smoke", seed=42)
    import glob
    import os as _os

    import pyarrow.parquet as _pq

    buckets = sorted(
        glob.glob(_os.path.join(corpus, "pages", "bucket=*.parquet"))
    )
    urls = []
    for p in buckets[:6]:
        t = _pq.read_table(p, columns=["url"])
        if t.num_rows:
            urls.append(t["url"][0].as_py())
    assert len(urls) >= 3
    ps = PageStore(corpus, max_cached=2)
    for u in urls:
        assert ps.get(u) is not None
        assert len(ps._buckets) <= 2
    # LRU semantics: re-hitting the most recent keeps it resident
    u_last = urls[-1]
    ps.get(u_last)
    ps.get(urls[0])
    assert len(ps._buckets) <= 2
    unbounded = PageStore(corpus)
    for u in urls:
        unbounded.get(u)
    assert len(unbounded._buckets) == len({
        __import__("high_performance_parallel_search_engine_ray.functions.hashing",
                   fromlist=["stable_hash64"]).stable_hash64(u) % 64
        for u in urls
    })
    # explicit max_cached=0 (reachable via CrawlConfig.fetcher_cache_buckets=0)
    # clamps to 1 instead of crashing on the first bucket load
    degenerate = PageStore(corpus, max_cached=0)
    assert degenerate.max_cached == 1
    for u in urls:
        assert degenerate.get(u) is not None
        assert len(degenerate._buckets) <= 1
