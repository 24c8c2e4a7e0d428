"""Checkpoint/resume + sharded-mode determinism + robots gating
(SURVEY.md §5.5, north rule: resumable without re-fetching)."""

import glob
import os

import pytest

from high_performance_parallel_search_engine_ray.pipelines.crawl import (
    CrawlConfig,
    ShardedCrawl,
)
from high_performance_parallel_search_engine_ray.sources.corpus import generate_corpus


@pytest.fixture(scope="module")
def smoke_corpus():
    return generate_corpus("t1-smoke", seed=42)


def _cfg(corpus, out, **kw):
    base = dict(
        corpus_dir=corpus,
        out_dir=out,
        num_shards=4,
        fetch_concurrency=2,
        round_budget_ms=5000,
        max_rounds=20,
    )
    base.update(kw)
    return CrawlConfig(**base)


def _run(corpus, out, resume=False, **kw):
    eng = ShardedCrawl(_cfg(corpus, out, **kw))
    res = eng.run(resume=resume)
    seen = eng.visited_urls()
    docs = sorted(r["doc_id"] for r in eng.docs_dataset().take_all())
    eng.shutdown()
    return res, seen, docs


def test_sharded_determinism(ray_session, smoke_corpus):
    r1, seen1, docs1 = _run(smoke_corpus, "/tmp/t_det1")
    r2, seen2, docs2 = _run(smoke_corpus, "/tmp/t_det2")
    assert seen1 == seen2
    assert docs1 == docs2
    assert r1["pages_crawled"] == r2["pages_crawled"]


def test_resume_no_refetch(ray_session, smoke_corpus):
    full, seen_full, docs_full = _run(smoke_corpus, "/tmp/t_resume_full")

    # kill after 2 rounds, then resume
    eng = ShardedCrawl(_cfg(smoke_corpus, "/tmp/t_resume_kill", max_rounds=2))
    eng.run()
    eng.shutdown()
    parts_before = set(glob.glob("/tmp/t_resume_kill/docs/*/*.parquet"))
    mtimes_before = {p: os.path.getmtime(p) for p in parts_before}

    res, seen, docs = _run(smoke_corpus, "/tmp/t_resume_kill", resume=True)
    assert seen == seen_full
    assert docs == docs_full
    assert res["pages_crawled"] == full["pages_crawled"]
    # earlier rounds' doc partitions were neither rewritten nor re-fetched
    for p, m in mtimes_before.items():
        assert os.path.getmtime(p) == m, f"refetched {p}"
    # telemetry resumes too: the post-resume result carries the pre-crash
    # rounds, with the same per-round page counts as the uninterrupted run
    assert [r["round"] for r in res["metrics"]] == [
        r["round"] for r in full["metrics"]
    ]
    assert [r["fetched_ok"] for r in res["metrics"]] == [
        r["fetched_ok"] for r in full["metrics"]
    ]


def test_robots_gating(ray_session, smoke_corpus, tmp_path):
    """A host with a disallow-everything rule admits nothing from it."""
    import pyarrow as pa

    from high_performance_parallel_search_engine_ray.sources.corpus import (
        load_robots_rows,
    )
    from high_performance_parallel_search_engine_ray.state.frontier import FrontierShard

    robots = [{"host": "site1.example.org", "disallow": ["/"], "crawl_delay_ms": 100}]
    sh = FrontierShard(0, 1, robots_rows=robots)
    r = sh.admit(
        {
            "url": ["https://site1.example.org/x", "https://site2.example.org/x"],
            "host": ["site1.example.org", "site2.example.org"],
            "depth": [1, 1],
            "priority": [1, 1],
        }
    )
    assert r["robots_blocked"] == 1 and r["admitted"] == 1


def test_checkpoint_layout(ray_session, smoke_corpus):
    """Per-round partitioned layout + manifest (resumable-output contract)."""
    out = "/tmp/t_layout"
    eng = ShardedCrawl(_cfg(smoke_corpus, out, max_rounds=3))
    eng.run()
    eng.shutdown()
    assert os.path.exists(os.path.join(out, "MANIFEST.json"))
    rounds = sorted(os.listdir(os.path.join(out, "docs")))
    assert all(r.startswith("round=") for r in rounds)
    ckpts = sorted(glob.glob(os.path.join(out, "ckpt/round=*/shard-*.bin")))
    assert len(ckpts) >= 4  # num_shards snapshots for at least one round
    metrics = glob.glob(os.path.join(out, "metrics", "*.parquet"))
    assert metrics


def test_dataset_admission_mode_identical(ray_session, smoke_corpus):
    """The pure-Ray-Data admission path (groupby('shard').map_groups) must
    produce exactly the same crawl as the direct object-store shuffle."""
    _, seen_direct, docs_direct = _run(smoke_corpus, "/tmp/t_adm_direct")
    _, seen_ds, docs_ds = _run(
        smoke_corpus, "/tmp/t_adm_dataset", admission="dataset"
    )
    assert seen_ds == seen_direct
    assert docs_ds == docs_direct


def test_spilled_seenset_crawl_identical(ray_session, smoke_corpus):
    """A crawl whose shards spill the exact seen-set to disk (tiny
    seen_memory_cap) produces exactly the same crawl as the in-memory one,
    and actually spills."""
    import pyarrow.parquet as pq

    _, seen_mem, docs_mem = _run(smoke_corpus, "/tmp/t_spill_mem")
    res, seen_sp, docs_sp = _run(
        smoke_corpus, "/tmp/t_spill_disk", seen_memory_cap=8
    )
    assert seen_sp == seen_mem
    assert docs_sp == docs_mem
    runs = glob.glob("/tmp/t_spill_disk/seen/shard-*/run-*.parquet")
    assert runs, "expected spilled seen-set runs on disk"
    spilled = sum(pq.read_metadata(p).num_rows for p in runs)
    assert spilled > 0
    # resume works with spilled runs referenced from the checkpoint
    eng = ShardedCrawl(_cfg(smoke_corpus, "/tmp/t_spill_disk2",
                            seen_memory_cap=8, max_rounds=2))
    eng.run()
    eng.shutdown()
    _, seen_r, docs_r = _run(
        smoke_corpus, "/tmp/t_spill_disk2", resume=True, seen_memory_cap=8
    )
    assert seen_r == seen_mem
    assert docs_r == docs_mem


def test_fetch_slice_groups_invariant(ray_session, smoke_corpus):
    """The admission-exchange granularity (whole tables / node groups /
    per-shard slices) must not change the crawl."""
    _, seen_1, docs_1 = _run(smoke_corpus, "/tmp/t_slice1", fetch_slice_groups=1)
    _, seen_2, docs_2 = _run(smoke_corpus, "/tmp/t_slice2", fetch_slice_groups=2)
    _, seen_4, docs_4 = _run(smoke_corpus, "/tmp/t_slice4", fetch_slice_groups=4)
    assert seen_2 == seen_1 and docs_2 == docs_1
    assert seen_4 == seen_1 and docs_4 == docs_1


def test_admission_waves_invariant(ray_session, smoke_corpus):
    """Wave-pipelined admission (admission_waves > 1 overlaps each wave's
    admission with the fetch of later waves) must produce exactly the same
    crawl as the plain fetch-all-then-admit-all barrier: wave boundaries
    are global discovered_seq quantiles, so wave-major admission order
    equals the global (parent_seq, link_ord) order."""
    r1, seen_1, docs_1 = _run(smoke_corpus, "/tmp/t_wave1", admission_waves=1)
    r3, seen_3, docs_3 = _run(smoke_corpus, "/tmp/t_wave3", admission_waves=3)
    r8, seen_8, docs_8 = _run(smoke_corpus, "/tmp/t_wave8", admission_waves=8)
    assert seen_3 == seen_1 and docs_3 == docs_1
    assert seen_8 == seen_1 and docs_8 == docs_1
    assert r3["pages_crawled"] == r1["pages_crawled"]
    assert r8["pages_crawled"] == r1["pages_crawled"]
    # admission totals (dups filtered, admitted) are slice-invariant too
    for key in ("admitted", "dup", "robots_blocked"):
        tot = lambda r: sum(s[key] for s in r["shard_stats"])
        assert tot(r3) == tot(r1) and tot(r8) == tot(r1)


def test_fetcher_death_recovers_via_resume(ray_session, smoke_corpus):
    """Kill a fetch actor mid-crawl: the run fails fast (RayActorError
    surfaces), and resume from the last checkpoint reaches the exact state
    of an uninterrupted crawl — the designed recovery path for worker loss
    on a fixed-size cluster."""
    import ray

    full, seen_full, docs_full = _run(smoke_corpus, "/tmp/t_kill_full")

    eng = ShardedCrawl(_cfg(smoke_corpus, "/tmp/t_kill_mid", max_rounds=2))
    eng.run()  # 2 rounds checkpointed
    # keep going but kill a fetcher under the engine
    eng2 = ShardedCrawl(_cfg(smoke_corpus, "/tmp/t_kill_mid"))
    fetchers = eng._fetchers
    eng.shutdown(keep_fetchers=True)
    eng2.adopt_fetchers(fetchers)
    ray.kill(fetchers[0])
    with pytest.raises(Exception):
        eng2.run(resume=True)
    eng2.shutdown()

    # fresh engine resumes from the last durable checkpoint
    res, seen, docs = _run(smoke_corpus, "/tmp/t_kill_mid", resume=True)
    assert seen == seen_full
    assert docs == docs_full
    assert res["pages_crawled"] == full["pages_crawled"]


def test_fetcher_kill_and_restart_equality(ray_session, smoke_corpus):
    """Chaos: killing a fetch actor between rounds must be invisible —
    fetchers are restartable (max_restarts) and the docs write is
    content-keyed idempotent, so the resumed crawl's seen set, docs and
    page count equal an unperturbed run's."""
    import ray

    ref, seen_ref, docs_ref = _run(smoke_corpus, "/tmp/t_chaos_ref")

    eng = ShardedCrawl(_cfg(smoke_corpus, "/tmp/t_chaos_kill", max_rounds=1))
    eng.run()
    # murder one of the two fetchers; max_restarts=-1 must bring it back
    ray.kill(eng._fetchers[0], no_restart=False)
    eng.cfg.max_rounds = 20
    res = eng.run(resume=True)
    seen = eng.visited_urls()
    docs = sorted(r["doc_id"] for r in eng.docs_dataset().take_all())
    eng.shutdown()
    assert seen == seen_ref
    assert docs == docs_ref
    assert res["pages_crawled"] == ref["pages_crawled"]


def test_fetcher_killed_mid_round_invisible(ray_session, smoke_corpus):
    """Kill a fetch actor WHILE its round's fetch tasks are in flight
    (chaos_kill fires after wave submission): max_restarts revives it, the
    in-flight tasks re-execute, the content-keyed docs write dedupes the
    retry — the whole crawl completes in ONE run() with state identical to
    an unperturbed run. No resume needed."""
    ref, seen_ref, docs_ref = _run(smoke_corpus, "/tmp/t_midkill_ref")

    res, seen, docs = _run(
        smoke_corpus,
        "/tmp/t_midkill_f",
        chaos_kill={"round": 1, "target": "fetcher", "index": 1},
    )
    assert seen == seen_ref
    assert docs == docs_ref
    assert res["pages_crawled"] == ref["pages_crawled"]
    assert res["rounds"] == ref["rounds"]


def test_frontier_shard_killed_mid_round_recovers_via_resume(
    ray_session, smoke_corpus
):
    """Kill a FrontierShard actor mid-round (fetch tasks in flight): shards
    hold crawl state and deliberately do NOT restart, so the run fails
    fast; a fresh engine resuming from the last durable checkpoint reaches
    the exact seen-set/docs/page-count of an uninterrupted crawl — the
    partial round's docs directory is discarded and refetched, admission
    is idempotent."""
    import glob as _glob

    full, seen_full, docs_full = _run(smoke_corpus, "/tmp/t_shardkill_full")

    eng = ShardedCrawl(
        _cfg(
            smoke_corpus,
            "/tmp/t_shardkill",
            chaos_kill={"round": 2, "target": "shard", "index": 0},
        )
    )
    with pytest.raises(Exception):
        eng.run()
    eng.shutdown()
    # rounds 0..1 checkpointed before the kill; the dead round may have left
    # a partial docs dir, which resume must discard and redo
    assert _glob.glob("/tmp/t_shardkill/ckpt/round=*")

    res, seen, docs = _run(smoke_corpus, "/tmp/t_shardkill", resume=True)
    assert seen == seen_full
    assert docs == docs_full
    assert res["pages_crawled"] == full["pages_crawled"]


def test_docs_write_is_idempotent(ray_session, tmp_path):
    """_write_docs keys the part filename on the doc-id content, so a
    retried fetch task rewrites the SAME file instead of duplicating doc
    rows (what makes max_task_retries safe)."""
    import os

    from high_performance_parallel_search_engine_ray.stages.fetch import FetchParse

    corpus = generate_corpus("t1-smoke", seed=42)
    import pyarrow as pa

    from high_performance_parallel_search_engine_ray.sources.corpus import load_seeds

    seeds = load_seeds(corpus).to_pylist()[:3]
    batch = pa.table(
        {
            "url": pa.array([r["url"] for r in seeds], pa.string()),
            "depth": pa.array([0] * len(seeds), pa.int32()),
            "discovered_seq": pa.array(range(len(seeds)), pa.int64()),
        }
    )
    fp = FetchParse(corpus_dir=corpus, docs_dir=str(tmp_path / "docs"),
                    num_shards=4, hot_hosts={}, max_depth=5)
    fp.fetch(batch, str(tmp_path / "docs"))
    files1 = sorted(os.listdir(tmp_path / "docs"))
    # a restarted actor is a FRESH instance re-running the same task
    fp2 = FetchParse(corpus_dir=corpus, docs_dir=str(tmp_path / "docs"),
                     num_shards=4, hot_hosts={}, max_depth=5)
    fp2.fetch(batch, str(tmp_path / "docs"))
    files2 = sorted(os.listdir(tmp_path / "docs"))
    assert files1 == files2 and len(files1) == 1


def test_checkpoint_gc_keeps_resume_working(ray_session, smoke_corpus):
    """keep_checkpoints prunes old round snapshots as the crawl runs, the
    newest (manifest-referenced) checkpoint survives, and resume from the
    pruned layout still reaches the uninterrupted run's state."""
    import os

    ref, seen_ref, docs_ref = _run(smoke_corpus, "/tmp/t_gc_ref")

    out = "/tmp/t_gc_run"
    eng = ShardedCrawl(_cfg(smoke_corpus, out, max_rounds=3,
                            keep_checkpoints=1))
    eng.run()
    eng.shutdown()
    cks = sorted(os.listdir(os.path.join(out, "ckpt")))
    assert len(cks) == 1  # only the newest survives
    # resume to completion from the GC'd layout
    eng2 = ShardedCrawl(_cfg(smoke_corpus, out, max_rounds=20,
                             keep_checkpoints=1))
    res = eng2.run(resume=True)
    seen = eng2.visited_urls()
    docs = sorted(r["doc_id"] for r in eng2.docs_dataset().take_all())
    eng2.shutdown()
    assert seen == seen_ref
    assert docs == docs_ref
    assert res["pages_crawled"] == ref["pages_crawled"]


def test_load_strategies_equal(ray_session, smoke_corpus):
    """All three work-distribution strategies (CrawlConfig.load_strategy —
    the analog of the reference's selectable SEARCH_ENGINE_LOAD_STRATEGY,
    `MPI Version/src/load_balancer.c:17-30`) must produce IDENTICAL crawls:
    assignment only moves compute between fetchers; ordering, politeness,
    dedup and the doc set are assignment-independent."""
    r_s, seen_s, docs_s = _run(smoke_corpus, "/tmp/t_ls_static",
                               load_strategy="static")
    r_d, seen_d, docs_d = _run(smoke_corpus, "/tmp/t_ls_dyn",
                               load_strategy="dynamic", dynamic_unit_urls=3)
    r_a, seen_a, docs_a = _run(smoke_corpus, "/tmp/t_ls_adapt",
                               load_strategy="adaptive")
    assert seen_d == seen_s and docs_d == docs_s
    assert seen_a == seen_s and docs_a == docs_s
    assert r_d["pages_crawled"] == r_s["pages_crawled"]
    assert r_a["pages_crawled"] == r_s["pages_crawled"]


def test_load_strategy_env_alias(ray_session, smoke_corpus, monkeypatch):
    """The reference's env var name selects the strategy when the config
    field is left empty; bad values fail fast."""
    monkeypatch.setenv("SEARCH_ENGINE_LOAD_STRATEGY", "dynamic")
    eng = ShardedCrawl(_cfg(smoke_corpus, "/tmp/t_ls_env"))
    assert eng.load_strategy == "dynamic"
    monkeypatch.setenv("SEARCH_ENGINE_LOAD_STRATEGY", "bogus")
    with pytest.raises(ValueError):
        ShardedCrawl(_cfg(smoke_corpus, "/tmp/t_ls_env2"))


def test_assign_fetchers_semantics(ray_session, smoke_corpus):
    """Direct unit test of the work-distribution math: on a healthy pool
    dynamic/adaptive equal static (no movement); a real straggler (EMA
    below the 2/3-median deadband) sheds work toward its capacity, and
    stolen rows move in whole-bucket runs."""
    import numpy as np
    import pyarrow as pa

    eng = ShardedCrawl(_cfg(smoke_corpus, "/tmp/t_assign_sem"))
    nf = 4
    n = 8000
    rng = np.random.RandomState(7)
    frontier = pa.table(
        {
            "url_hash": pa.array(
                rng.randint(0, 2**63 - 1, n, dtype=np.int64)
            ),
            "discovered_seq": pa.array(np.arange(n, dtype=np.int64)),
        }
    )
    eng.load_strategy = "static"
    static = eng._assign_fetchers(frontier, nf)
    eng.load_strategy = "dynamic"
    dyn = eng._assign_fetchers(frontier, nf)
    # hash balance is already even -> hysteresis keeps dynamic == static
    assert (dyn == static).all()
    eng.load_strategy = "adaptive"
    eng._speed_ema = np.array([1.0, 1.0, 1.0, 1.0])
    healthy = eng._assign_fetchers(frontier, nf)
    assert (healthy == static).all()
    eng._speed_ema = np.array([1.0, 1.0, 1.0, 0.3])  # fetcher 3 degraded
    shed = eng._assign_fetchers(frontier, nf)
    c_static = np.bincount(static, minlength=nf)
    c_shed = np.bincount(shed, minlength=nf)
    assert c_shed[3] < 0.5 * c_static[3]  # straggler sheds most of its load
    assert c_shed.sum() == n
    # moved rows changed owner only AWAY from the straggler
    moved = shed != static
    assert set(static[moved].tolist()) == {3}
