"""CLI entry points (reference analog: `Serial Version/src/main.c:18-148`
flags -c/-d/-p for crawl and stdin queries; `ray job submit`-able).

  python -m high_performance_parallel_search_engine_ray corpus --profile t1-smoke
  python -m high_performance_parallel_search_engine_ray crawl  --corpus <dir> --out /tmp/crawl
  python -m high_performance_parallel_search_engine_ray search --docs <parquet-or-crawl-out> -q "hash join"
  python -m high_performance_parallel_search_engine_ray status --out /tmp/crawl

The CLI owns the Ray session (guarded init); library code never calls
ray.init.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _ray_init(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )


def cmd_corpus(args) -> int:
    from .sources.corpus import generate_corpus

    d = generate_corpus(args.profile, seed=args.seed)
    print(json.dumps({"corpus_dir": d, "profile": args.profile, "seed": args.seed}))
    return 0


def cmd_crawl(args) -> int:
    _ray_init(args.num_cpus)
    from .pipelines.crawl import CrawlConfig, ShardedCrawl
    from .sources.corpus import generate_corpus

    corpus = args.corpus
    if corpus in ("t1-smoke", "t2-correctness", "bench"):
        corpus = generate_corpus(corpus, seed=42)
    cfg = CrawlConfig(
        corpus_dir=corpus,
        out_dir=args.out,
        num_shards=args.num_shards,
        fetch_concurrency=args.fetch_concurrency,
        round_budget_ms=args.round_budget_ms,
        max_rounds=args.max_rounds,
        max_depth=args.max_depth,
        max_pages_total=args.max_pages,
        load_strategy=args.load_strategy,
    )
    eng = ShardedCrawl(cfg)
    res = eng.run(resume=args.resume)
    out = {
        "rounds": res["rounds"],
        "pages_crawled": res["pages_crawled"],
        "seen_total": res["seen_total"],
        "wall_s": round(res["wall_s"], 2),
        "out_dir": args.out,
    }
    eng.shutdown()
    print(json.dumps(out))
    return 0


def _docs_dataset(path: str):
    """Accept a documents parquet (doc_id, text) or a crawl out_dir (span
    rows get flattened to text)."""
    import pyarrow as pa
    import ray.data as rd

    if os.path.isdir(os.path.join(path, "docs")):
        import glob

        parts = sorted(glob.glob(os.path.join(path, "docs", "*", "*.parquet")))
        ds = rd.read_parquet(parts)

        def flatten(b: pa.Table) -> pa.Table:
            texts = []
            for spans in b["spans"].to_pylist():
                texts.append(" ".join(s["text"] for s in spans if s["text"]))
            return pa.table({"doc_id": b["doc_id"], "text": pa.array(texts, pa.string())})

        return ds.map_batches(flatten, batch_format="pyarrow")
    return rd.read_parquet(path, columns=["doc_id", "text"])


def cmd_search(args) -> int:
    if not getattr(args, "index_dir", None) and not args.docs:
        print("search: provide --docs or --index-dir", file=sys.stderr)
        return 2
    _ray_init(args.num_cpus)
    from .pipelines.rank import bm25_from_index, bm25_topk, bm25_topk_expanded

    queries = [args.query] if args.query else [line.strip() for line in sys.stdin if line.strip()]
    if getattr(args, "index_dir", None):
        # serve from the persisted term index (build-once / query-many:
        # the reference's deployment shape — see `index` subcommand)
        for q in queries:
            t = bm25_from_index(args.index_dir, q, k=args.k)
            print(json.dumps({"query": q, "results": t.to_pylist()}))
        return 0
    docs = _docs_dataset(args.docs)
    tf = None
    if len(queries) > 1 and not args.expand_terms:
        # stdin batch mode: tokenize once, query many
        from .pipelines.index import term_doc_tf

        tf = term_doc_tf(docs).materialize()
    for q in queries:
        if args.expand_terms:
            t = bm25_topk_expanded(docs, q, k=args.k)
        else:
            t = bm25_topk(docs, q, k=args.k, tf=tf)
        print(json.dumps({"query": q, "results": t.to_pylist()}))
    return 0


def cmd_index(args) -> int:
    """Build the persisted servable term index (reference analog: the
    build_index phase of `Serial Version/src/main.c` before its query
    loop)."""
    _ray_init(args.num_cpus)
    from .pipelines.index import write_term_index

    docs = _docs_dataset(args.docs)
    man = write_term_index(docs, args.out)
    print(json.dumps({"index_dir": args.out, **man}))
    return 0


def cmd_compact_index(args) -> int:
    """Index maintenance: fold `index`/append deltas into one postings file
    per bucket (see pipelines.index.compact_term_index)."""
    _ray_init(args.num_cpus)
    from .pipelines.index import compact_term_index

    stats = compact_term_index(args.index_dir)
    print(
        json.dumps(
            {
                "index_dir": args.index_dir,
                "n_buckets": int(len(stats)),
                "n_compacted": int(stats["compacted"].sum()),
                "n_files_before": int(stats["n_files_before"].sum()),
            }
        )
    )
    return 0


def cmd_evaluate(args) -> int:
    """End-to-end eval (reference analog: `Serial Version/src/evaluate.c:
    12-109`): crawl the corpus, build the docs table, run the 5 fixed
    queries, record timings via the metrics recorder."""
    import time

    _ray_init(args.num_cpus)
    from .pipelines.crawl import CrawlConfig, ShardedCrawl
    from .pipelines.index import term_doc_tf
    from .pipelines.metrics import MetricsRecorder
    from .pipelines.rank import bm25_eval_queries, bm25_topk
    from .sources.corpus import generate_corpus

    corpus = args.corpus
    if corpus in ("t1-smoke", "t2-correctness", "bench"):
        corpus = generate_corpus(corpus, seed=42)
    rec = MetricsRecorder(args.out)
    with rec.timed("crawl"):
        eng = ShardedCrawl(
            CrawlConfig(corpus_dir=corpus, out_dir=args.out, num_shards=8,
                        fetch_concurrency=4, round_budget_ms=60_000.0,
                        max_rounds=30)
        )
        res = eng.run()
    docs = _docs_dataset(args.out)
    # index once (tf materialized in the object store), query many — the
    # reference's evaluate loop builds the index once too (evaluate.c:28-66)
    tf = term_doc_tf(docs).materialize()
    results = {}
    for q in bm25_eval_queries():
        t0 = time.perf_counter()
        top = bm25_topk(docs, q, k=5, tf=tf)
        rec.record_query_latency((time.perf_counter() - t0) * 1000.0)
        results[q] = top.to_pylist()
    rec.record("pages_crawled", res["pages_crawled"], unit="count")
    out = {
        "pages_crawled": res["pages_crawled"],
        "avg_query_latency_ms": round(rec.query_latency_avg_ms, 2),
        "results": results,
    }
    # speedup vs a saved baseline (reference: calculate_speedup /
    # save_as_baseline, `Serial Version/src/benchmark.c:51-118`).
    # snapshot() reads rec.rows, so compare/save BEFORE flush() clears them.
    if args.baseline:
        out["speedup"] = rec.compare_with_baseline(args.baseline)
    if args.save_baseline:
        rec.save_as_baseline(args.save_baseline)
        out["baseline_saved"] = args.save_baseline
    out["metrics_uri"] = rec.flush()
    eng.shutdown()
    print(json.dumps(out))
    return 0


def cmd_compare(args) -> int:
    """Run the evaluate suite at two parallelism configs back-to-back in
    FRESH processes (each owns its Ray session) and print the metric diff —
    the reference dashboard's /api/compare (`WebSite/api.py:469-520`), with
    'engine versions' mapped to CPU configs of the one Ray engine."""
    import subprocess
    import tempfile

    runs = {}
    for label, cpus in (("a", args.cpus_a), ("b", args.cpus_b)):
        with tempfile.TemporaryDirectory(prefix="hppse_cmp_") as td:
            proc = subprocess.run(
                [sys.executable, "-m", "high_performance_parallel_search_engine_ray",
                 "evaluate", "--corpus", args.corpus, "--out", td,
                 "--num-cpus", str(cpus)],
                capture_output=True, text=True,
            )
            if proc.returncode != 0:
                print(json.dumps({"error": f"config {label} failed",
                                  "stderr": proc.stderr[-2000:]}))
                return 1
            runs[label] = json.loads(proc.stdout.strip().splitlines()[-1])
    la = runs["a"]["avg_query_latency_ms"]
    lb = runs["b"]["avg_query_latency_ms"]
    print(json.dumps({
        "corpus": args.corpus,
        "config_a": {"num_cpus": args.cpus_a, "avg_query_latency_ms": la,
                     "pages_crawled": runs["a"]["pages_crawled"]},
        "config_b": {"num_cpus": args.cpus_b, "avg_query_latency_ms": lb,
                     "pages_crawled": runs["b"]["pages_crawled"]},
        "latency_speedup_b_over_a": round(la / lb, 4) if lb > 0 else 0.0,
        "results_identical": runs["a"]["results"] == runs["b"]["results"],
    }))
    return 0


def cmd_fetch_url(args) -> int:
    """Single-URL fetch (reference `-u`, `Serial Version/src/main.c:54-68`:
    download one page into the dataset/ directory). Here the page comes
    from the simulated web (PageStore) and lands as the reference's
    text-doc format: 'Source URL:' header + flat rendered text."""
    import os as _os

    from .functions.htmltext import get_medium_filename, html_to_events, render_flat
    from .functions.urlnorm import normalize_url
    from .sources.corpus import generate_corpus
    from .stages.fetch import PageStore

    corpus = args.corpus
    if corpus in ("t1-smoke", "t2-correctness", "bench"):
        corpus = generate_corpus(corpus, seed=42)
    url = normalize_url(args.url)
    page = PageStore(corpus).get(url)
    if page is None or page[0] == -1:
        print(json.dumps({"url": url, "error": "fetch failed"}))
        return 1
    _status, _ctype, html_b, _lat = page
    html = html_b.decode("utf-8")
    text = render_flat(html_to_events(html))
    _os.makedirs(args.out, exist_ok=True)
    fname = get_medium_filename(url, html)
    path = _os.path.join(args.out, fname)
    with open(path, "w") as f:
        f.write(f"Source URL: {url}\n\n{text}")
    print(json.dumps({"url": url, "file": path, "n_chars": len(text)}))
    return 0


def cmd_serve(args) -> int:
    """REST control plane (reference dashboard API, `WebSite/api.py:
    350-520`): /api/status, /api/search, /api/metrics, /api/compare over a
    loaded docs table. The CLI owns the Ray session; the server only
    serves. Default serving path persists the term index once (or reuses
    --index-dir if it already holds one) and answers bm25 queries from the
    bucket-pruned on-disk layout; --adhoc keeps the old materialized-tf
    fallback."""
    _ray_init(args.num_cpus)
    from .server import EngineHandle, serve

    # index-only deployment: a prebuilt --index-dir serves bm25 variants
    # without the corpus on board (the pattern variant then 400s)
    if args.adhoc and args.index_dir:
        print(json.dumps({"error": "--adhoc and --index-dir are mutually "
                                   "exclusive (adhoc never touches an index)"}))
        return 1
    if args.docs is None and (args.adhoc or args.index_dir is None):
        print(json.dumps({"error": "--docs is required unless --index-dir "
                                   "points at a built index"}))
        return 1
    docs = _docs_dataset(args.docs) if args.docs else None
    try:
        engine = EngineHandle(docs, index_dir=args.index_dir, adhoc=args.adhoc)
    except (FileNotFoundError, ValueError) as e:
        print(json.dumps({"error": str(e)}))
        return 1
    serve(engine, args.port)
    return 0


def cmd_status(args) -> int:
    from .sources.io import read_manifest

    man = read_manifest(args.out)
    print(json.dumps(man or {"error": f"no manifest under {args.out}"}))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="high_performance_parallel_search_engine_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    pc = sub.add_parser("corpus", help="generate the synthetic web corpus")
    pc.add_argument("--profile", default="t1-smoke",
                    choices=["t1-smoke", "t2-correctness", "bench"])
    pc.add_argument("--seed", type=int, default=42)
    pc.set_defaults(fn=cmd_corpus)

    pw = sub.add_parser("crawl", help="run the sharded frontier crawl")
    pw.add_argument("--corpus", required=True,
                    help="corpus dir or profile name (t1-smoke/t2-correctness/bench)")
    pw.add_argument("--out", required=True)
    pw.add_argument("--num-shards", type=int, default=8)
    pw.add_argument("--fetch-concurrency", type=int, default=4)
    pw.add_argument("--round-budget-ms", type=float, default=60_000.0)
    pw.add_argument("--max-rounds", type=int, default=60)
    pw.add_argument("--max-depth", type=int, default=3)
    pw.add_argument("--max-pages", type=int, default=None)
    pw.add_argument("--resume", action="store_true")
    pw.add_argument("--num-cpus", type=int, default=None)
    pw.add_argument("--load-strategy", default="",
                    choices=["", "static", "dynamic", "adaptive"],
                    help="fetch-pool work distribution (default: "
                         "$GRAFT_LOAD_STRATEGY / "
                         "$SEARCH_ENGINE_LOAD_STRATEGY, else static)")
    pw.set_defaults(fn=cmd_crawl)

    ps = sub.add_parser("search", help="BM25 search over a docs table or crawl output")
    ps.add_argument("--docs", default=None,
                    help="documents parquet / crawl out_dir (corpus-pass mode)")
    ps.add_argument("--index-dir", default=None,
                    help="serve from a persisted `index` layout instead of a corpus pass")
    ps.add_argument("-q", "--query", default=None,
                    help="query string (default: read queries from stdin)")
    ps.add_argument("-k", type=int, default=10)
    ps.add_argument("--expand-terms", action="store_true",
                    help="plural/singular fallback (OpenMP ranking semantics)")
    ps.add_argument("--num-cpus", type=int, default=None)
    ps.set_defaults(fn=cmd_search)

    pix = sub.add_parser("index", help="build the persisted servable term index")
    pix.add_argument("--docs", required=True)
    pix.add_argument("--out", required=True)
    pix.add_argument("--num-cpus", type=int, default=None)
    pix.set_defaults(fn=cmd_index)

    pcx = sub.add_parser(
        "compact-index",
        help="merge append-deltas into one postings file per bucket",
    )
    pcx.add_argument("--index-dir", required=True)
    pcx.add_argument("--num-cpus", type=int, default=None)
    pcx.set_defaults(fn=cmd_compact_index)

    pe = sub.add_parser("evaluate", help="crawl + index + the 5 reference eval queries")
    pe.add_argument("--corpus", default="t1-smoke")
    pe.add_argument("--out", default="/tmp/hppse_evaluate")
    pe.add_argument("--num-cpus", type=int, default=None)
    pe.add_argument("--baseline", default=None,
                    help="baseline metrics JSON to compare against (speedup table)")
    pe.add_argument("--save-baseline", default=None,
                    help="write this run's metrics as the new baseline JSON")
    pe.set_defaults(fn=cmd_evaluate)

    pcm = sub.add_parser("compare", help="run the evaluate suite at two CPU configs and diff")
    pcm.add_argument("--corpus", default="t1-smoke")
    pcm.add_argument("--cpus-a", type=int, default=2)
    pcm.add_argument("--cpus-b", type=int, default=4)
    pcm.set_defaults(fn=cmd_compare)

    pf = sub.add_parser("fetch-url", help="fetch ONE url into the reference dataset/ format (-u analog)")
    pf.add_argument("--url", required=True)
    pf.add_argument("--corpus", default="t1-smoke")
    pf.add_argument("--out", default="/tmp/hppse_dataset")
    pf.set_defaults(fn=cmd_fetch_url)

    psv = sub.add_parser(
        "serve",
        help="REST control plane: /api/status /api/search /api/metrics /api/compare",
    )
    psv.add_argument("--docs", default=None,
                     help="documents parquet or crawl out_dir to serve "
                          "(optional when --index-dir holds a built index)")
    psv.add_argument("--port", type=int, default=5001)
    psv.add_argument("--num-cpus", type=int, default=None)
    psv.add_argument("--index-dir", default=None,
                     help="persisted term-index dir (reused if it already "
                          "holds a manifest; built there otherwise)")
    psv.add_argument("--adhoc", action="store_true",
                     help="materialize the tf table instead of serving "
                          "from a persisted index")
    psv.set_defaults(fn=cmd_serve)

    pst = sub.add_parser("status", help="show a crawl checkpoint manifest")
    pst.add_argument("--out", required=True)
    pst.set_defaults(fn=cmd_status)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
