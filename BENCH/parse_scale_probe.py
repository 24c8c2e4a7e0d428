"""Share-nothing parse scaling probe: K pinned processes, each parsing its
own disjoint set of corpus buckets with the engine's html_to_spans. No Ray,
no shared state, no coordination — pure per-core compute + memory traffic.
If aggregate throughput stops scaling 8->32 here too, the ceiling is the
MACHINE (memory bandwidth), not the engine."""
import os, sys, time, glob  # usage: python BENCH/parse_scale_probe.py <K> [pages_per_worker]
import multiprocessing as mp
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORPUS = "/tmp/hppse_corpus/bench_seed42"

def worker(args):
    k, nworkers, pages_cap = args
    os.sched_setaffinity(0, {k})
    import pyarrow.parquet as pq
    from high_performance_parallel_search_engine_ray.functions.htmltext import html_to_spans
    from high_performance_parallel_search_engine_ray.functions.urlnorm import extract_links
    files = sorted(glob.glob(os.path.join(CORPUS, "pages", "bucket=*.parquet")))
    mine = files[k::nworkers]
    n = 0
    t0 = time.perf_counter()
    for f in mine:
        t = pq.read_table(f, columns=["url", "html"])
        for url, html_b in zip(t["url"].to_pylist(), t["html"].to_pylist()):
            html = html_b.decode("utf-8", "replace")
            cands = extract_links(html, url, 1000)
            spans = html_to_spans(html, cands)
            n += 1
            if n >= pages_cap:
                return n, time.perf_counter() - t0
    return n, time.perf_counter() - t0

if __name__ == "__main__":
    K = int(sys.argv[1])
    cap = int(sys.argv[2]) if len(sys.argv) > 2 else 4000
    with mp.Pool(K) as p:
        res = p.map(worker, [(k, K, cap) for k in range(K)])
    pages = sum(r[0] for r in res)
    wall = max(r[1] for r in res)
    print(f"K={K} pages={pages} wall={wall:.2f}s agg={pages/wall:.0f} pages/s per_core={pages/wall/K:.0f}")
