"""t2-correctness-scale checks (SURVEY.md §5 test plan):
- exact-mode equality on the 5k-page corpus (first seeds)
- sharded-crawl docs carry spans byte-identical to direct extraction of the
  corpus pages (fetch-stage integrity)
"""

import glob

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from high_performance_parallel_search_engine_ray.functions.htmltext import html_to_spans
from high_performance_parallel_search_engine_ray.functions.urlnorm import extract_links
from high_performance_parallel_search_engine_ray.pipelines.crawl import (
    CrawlConfig,
    ShardedCrawl,
    crawl_exact,
)
from high_performance_parallel_search_engine_ray.pipelines.refcrawler import (
    MAX_URLS,
    PolitenessBudget,
    corpus_lookup,
    crawl_serial,
)
from high_performance_parallel_search_engine_ray.sources.corpus import (
    generate_corpus,
    load_seeds,
    pages_uris,
)


@pytest.fixture(scope="module")
def t2_corpus():
    return generate_corpus("t2-correctness", seed=42)


@pytest.fixture(scope="module")
def t2_lookup(t2_corpus):
    tables = [pq.read_table(u) for u in pages_uris(t2_corpus)]
    return corpus_lookup(pa.concat_tables(tables))


def test_exact_equality_t2(ray_session, t2_corpus, t2_lookup):
    seeds = load_seeds(t2_corpus).to_pylist()[:4]
    for i, s in enumerate(seeds):
        oracle = crawl_serial(
            t2_lookup, s["url"], int(s["max_depth"]), int(s["max_pages"]),
            PolitenessBudget(7 + i),
        )
        engine = crawl_exact(
            t2_corpus, s["url"], int(s["max_depth"]), int(s["max_pages"]),
            PolitenessBudget(7 + i),
        )
        assert engine.visits == oracle.visits
        assert engine.seen == oracle.seen
        assert engine.virtual_ms == oracle.virtual_ms


def test_sharded_docs_span_integrity(ray_session, t2_corpus, t2_lookup):
    """Every doc row the sharded crawl writes must equal a fresh
    html_to_spans over the corpus page (the per-row invariant of the
    interleaved-document table), sampled across rounds."""
    eng = ShardedCrawl(
        CrawlConfig(
            corpus_dir=t2_corpus,
            out_dir="/tmp/t2_crawl",
            num_shards=8,
            fetch_concurrency=4,
            round_budget_ms=60_000.0,
            max_rounds=6,
            max_depth=4,
        )
    )
    res = eng.run()
    assert res["pages_crawled"] > 200
    parts = sorted(glob.glob("/tmp/t2_crawl/docs/*/*.parquet"))
    checked = 0
    for p in parts[:: max(1, len(parts) // 8)]:
        t = pq.read_table(p)
        for i in range(0, t.num_rows, max(1, t.num_rows // 5)):
            url = t["doc_id"][i].as_py()
            spans = t["spans"][i].as_py()
            page = t2_lookup[url]
            html = page["html"]
            depth = t["depth"][i].as_py()
            candidates = (
                extract_links(html, url, 1000) if depth < 4 else []
            )
            assert spans == html_to_spans(html, candidates), f"span drift for {url}"
            checked += 1
    assert checked >= 10
    eng.shutdown()
