"""Crawl-ordering + URL-seen equality (SURVEY.md §5.3, north rule):
the Ray exact-mode pipeline must yield the identical visit order, seen set,
page count and politeness budget as the serial reference transliteration,
over the synthetic corpus seeds."""

import pyarrow as pa
import pytest

from high_performance_parallel_search_engine_ray.pipelines.crawl import crawl_exact
from high_performance_parallel_search_engine_ray.pipelines.refcrawler import (
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
def smoke_corpus():
    return generate_corpus("t1-smoke", seed=42)


@pytest.fixture(scope="module")
def lookup(smoke_corpus):
    import pyarrow.parquet as pq

    tables = [pq.read_table(u) for u in pages_uris(smoke_corpus)]
    return corpus_lookup(pa.concat_tables(tables))


def test_corpus_is_deterministic(smoke_corpus):
    import pyarrow.parquet as pq

    d2 = generate_corpus("t1-smoke", seed=42, out_dir="/tmp/hppse_corpus/redo_t1")
    import os, shutil

    shutil.rmtree(d2)  # force regeneration
    d2 = generate_corpus("t1-smoke", seed=42, out_dir="/tmp/hppse_corpus/redo_t1")
    a = pa.concat_tables([pq.read_table(u) for u in pages_uris(smoke_corpus)])
    b = pa.concat_tables(
        [pq.read_table(u.replace(smoke_corpus, d2)) for u in pages_uris(smoke_corpus)]
    )
    assert a.equals(b)


def test_oracle_crawl_sane(lookup, smoke_corpus):
    seeds = load_seeds(smoke_corpus).to_pylist()
    tr = crawl_serial(lookup, seeds[0]["url"], 3, 100, PolitenessBudget(1))
    assert tr.pages_crawled > 3
    assert len(tr.visits) >= tr.pages_crawled
    assert len(set(tr.seen)) == len(tr.seen)  # marks are unique
    fetched = [v["url"] for v in tr.visits if v["outcome"] == "fetched"]
    assert len(set(fetched)) == len(fetched)  # no page fetched twice


def test_exact_mode_matches_oracle_all_seeds(ray_session, lookup, smoke_corpus):
    seeds = load_seeds(smoke_corpus).to_pylist()
    for i, s in enumerate(seeds):
        oracle = crawl_serial(
            lookup, s["url"], int(s["max_depth"]), int(s["max_pages"]),
            PolitenessBudget(1 + i),
        )
        engine = crawl_exact(
            smoke_corpus, s["url"], int(s["max_depth"]), int(s["max_pages"]),
            PolitenessBudget(1 + i),
        )
        assert engine.visits == oracle.visits, f"visit trace diverged for seed {s['url']}"
        assert engine.seen == oracle.seen, f"seen set diverged for seed {s['url']}"
        assert engine.pages_crawled == oracle.pages_crawled
        assert engine.virtual_ms == oracle.virtual_ms  # same politeness budget
