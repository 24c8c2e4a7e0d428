"""CLI surface + reference text-doc format round-trip."""

import json
import subprocess
import sys

import pytest

from high_performance_parallel_search_engine_ray.sources.corpus import generate_corpus


def test_cli_corpus_and_status():
    out = subprocess.run(
        [sys.executable, "-m", "high_performance_parallel_search_engine_ray",
         "corpus", "--profile", "t1-smoke"],
        capture_output=True, text=True, check=True,
    ).stdout
    d = json.loads(out.strip().splitlines()[-1])
    assert d["profile"] == "t1-smoke"


def test_cli_crawl_and_search():
    corpus = generate_corpus("t1-smoke", seed=42)
    r = subprocess.run(
        [sys.executable, "-m", "high_performance_parallel_search_engine_ray",
         "crawl", "--corpus", corpus, "--out", "/tmp/cli_crawl",
         "--num-shards", "4", "--fetch-concurrency", "2",
         "--round-budget-ms", "5000", "--max-rounds", "20", "--num-cpus", "4"],
        capture_output=True, text=True, check=True,
    )
    res = json.loads(r.stdout.strip().splitlines()[-1])
    assert res["pages_crawled"] > 10
    r2 = subprocess.run(
        [sys.executable, "-m", "high_performance_parallel_search_engine_ray",
         "search", "--docs", "/tmp/cli_crawl", "-q", "crawl frontier", "--num-cpus", "4"],
        capture_output=True, text=True, check=True,
    )
    res2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert res2["query"] == "crawl frontier"
    assert len(res2["results"]) > 0


def test_textdocs_roundtrip(ray_session, tmp_path):
    """Crawl docs -> reference dataset/ format -> read back: urls and flat
    text survive; the written files carry the reference header."""
    import glob

    import ray.data as rd

    from high_performance_parallel_search_engine_ray.sources.textdocs import (
        read_text_docs,
        write_text_docs,
    )

    parts = sorted(glob.glob("/tmp/cli_crawl/docs/*/*.parquet"))
    if not parts:
        pytest.skip("crawl output missing (CLI test order)")
    docs = rd.read_parquet(parts).limit(20)
    folder = str(tmp_path / "dataset")
    n = write_text_docs(docs, folder)
    assert n > 0
    back = read_text_docs(folder).take_all()
    assert len(back) == len(set(r["filename"] for r in back))
    assert all(r["url"].startswith("https://") for r in back)
    with open(glob.glob(folder + "/*")[0]) as f:
        assert f.readline().startswith("Source URL: ")
