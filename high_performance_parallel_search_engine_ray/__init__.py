"""Ray-Data-native crawl frontier + fetch scheduler + search engine.

A from-scratch reimplementation of the capabilities of the C search engine
``PramithaMJ/High-Performance-Parallel-Search-Engine`` (reference read-only at
/root/reference) as streaming ``ray.data.Dataset`` pipelines:

- ``functions/``  pure, vectorizable kernels (URL canonicalization, HTML->span
  scanner, tokenizers, text statistics, hashing) — the semantic ground truth,
  transliterated from the Serial version's C sources (cited per-function).
- ``state/``      frontier-shard state: counting-bloom + cuckoo filters,
  politeness token buckets, robots rules, snapshot/restore.
- ``sources/``    synthetic web corpus generator + table IO (parquet, with a
  Lance gate when the ``lance`` package is present).
- ``stages/``     map_batches-able stage callables (simulated fetch actor pool,
  span/link extraction, tokenize).
- ``pipelines/``  end-to-end pipelines: BFS crawl rounds (exact + sharded
  modes), serial reference oracle crawler, inverted index, BM25 ranking,
  dedup family, ANN, text analysis, relational queries.

Nothing here calls ``ray.init``; sessions are owned by bench.py / tests / CLI.
"""

__version__ = "0.1.0"
