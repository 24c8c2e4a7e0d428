"""Simulated fetch + parse + link-extraction stage (actor pool).

``FetchParse`` is a callable class for ``map_batches(FetchParse, concurrency=N,
batch_format="pyarrow")``: per-actor state (the bucket-file cache and compiled
kernels) is built once in ``__init__``, per-batch work in ``__call__``
(ray_guide "Stateful stages = actor pools").

In production this stage would issue HTTP requests (the reference's libcurl
fetch, `Serial Version/src/crawler.c:876-976,1095-1113`); in this sandbox it
random-accesses the synthetic web stored as hash-bucketed parquet files —
each batch only opens the buckets its URLs hash into, standing in for
random-access fetches without holding the whole corpus per actor.

Outputs one Arrow table per batch with a ``kind`` column:
- kind='link':    candidate link rows (url, host, depth, priority,
                  parent_seq, link_ord, shard) for frontier admission
- kind='outcome': one row per frontier URL with the fetch result (ok flag in
                  ``link_ord``: 1/0) routed to the host's home shard for the
                  failure circuit breaker

Document rows (doc_id, spans, url, depth, fetch metadata) are written as a
side-effect partitioned by crawl round (resumable layout; re-running a round
overwrites only that round's directory).
"""

from __future__ import annotations

import os
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.htmltext import html_to_spans
from ..functions.urlnorm import (
    combined_priority,
    extract_base_domain,
    extract_links,
    host_of,
    is_html_content,
    is_valid_crawl_url,
)
from ..functions.hashing import stable_hash64
from ..sources.corpus import N_BUCKETS
from ..state.frontier import shard_for

SPAN_TYPE = pa.list_(
    pa.struct(
        [
            ("kind", pa.string()),
            ("text", pa.string()),
            ("media_ref", pa.string()),
            ("offset", pa.int32()),
        ]
    )
)

LINKS_SCHEMA = pa.schema(
    [
        ("kind", pa.string()),
        ("url", pa.string()),
        ("host", pa.string()),
        ("depth", pa.int32()),
        ("priority", pa.int32()),
        ("parent_seq", pa.int64()),
        ("link_ord", pa.int64()),
        ("shard", pa.int64()),
        ("url_hash", pa.uint64()),
    ]
)


class PageStore:
    """Bucket-file cache over the corpus pages table.

    Buckets stay as Arrow tables (zero-copy parquet buffers); only a
    url->row-index dict is materialized per bucket. Page bodies decode on
    demand per row, so bucket load is a C-speed parquet read instead of a
    full python-object materialization (~10x faster, ~4x less memory)."""

    def __init__(self, corpus_dir: str, max_cached: int | None = None):
        self.corpus_dir = corpus_dir
        # b -> (index_dict, table); insertion order doubles as LRU order
        # (dicts are ordered; hits re-insert). ``max_cached=None`` =
        # unbounded — correct ONLY under bucket-affine routing (static
        # load strategy: each fetcher ever sees ~N_BUCKETS/n_fetchers
        # buckets). Non-affine routing (dynamic/adaptive strategies) sends
        # every bucket to every fetcher; unbounded caching then costs
        # n_fetchers x corpus RAM — measured OOM at bench scale — so those
        # paths pass an explicit cap and trade cache misses instead.
        self._buckets: dict[int, tuple] = {}
        # A cache that can hold zero buckets can serve nothing (every get
        # loads a bucket) — clamp explicit 0/negative configs to 1 so the
        # eviction path never pops from an empty dict.
        self.max_cached = max(1, max_cached) if max_cached is not None else None

    def _load_bucket(self, b: int) -> tuple:
        cached = self._buckets.get(b)
        if cached is not None:
            if self.max_cached is not None:
                self._buckets.pop(b)  # move-to-end = mark recently used
                self._buckets[b] = cached
            return cached
        from ..sources.io import table_uri

        path = table_uri(os.path.join(self.corpus_dir, "pages", f"bucket={b:03d}"))
        t = pq.read_table(
            path, columns=["url", "status", "content_type", "html", "latency_ms"]
        ).combine_chunks()
        index = {u: i for i, u in enumerate(t["url"].to_pylist())}
        if (
            self.max_cached is not None
            and len(self._buckets) >= self.max_cached
        ):
            self._buckets.pop(next(iter(self._buckets)))  # evict LRU
        self._buckets[b] = (index, t)
        return self._buckets[b]

    def get(self, url: str):
        index, t = self._load_bucket(stable_hash64(url) % N_BUCKETS)
        i = index.get(url)
        if i is None:
            return None
        return (
            t["status"][i].as_py(),
            t["content_type"][i].as_py(),
            t["html"][i].as_py(),
            t["latency_ms"][i].as_py(),
        )


class FetchParse:
    def __init__(
        self,
        corpus_dir: str,
        docs_dir: str,
        num_shards: int,
        hot_hosts: dict[str, int] | None = None,
        max_link_candidates: int = 1000,
        per_page_link_cap: int = 20,
        max_depth: int = 3,
        cache_buckets: int | None = None,
    ):
        self.store = PageStore(corpus_dir, max_cached=cache_buckets)
        self.docs_dir = docs_dir
        self.num_shards = num_shards
        self.hot_hosts = dict(hot_hosts or {})
        self.max_link_candidates = max_link_candidates
        self.per_page_link_cap = per_page_link_cap
        self.max_depth = max_depth
        # URLs this fetcher has already emitted for admission (across
        # rounds). Safe to suppress re-emissions: the admission outcome of a
        # URL is deterministic, so any later duplicate would be dropped at
        # the frontier anyway — suppressing it here just cuts shuffle volume.
        self._emitted: set[int] = set()
        # cumulative busy-time telemetry for the adaptive load strategy
        # (pipelines/crawl.ShardedCrawl._assign_fetchers): polled once per
        # round, O(1) state, no hot-path cost beyond two perf_counter calls
        self._busy_s = 0.0
        self._n_fetched = 0

    def load_report(self) -> tuple[float, int]:
        """(cumulative busy seconds, cumulative URLs fetched) — the adaptive
        strategy's per-worker speed signal (the Ray analog of the reference's
        per-process load metrics, `MPI Version/src/load_balancer.c:15`)."""
        return self._busy_s, self._n_fetched

    def runtime_node(self) -> str:
        """Node this actor landed on — placement diagnostics."""
        from ..functions.placement import current_node_id

        return current_node_id()

    def reset_emitted(self) -> None:
        """New crawl adopting this (cache-warm) fetcher: clear the
        cross-round emission-suppression state, keep the page cache."""
        self._emitted.clear()

    def fetch(self, batch: pa.Table, docs_dir: str) -> pa.Table:
        """Entry point for the persistent-actor path: per-round docs dir."""
        self.docs_dir = docs_dir
        return self(batch)

    def fetch_sliced(
        self, batch: pa.Table, docs_dir: str, n_groups: int
    ) -> list[pa.Table]:
        """fetch(), pre-sliced into ``n_groups`` contiguous shard-range
        tables. Called with ``.options(num_returns=n_groups)`` so each slice
        is its OWN object-store entry and a shard pulls only its group's
        bytes — the partitioned exchange the admission shuffle needs on a
        multi-node cluster (the scale seam flagged in
        state/frontier.admit_tables). ``n_groups`` is the exchange
        granularity: set it to the number of NODES (shards co-located on a
        node share a slice and read it from local plasma), not the number
        of shards — per-shard slices at 32 fetchers x 32 shards cost ~1000
        object-store entries per round of pure bookkeeping (measured ~10%
        on the bench crawl) for no traffic win over per-node slices.
        Group of shard s = s * n_groups // num_shards (contiguous ranges);
        slices are zero-copy views of one sorted table."""
        import numpy as np

        t = self.fetch(batch, docs_dir)
        shards = t["shard"].to_numpy()
        order = np.argsort(shards, kind="stable")
        t = t.take(pa.array(order))
        groups = shards[order] * n_groups // self.num_shards
        bounds = np.searchsorted(groups, np.arange(n_groups + 1))
        return [
            t.slice(int(bounds[g]), int(bounds[g + 1] - bounds[g]))
            for g in range(n_groups)
        ]

    def __call__(self, batch: pa.Table) -> pa.Table:
        import time as _time

        _t0 = _time.perf_counter()
        urls = batch["url"].to_pylist()
        depths = batch["depth"].to_pylist()
        seqs = batch["discovered_seq"].to_pylist()

        out = {k: [] for k in LINKS_SCHEMA.names}
        # batch-local dedup (SURVEY.md §2.7 D2): iterate pages in discovery
        # order so the kept occurrence of a URL is the one admission would
        # pick; later same-batch occurrences are duplicates the frontier
        # actor would drop anyway — suppressing them here cuts shuffle volume
        order = sorted(range(len(urls)), key=lambda i: seqs[i])
        urls = [urls[i] for i in order]
        depths = [depths[i] for i in order]
        seqs = [seqs[i] for i in order]
        batch_seen: set[str] = set()
        doc_rows = {
            "doc_id": [],
            "url": [],
            "host": [],
            "depth": [],
            "spans": [],
            "n_spans": [],
            "fetch_status": [],
        }

        for u, depth, seq in zip(urls, depths, seqs):
            page = self.store.get(u)
            host = host_of(u)
            ok = False
            if page is not None:
                status, ctype, html_b, _latency = page
                size = len(html_b)
                # inline-fetch gate (crawler.c:1115) + download_url gates
                # (crawler.c:936): >100 bytes, HTML content type.
                if status != -1 and size > 100 and is_html_content(u, ctype):
                    ok = True
                    html = html_b.decode("utf-8")
                    base_domain = extract_base_domain(u)
                    candidates = (
                        extract_links(html, u, self.max_link_candidates)
                        if depth < self.max_depth
                        else []
                    )
                    doc_rows["doc_id"].append(u)
                    doc_rows["url"].append(u)
                    doc_rows["host"].append(host)
                    doc_rows["depth"].append(depth)
                    spans = html_to_spans(html, candidates)
                    doc_rows["spans"].append(spans)
                    doc_rows["n_spans"].append(len(spans))
                    doc_rows["fetch_status"].append(status)
                    # Per-page admission cap applied in candidate order: the
                    # sharded engine caps CANDIDATES (scale semantics); the
                    # exact mode reproduces the reference's admitted-only cap
                    # in pipelines/crawl.py (divergence documented there).
                    kept = 0
                    for ord_, cand in enumerate(candidates):
                        if kept >= self.per_page_link_cap:
                            break
                        if not is_valid_crawl_url(cand, base_domain):
                            continue
                        kept += 1
                        if cand in batch_seen:
                            continue
                        batch_seen.add(cand)
                        ch = stable_hash64(cand)
                        if ch in self._emitted:
                            continue
                        self._emitted.add(ch)
                        chost = host_of(cand)
                        out["kind"].append("link")
                        out["url"].append(cand)
                        out["host"].append(chost)
                        out["depth"].append(depth + 1)
                        out["priority"].append(
                            combined_priority(cand, u, base_domain)
                        )
                        out["parent_seq"].append(seq)
                        out["link_ord"].append(ord_)
                        out["url_hash"].append(ch)
                        out["shard"].append(
                            shard_for(
                                ch,
                                stable_hash64(chost),
                                self.hot_hosts.get(chost, 1),
                                self.num_shards,
                            )
                        )
            out["kind"].append("outcome")
            out["url"].append(u)
            out["host"].append(host)
            out["depth"].append(depth)
            out["priority"].append(0)
            out["parent_seq"].append(seq)
            out["link_ord"].append(1 if ok else 0)
            uh = stable_hash64(u)
            out["url_hash"].append(uh)
            # Route the outcome to the shard that owns this URL's queue so
            # quarantine applies where the host's (sub-)queue lives.
            out["shard"].append(
                shard_for(
                    uh,
                    stable_hash64(host),
                    self.hot_hosts.get(host, 1),
                    self.num_shards,
                )
            )

        if doc_rows["doc_id"]:
            self._write_docs(doc_rows)
        self._busy_s += _time.perf_counter() - _t0
        self._n_fetched += len(urls)
        return pa.table({f.name: pa.array(out[f.name], f.type) for f in LINKS_SCHEMA})

    def _write_docs(self, doc_rows: dict) -> None:
        os.makedirs(self.docs_dir, exist_ok=True)
        t = pa.table(
            {
                "doc_id": pa.array(doc_rows["doc_id"], pa.string()),
                "url": pa.array(doc_rows["url"], pa.string()),
                "host": pa.array(doc_rows["host"], pa.string()),
                "depth": pa.array(doc_rows["depth"], pa.int32()),
                "spans": pa.array(doc_rows["spans"], SPAN_TYPE),
                "n_spans": pa.array(doc_rows["n_spans"], pa.int32()),
                "fetch_status": pa.array(doc_rows["fetch_status"], pa.int32()),
            }
        )
        # content-keyed filename (doc ids are deterministic for a URL
        # slice) so a RETRIED fetch task after an actor death rewrites the
        # SAME file instead of duplicating doc rows — this is what makes
        # max_task_retries on the fetcher pool safe (atomic os.replace; a
        # crash mid-write leaves only the ignored .tmp)
        import hashlib

        key = hashlib.md5("\n".join(doc_rows["doc_id"]).encode()).hexdigest()
        part = os.path.join(self.docs_dir, f"part-{key}.parquet")
        tmp = part + f".{uuid.uuid4().hex}.tmp"
        pq.write_table(t, tmp)
        os.replace(tmp, part)
