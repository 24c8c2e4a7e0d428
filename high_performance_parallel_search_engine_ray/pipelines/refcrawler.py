"""Serial oracle crawler: direct transliteration of the reference BFS loop.

`crawl_website` (`Serial Version/src/crawler.c:1032-1403`) over the synthetic
corpus, with the network replaced by a dict lookup. This module is pure
Python (no Ray) and is the ground truth the Ray pipelines are tested against
(SURVEY.md §5.3: identical visit order + identical URL-seen set).

Fetch simulation semantics (mapping libcurl behavior):
- status == -1            -> curl error (res != CURLE_OK)
- any other status        -> CURLE_OK with the stored body (the reference
  sets no CURLOPT_FAILONERROR, so 404/500 bodies are crawled as content)
- inline fetch succeeds when body size > 100 (`crawler.c:1115`)
- download_url additionally gates on is_html_content + size >= 100
  (`crawler.c:936`); the reference's accidental double-fetch
  (`crawler.c:1095-1113` then `:876-976`) is reflected in the virtual-time
  budget (two latencies per page) but obviously not re-downloaded.

Politeness: the reference sleeps rand()%300+200 ms per dequeued fetch
attempt (`crawler.c:1380`; skipped-invalid items `continue` PAST the sleep).
We draw the same deterministic sequence from PolitenessBudget so the engine
and this oracle account identical virtual time.

Reproduced capacity semantics: visited list capped at MAX_URLS=1000 entries
(beyond it, mark_visited is a no-op => re-admission), circular queue full
check (occupancy != MAX_URLS-1), 20-admissions-per-page cap, 10-consecutive-
failure abort.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..functions.htmltext import html_to_events, html_to_spans
from ..functions.urlnorm import (
    extract_base_domain,
    extract_links,
    is_html_content,
    is_valid_crawl_url,
    normalize_url,
)

MAX_URLS = 1000


class PolitenessBudget:
    """Deterministic stand-in for the reference's unseeded rand()%300+200.
    Both the oracle and the engine's exact mode draw from this sequence in
    dequeue order, so 'same politeness budget' is testable without
    replicating glibc rand()."""

    def __init__(self, seed: int = 1):
        self._rng = np.random.RandomState(seed)

    def next_sleep_ms(self) -> int:
        return int(self._rng.randint(0, 300) + 200)


@dataclass
class CrawlTrace:
    visits: list = field(default_factory=list)  # dicts: visit_seq,url,depth,outcome
    seen: list = field(default_factory=list)  # mark order
    docs: dict = field(default_factory=dict)  # url -> span rows
    pages_crawled: int = 0
    virtual_ms: float = 0.0


class VisitedList:
    """Exact transliteration of has_visited/mark_visited
    (`Serial Version/src/crawler.c:447-484`): normalized compare, 1000-entry
    cap after which marks are silently dropped."""

    def __init__(self):
        self.order: list[str] = []
        self._set: set[str] = set()

    def has(self, url: str | None) -> bool:
        if not url:
            return True
        normalized = normalize_url(url)
        if not normalized:
            return True
        return normalized in self._set

    def mark(self, url: str | None) -> None:
        if not url:
            return
        normalized = normalize_url(url)
        if not normalized or normalized in self._set:
            return
        if len(self.order) < MAX_URLS:
            self.order.append(normalized)
            self._set.add(normalized)


def crawl_serial(
    corpus: dict[str, dict],
    start_url: str,
    max_depth: int,
    max_pages: int,
    politeness: PolitenessBudget | None = None,
    collect_docs: bool = True,
) -> CrawlTrace:
    """One seed's crawl, byte-faithful to `crawl_website`.

    ``corpus``: canonical url -> {status, content_type, html(str), latency_ms}.
    """
    politeness = politeness or PolitenessBudget()
    trace = CrawlTrace()
    visited = VisitedList()

    normalized_start = normalize_url(start_url)
    if not normalized_start:
        return trace

    queue: list[tuple[str, int]] = [(normalized_start, 1)]
    front = 0  # index into queue; occupancy = len(queue) - front
    visited.mark(normalized_start)
    trace.seen = visited.order  # alias; reflects live marks

    base_domain = extract_base_domain(start_url)
    failed_downloads = 0

    while front < len(queue) and trace.pages_crawled < max_pages and failed_downloads < 10:
        current_url, current_depth = queue[front]
        front += 1

        if not is_valid_crawl_url(current_url, base_domain):
            trace.visits.append(
                {
                    "visit_seq": len(trace.visits),
                    "url": current_url,
                    "depth": current_depth,
                    "outcome": "skipped_invalid",
                }
            )
            continue  # skips the politeness sleep (crawler.c:1085)

        page = corpus.get(current_url)
        # inline fetch (crawler.c:1095-1115): OK unless timeout; needs >100B
        fetched_ok = (
            page is not None and page["status"] != -1 and len(page["html"]) > 100
        )
        outcome = "failed"
        if fetched_ok:
            trace.virtual_ms += page["latency_ms"]
            # download_url refetch (crawler.c:1282 -> 876-976)
            trace.virtual_ms += page["latency_ms"]
            if is_html_content(current_url, page["content_type"]) and len(page["html"]) >= 100:
                outcome = "fetched"
                trace.pages_crawled += 1
                failed_downloads = 0
                if collect_docs and current_url not in trace.docs:
                    trace.docs[current_url] = page["html"]
                if current_depth < max_depth:
                    candidates = extract_links(
                        page["html"], current_url, MAX_URLS, visited=visited.has
                    )
                    added = 0
                    for cand in candidates:
                        # circular-queue-full check (crawler.c:1299)
                        if (len(queue) - front) == MAX_URLS - 1 or added >= 20:
                            break
                        if not is_valid_crawl_url(cand, base_domain):
                            continue
                        if visited.has(cand):
                            continue
                        queue.append((cand, current_depth + 1))
                        visited.mark(cand)
                        added += 1
            else:
                failed_downloads += 1
        else:
            if page is not None and page["status"] != -1:
                trace.virtual_ms += page["latency_ms"]
            failed_downloads += 1

        trace.visits.append(
            {
                "visit_seq": len(trace.visits),
                "url": current_url,
                "depth": current_depth,
                "outcome": outcome,
            }
        )
        trace.virtual_ms += politeness.next_sleep_ms()

    return trace


def crawl_seed_list(
    corpus: dict[str, dict], seeds: list[dict], politeness_seed: int = 1
) -> list[CrawlTrace]:
    """Independent per-seed crawls (each reference run resets its visited
    set, `crawler.c:1037`); combined docs are first-writer-wins by url."""
    return [
        crawl_serial(
            corpus,
            s["url"],
            int(s["max_depth"]),
            int(s["max_pages"]),
            PolitenessBudget(politeness_seed + i),
        )
        for i, s in enumerate(seeds)
    ]


def corpus_lookup(pages_table) -> dict[str, dict]:
    """pages Arrow table -> url-keyed dict with decoded html."""
    out = {}
    d = pages_table.to_pydict()
    for i in range(len(d["url"])):
        out[d["url"][i]] = {
            "status": d["status"][i],
            "content_type": d["content_type"][i],
            "html": d["html"][i].decode("utf-8"),
            "latency_ms": d["latency_ms"][i],
        }
    return out


def golden_docs(trace_docs: dict[str, str]) -> list[dict]:
    """url -> html dict into golden interleaved-doc rows (doc_id, spans)."""
    rows = []
    for url, html in trace_docs.items():
        links = extract_links(html, url, MAX_URLS)  # span links: post-session view
        rows.append({"doc_id": url, "spans": html_to_spans(html, links)})
    return rows


def flat_text(html: str) -> str:
    """Reference flat-file body (without the 'Source URL:' header)."""
    from ..functions.htmltext import render_flat

    return render_flat(html_to_events(html))
