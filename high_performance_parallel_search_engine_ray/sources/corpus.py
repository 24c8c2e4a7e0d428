"""Deterministic synthetic web corpus (FIXTURES.md §1/§3/§4).

Pure function of (profile, seed): identical bytes every run. No external
data, no network. The generated HTML deliberately exercises every branch of
the reference scanner (`Serial Version/src/crawler.c:134-437`): head/title,
medium-vs-plain pages, h1/h2/p capture, script/style/comment skipping, the
six known entities plus unknown-entity skips, both href quote styles,
relative / root-relative / protocol-relative / fragment / tracking-param
links, media links (blacklisted extensions), sub-100-byte bodies, non-HTML
content types, 404/500/timeout statuses.

Tables (written via sources/io.py, parquet-or-lance):
- pages:  url host status content_type html out_links latency_ms bucket
- seeds:  url max_depth max_pages
- robots: host disallow crawl_delay_ms

Profiles: t1-smoke (~200 URLs / 5 hosts, one hot host with ~60% of URLs),
t2-correctness (~5k URLs / 50 hosts), bench (~200k URLs / 500 hosts,
zipfian). See FIXTURES.md §7.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa

from ..functions.hashing import stable_hash64
from .io import read_table, table_uri, write_manifest, write_table

N_BUCKETS = 64

PROFILES = {
    "t1-smoke": dict(n_hosts=5, n_pages=200, hot_frac=0.6, links_per_page=6, seeds=3,
                     para_words=(40, 160), paras=(6, 16)),
    "t2-correctness": dict(n_hosts=50, n_pages=5000, hot_frac=0.25, links_per_page=8,
                           seeds=10, para_words=(40, 160), paras=(6, 16)),
    # bench pages average ~25 KB (real-web-ish) so the crawl's fetch/parse
    # stage is compute-dominated — the quantity the scaling criterion measures
    "bench": dict(n_hosts=600, n_pages=500_000, hot_frac=0.1, links_per_page=10,
                  seeds=40, para_words=(150, 400), paras=(10, 18)),
}

_WORDS = (
    "circuit breaker distributed tracing linux wake up parallel computing "
    "microservices kernel scheduler latency throughput cache coherence "
    "vector index shard replica consensus raft paxos stream batch arrow "
    "column page frontier crawl politeness robots filter bloom cuckoo "
    "token term posting rank score query search engine data pipeline"
).split()


def _host_page_counts(cfg: dict, rng: np.random.RandomState) -> list[int]:
    n_hosts, n_pages = cfg["n_hosts"], cfg["n_pages"]
    hot = int(n_pages * cfg["hot_frac"])
    rest = n_pages - hot
    if n_hosts == 1:
        return [n_pages]
    w = 1.0 / np.arange(1, n_hosts) ** 1.2  # zipf-ish over non-hot hosts
    w = w / w.sum()
    counts = np.maximum(1, (w * rest).astype(int))
    return [hot] + counts.tolist()


def _page_path(rng: np.random.RandomState, idx: int) -> str:
    r = rng.randint(0, 10)
    if idx == 0:
        return ""  # host root
    if r < 3:
        return f"/article/a{idx}"
    if r < 5:
        return f"/post/p{idx}"
    if r == 5:
        return f"/tag/t{idx % 7}/list{idx}"
    if r == 6:
        return f"/page/{idx}"
    if r == 7:
        return f"/topics/topic{idx % 5}/x{idx}"
    return f"/item{idx}"


_WORD_ARR = np.array(_WORDS)


def _sentence(rng: np.random.RandomState, n: int) -> str:
    return " ".join(_WORD_ARR[rng.randint(0, len(_WORDS), size=n)])


def _href_variant(rng: np.random.RandomState, target_url: str, target_path: str) -> str:
    """Write the href in one of several raw shapes that all normalize/resolve
    back to the canonical target (or exercise a filter branch)."""
    r = rng.randint(0, 10)
    if r < 4:
        return target_url  # absolute canonical
    if r == 4:
        return target_url + "#section" + str(rng.randint(0, 5))  # fragment
    if r == 5:
        return target_url + "?utm_source=feed&utm_campaign=x"  # tracking query
    if r == 6:
        return (target_path or "/") if target_path else "/"  # root-relative
    if r == 7:
        return target_url + "/"  # trailing slash
    if r == 8:
        return "//" + target_url.split("://", 1)[1]  # protocol-relative (ref-broken)
    return target_url


def _build_html(
    rng: np.random.RandomState,
    host: str,
    idx: int,
    hrefs: list[str],
    medium: bool,
    paras: tuple[int, int] = (6, 16),
    para_words: tuple[int, int] = (40, 160),
) -> str:
    """Assemble one page. Returns the html string; ``hrefs`` are embedded in
    order (ground truth for extract_links oracle checks)."""
    title = _sentence(rng, 4)
    parts = [
        "<html><head><title>",
        title,
        "</title><style>body{color:#000}</style>",
        "<script>var page=", str(idx), ";</script></head>",
    ]
    parts.append("<body>")
    if medium:
        # medium.com marker must survive the <article> shift so the h1/h2/p
        # branches trigger (crawler.c:244 checks the SHIFTED pointer).
        parts.append('<article data-source="medium.com">')
        parts.append("<h1>" + _sentence(rng, 5) + "</h1>")
    else:
        parts.append("<h1>" + _sentence(rng, 5) + "</h1>")
    n_paras = paras[0] + rng.randint(0, paras[1] - paras[0])
    href_i = 0
    for p in range(n_paras):
        r = rng.randint(0, 8)
        if r == 0:
            parts.append("<!-- hidden " + _sentence(rng, 3) + " -->")
        if r == 1:
            parts.append("<script>console.log('" + _sentence(rng, 2) + "')</script>")
        if medium and r == 2:
            parts.append("<h2>" + _sentence(rng, 3) + "</h2>")
        body = _sentence(rng, para_words[0] + rng.randint(0, para_words[1] - para_words[0]))
        if r == 3:
            body += " &amp; more &lt;tags&gt; &quot;quoted&quot; &nbsp;"
        if r == 4:
            body += " &unknown; &#8212; trailing"
        parts.append("<p>" + body + "</p>")
        # interleave links between paragraphs, alternating quote styles
        while href_i < len(hrefs) and rng.randint(0, 2) == 0:
            href = hrefs[href_i]
            q = '"' if href_i % 2 == 0 else "'"
            parts.append(f"<a href={q}{href}{q}>{_sentence(rng, 2)}</a>")
            href_i += 1
    for href in hrefs[href_i:]:
        q = '"' if href_i % 2 == 0 else "'"
        parts.append(f"<a href={q}{href}{q}>more</a>")
        href_i += 1
    if medium:
        parts.append("</article>")
    parts.append("</body></html>")
    return "".join(parts)


def _build_host_pages(seed: int, host: str, urls: list, cfg: dict) -> dict:
    """One host's pages (deterministic in (seed, host); process-pool safe)."""
    prng = np.random.RandomState((seed * 31 + 7) ^ (stable_hash64(host) & 0x7FFFFFFF))
    medium = "medium.com" in host
    n = len(urls)
    cols = {
        "url": [], "host": [], "status": [], "content_type": [],
        "html": [], "out_links": [], "latency_ms": [], "bucket": [],
    }
    for i, (url, path) in enumerate(urls):
        # choose link targets: same host, skewed toward low indices
        k = min(cfg["links_per_page"], n - 1) if n > 1 else 0
        hrefs = []
        if k:
            # ring edge (i+1) guarantees every page is reachable from the
            # host root, so bench crawls can percolate whole hosts
            targets = {(i + 1) % n} - {i}
            while len(targets) < k:
                t = int(prng.zipf(1.3)) % n if prng.randint(0, 2) else prng.randint(0, n)
                if t != i:
                    targets.add(t)
            for t in sorted(targets):
                turl, tpath = urls[t]
                hrefs.append(_href_variant(prng, turl, tpath))
        # sprinkle filtered-out links: media, cross-host, scheme junk
        r = prng.randint(0, 10)
        if r < 3:
            hrefs.append(f"https://{host}/media/img{i}.png")
        if r in (3, 4):
            hrefs.append("https://other-domain.net/page")
        if r == 5:
            hrefs.append("javascript:void(0)")
        if r == 6:
            hrefs.append("mailto:x@example.org")
        status, ctype = 200, "text/html; charset=utf-8"
        html = _build_html(
            prng, host, i, hrefs, medium,
            paras=cfg.get("paras", (6, 16)),
            para_words=cfg.get("para_words", (40, 160)),
        )
        rr = prng.randint(0, 100)
        if i == 0:
            rr = 99  # seeds / host roots always fetchable HTML
        if rr < 3:
            status = 404  # curl still returns OK + body (no FAILONERROR)
        elif rr < 5:
            status = 500
        elif rr < 7:
            status = -1  # timeout -> curl error path
        elif rr < 9:
            ctype = "image/png"  # content-type gate in download_url
        elif rr == 9:
            html = "<html>tiny</html>"  # sub-100-byte gate
        cols["url"].append(url)
        cols["host"].append(host)
        cols["status"].append(status)
        cols["content_type"].append(ctype)
        cols["html"].append(html.encode("utf-8"))
        cols["out_links"].append(hrefs)
        cols["latency_ms"].append(int(prng.randint(5, 80)))
        cols["bucket"].append(stable_hash64(url) % N_BUCKETS)
    return cols


def generate_corpus(profile: str, seed: int = 42, out_dir: str | None = None) -> str:
    """Generate (or reuse cached) corpus; returns its directory."""
    cfg = PROFILES[profile]
    out_dir = out_dir or f"/tmp/hppse_corpus/{profile}_seed{seed}"
    from .io import read_manifest

    m = read_manifest(out_dir)
    if m is not None and m.get("profile") == profile and m.get("seed") == seed:
        return out_dir

    rng = np.random.RandomState(seed)
    counts = _host_page_counts(cfg, rng)
    hosts = []
    for h in range(len(counts)):
        if h == 0:
            hosts.append("hot.medium.com")  # the hot host, medium-mode pages
        else:
            hosts.append(f"site{h}.example.org")

    # Canonical URL universe per host.
    host_urls: dict[str, list[tuple[str, str]]] = {}
    for host, cnt in zip(hosts, counts):
        urls = []
        prng = np.random.RandomState(seed ^ (stable_hash64(host) & 0x7FFFFFFF))
        for i in range(cnt):
            path = _page_path(prng, i)
            if i == 0 and "medium.com" in host:
                # a bare medium root fails is_valid_crawl_url (no "medium.com/"
                # substring without a path — `Serial Version/src/crawler.c:1020`)
                path = "/home"
            urls.append((f"https://{host}{path}", path))
        host_urls[host] = urls

    import concurrent.futures as cf

    cols = {
        "url": [],
        "host": [],
        "status": [],
        "content_type": [],
        "html": [],
        "out_links": [],
        "latency_ms": [],
        "bucket": [],
    }
    # Hosts are independent (per-host PRNG keyed on (seed, host)), so build
    # them in parallel; results are merged in the deterministic `hosts`
    # order, giving identical bytes to the sequential path.
    with cf.ProcessPoolExecutor(max_workers=min(16, os.cpu_count() or 4)) as ex:
        futures = {
            host: ex.submit(_build_host_pages, seed, host, host_urls[host], cfg)
            for host in hosts
        }
        for host in hosts:
            chunk = futures[host].result()
            for k in cols:
                cols[k].extend(chunk[k])

    pages = pa.table(
        {
            "url": pa.array(cols["url"], pa.string()),
            "host": pa.array(cols["host"], pa.string()),
            "status": pa.array(cols["status"], pa.int32()),
            "content_type": pa.array(cols["content_type"], pa.string()),
            "html": pa.array(cols["html"], pa.large_binary()),
            "out_links": pa.array(cols["out_links"], pa.list_(pa.string())),
            "latency_ms": pa.array(cols["latency_ms"], pa.int32()),
            "bucket": pa.array(cols["bucket"], pa.int32()),
        }
    )
    # One file per hash bucket so the simulated fetcher reads only the
    # buckets a batch needs (stand-in for random-access page fetch).
    for b in range(N_BUCKETS):
        part = pages.filter(pa.compute.equal(pages["bucket"], b))
        write_table(part, os.path.join(out_dir, "pages", f"bucket={b:03d}"))

    # Seeds: root of the hot host + first non-hot hosts.
    seed_urls = [host_urls[hosts[0]][0][0]]
    for h in hosts[1 : cfg["seeds"]]:
        seed_urls.append(host_urls[h][0][0])
    seeds = pa.table(
        {
            "url": pa.array(seed_urls, pa.string()),
            "max_depth": pa.array([3] * len(seed_urls), pa.int32()),
            "max_pages": pa.array([100] * len(seed_urls), pa.int32()),
        }
    )
    write_table(seeds, os.path.join(out_dir, "seeds", "part-0"))

    srng = np.random.RandomState(seed + 1)
    robots = pa.table(
        {
            "host": pa.array(hosts, pa.string()),
            "disallow": pa.array(
                [["/private/", "/admin/"] if srng.randint(0, 3) == 0 else [] for _ in hosts],
                pa.list_(pa.string()),
            ),
            "crawl_delay_ms": pa.array(
                [int(srng.choice([200, 250, 350, 500])) for _ in hosts], pa.int32()
            ),
        }
    )
    write_table(robots, os.path.join(out_dir, "robots", "part-0"))

    write_manifest(
        out_dir,
        {
            "profile": profile,
            "seed": seed,
            "n_pages": pages.num_rows,
            "n_hosts": len(hosts),
            "n_buckets": N_BUCKETS,
            "tables": ["pages", "seeds", "robots"],
        },
    )
    return out_dir


def load_seeds(corpus_dir: str) -> pa.Table:
    return read_table(os.path.join(corpus_dir, "seeds", "part-0"))


def load_robots_rows(corpus_dir: str) -> list[dict]:
    t = read_table(os.path.join(corpus_dir, "robots", "part-0"))
    return t.to_pylist()


def pages_uris(corpus_dir: str) -> list[str]:
    return [
        table_uri(os.path.join(corpus_dir, "pages", f"bucket={b:03d}"))
        for b in range(N_BUCKETS)
    ]
