"""Link-graph operators: edge extraction from interleaved crawl output and
distributed PageRank — the canonical search-engine ranking signal the
reference's BM25 pipeline would consume as a static prior (reference scope:
crawl + rank; `Serial Version/src/crawler.c` extracts the links, this module
ranks with them).

Scale shape
-----------
``pagerank`` is the textbook bulk-synchronous power iteration expressed as
Ray Data dataflow. Per iteration:

  1. attach each edge's source rank via the cost-based broadcast/shuffle
     join (`relational._attach_or_join`) — node-scale build side, so it
     broadcasts at bench scale and flips to a hash-shuffle `Dataset.join`
     at cluster scale, same policy as every dimension join in the repo;
  2. per-edge contribution rank/out_degree (out_degree is attached to the
     EDGE table once, up front — it never changes);
  3. ``groupby(dst).sum`` — the one per-iteration all-to-all, carrying only
     (node, float) rows, never page text;
  4. a union with a zero row per node + ``groupby(node)`` completes the
     inner join to outer semantics (nodes with no in-links keep a row) and
     re-derives the state table; dangling mass (rank parked on nodes with
     no out-links) is summed with a scalar aggregate and redistributed
     uniformly, per the standard formulation.

State is materialized once per iteration — iterating an unmaterialized
Dataset would re-execute the whole lineage each round (same rationale as
``dedup.dup_clusters``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def link_edges(inter, src_col: str = "url"):
    """Interleaved crawl output -> distinct ``(src, dst)`` edge table: one
    row per (page URL, outgoing link URL). Link spans carry the resolved
    target in ``media_ref`` (functions/htmltext.html_to_spans). Block-local
    explode + per-block distinct; the global distinct is a (src, dst)
    groupby — URL pairs only, never spans."""

    def ex(b: pa.Table) -> pa.Table:
        lst = b["spans"].combine_chunks()
        parent = pc.list_parent_indices(lst).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(lst)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        is_link = pc.equal(flat.field("kind"), "link")
        mask = is_link.to_numpy(zero_copy_only=False)
        src = b[src_col].combine_chunks().take(pa.array(parent[mask]))
        t = pa.table({"src": src, "dst": flat.field("media_ref").filter(is_link)})
        # per-block distinct cuts the shuffle before the global groupby
        return t.group_by(["src", "dst"]).aggregate([])

    from ray.data.aggregate import Count

    exploded = inter.map_batches(ex, batch_format="pyarrow")
    return exploded.groupby(["src", "dst"]).aggregate(Count()).drop_columns(
        ["count()"]
    )


def synth_link_graph(docs, out_deg: int = 3, id_col: str = "doc_id"):
    """Deterministic small-scale link graph over the documents table (the
    brief's synthesise-at-small-scale rule): each doc links to
    ``(id * 31 + 17*j + 1) mod (max_id + 1)`` for j in 0..out_deg-1,
    self-loops dropped. Mirrored bit-for-bit by the in-memory verification
    in tests (pagerank itself is float-iterative -> rows-only at the
    driver, exact-vs-numpy in pytest, same policy as kmeans)."""
    from ray.data.aggregate import Max

    hi = int(docs.aggregate(Max(id_col))[f"max({id_col})"])
    n_nodes = hi + 1

    def edges(b: pa.Table) -> pa.Table:
        ids = b[id_col].combine_chunks().to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        src = np.repeat(ids, out_deg)
        j = np.tile(np.arange(out_deg, dtype=np.int64), len(ids))
        dst = (src * 31 + 17 * j + 1) % n_nodes
        keep = src != dst
        return pa.table(
            {
                "src": pa.array(src[keep], pa.int64()),
                "dst": pa.array(dst[keep], pa.int64()),
            }
        )

    return docs.map_batches(edges, batch_format="pyarrow")


def synth_anchor_spans(docs, out_deg: int = 3, anchor_chars: int = 40,
                       id_col: str = "doc_id", text_col: str = "text"):
    """Deterministic interleaved docs with LINK spans for the anchor-text
    contract query (the brief's synthesise-at-small-scale rule): doc i
    carries out_deg link spans targeting ``doc<(i*31+17j+1) mod N>``
    (synth_link_graph's edge rule), each with anchor text = the source
    doc's first `anchor_chars` characters (mirrored by the DuckDB oracle's
    substr). Self-loops dropped, matching the SQL predicate. Output rows
    are north-rule interleaved shape, so `anchor_terms` consumes these and
    real crawl output identically."""
    from ray.data.aggregate import Max

    from .interleave import SPAN_TYPE

    hi = int(docs.aggregate(Max(id_col))[f"max({id_col})"])
    n_nodes = hi + 1

    def spans(b: pa.Table) -> pa.Table:
        ids = b[id_col].combine_chunks().to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        n = len(ids)
        src = np.repeat(ids, out_deg)
        j = np.tile(np.arange(out_deg, dtype=np.int64), n)
        dst = (src * 31 + 17 * j + 1) % n_nodes
        keep = src != dst
        per_doc = keep.reshape(n, out_deg).sum(axis=1)
        offsets = np.zeros(n + 1, dtype=np.int32)
        np.cumsum(per_doc, out=offsets[1:])
        anchor = pc.utf8_slice_codeunits(
            b[text_col].combine_chunks(), 0, anchor_chars
        )
        take = pa.array(np.repeat(np.arange(n), out_deg)[keep])
        struct = pa.StructArray.from_arrays(
            [
                pa.array(np.full(int(keep.sum()), "link"), pa.string()),
                anchor.take(take),
                pa.array(
                    np.char.add("doc", dst[keep].astype("U20")), pa.string()
                ),
                pa.array(j[keep].astype(np.int32), pa.int32()),
            ],
            names=["kind", "text", "media_ref", "offset"],
        )
        return pa.table(
            {
                "doc_id": pa.array(
                    np.char.add("doc", ids.astype("U20")), pa.string()
                ),
                "spans": pa.ListArray.from_arrays(
                    pa.array(offsets, pa.int32()), struct
                ).cast(SPAN_TYPE),
            }
        )

    return docs.map_batches(spans, batch_format="pyarrow")


def anchor_terms(inter):
    """(dst, term, n_links): the anchor-text index — every anchor word the
    corpus uses when linking TO each target URL, with occurrence counts.
    The classic external relevance signal (what OTHER pages call a page)
    that a web-search ranker fuses with BM25's internal signal; the
    reference crawler extracts exactly these (text, href) pairs
    (`Serial Version/src/crawler.c` link extraction) and discards the
    text — this operator keeps it.

    Scale shape: block-local explode of link spans + the shared
    serial-tokenizer kernel over the (short) anchor strings; the one
    shuffle carries (dst, term, partial-count) rows — anchor text and
    spans never leave their block."""
    from ray.data.aggregate import Sum

    from .index import tokenize_batch

    def partial(b: pa.Table) -> pa.Table:
        lst = b["spans"].combine_chunks()
        flat = pc.list_flatten(lst)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        is_link = pc.equal(flat.field("kind"), "link")
        links = pa.table(
            {
                "dst": flat.field("media_ref").filter(is_link),
                "anchor": flat.field("text").filter(is_link),
            }
        )
        toks = tokenize_batch(links, id_col="dst", text_col="anchor")
        g = toks.group_by(["doc_id", "term"]).aggregate([([], "count_all")])
        return g.rename_columns(["dst", "term", "c"])

    return (
        inter.map_batches(partial, batch_format="pyarrow")
        .groupby(["dst", "term"])
        .aggregate(Sum("c", alias_name="n_links"))
    )


def in_degree(edges):
    """(node, in_degree): incoming-link counts — the cheapest authority
    signal and the crawl-priority feature the reference's priority scoring
    approximates. One (node, count) groupby; partial counts per block keep
    the shuffle at distinct-node scale."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        g = (
            pa.table({"node": b["dst"]})
            .group_by(["node"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["node", "n"])

    return (
        edges.map_batches(partial, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum("n", alias_name="in_degree"))
    )


def host_authority(ranks):
    """(host, authority, n_pages): PageRank mass aggregated per host — the
    domain-authority table a crawl scheduler feeds back into URL priority
    scoring (functions/urlnorm.combined_priority takes exactly this kind of
    prior). Host extraction is a vectorized regex over the URL node ids;
    the shuffle carries (host, float) rows only."""
    from ray.data.aggregate import Count, Sum

    def with_host(b: pa.Table) -> pa.Table:
        # scheme://HOST/...; nodes without a scheme keep their first path
        # segment as "host" (consistent with functions/urlnorm.host_of)
        host = pc.replace_substring_regex(
            b["node"], r"^[a-z+.-]+://([^/]*).*$", r"\1"
        )
        host = pc.replace_substring_regex(host, r"^([^/]*)/.*$", r"\1")
        return pa.table({"host": host, "rank": b["rank"]})

    return ranks.map_batches(with_host, batch_format="pyarrow").groupby(
        "host"
    ).aggregate(
        Sum("rank", alias_name="authority"), Count(alias_name="n_pages")
    )


def hits(edges, iters: int = 10, inmemory_threshold: int = 2_000_000):
    """(node, hub, authority): Kleinberg's HITS after ``iters`` mutual
    power iterations with L2 normalization each round — the complement of
    PageRank for query-time authority (authorities = pointed-to by good
    hubs; hubs = pointing at good authorities).

    Same cost policy as ``pagerank``: bounded pull + numpy at or below
    ``inmemory_threshold`` edges; above it the BSP dataflow — per
    iteration, one (node, float) groupby per direction plus two scalar
    L2 aggregates; edges never move after the initial materialize."""
    import ray
    from ray.data.aggregate import Count, Sum

    from .relational import _attach_or_join

    edges = edges.materialize()

    if edges.count() <= inmemory_threshold:
        edf = edges.to_pandas()
        nodes_np = np.unique(
            np.concatenate([edf["src"].to_numpy(), edf["dst"].to_numpy()])
        )
        n = len(nodes_np)
        if n == 0:
            return ray.data.from_arrow(
                pa.table(
                    {
                        "node": pa.array([]),
                        "hub": pa.array([], pa.float64()),
                        "authority": pa.array([], pa.float64()),
                    }
                )
            )
        pos = {v: i for i, v in enumerate(nodes_np)}
        src = edf["src"].map(pos).to_numpy()
        dst = edf["dst"].map(pos).to_numpy()
        h = np.ones(n)
        a = np.ones(n)
        for _ in range(iters):
            a = np.bincount(dst, weights=h[src], minlength=n)
            a /= np.linalg.norm(a) or 1.0
            h = np.bincount(src, weights=a[dst], minlength=n)
            h /= np.linalg.norm(h) or 1.0
        id_arr = (
            pa.array(nodes_np)
            if nodes_np.dtype.kind != "O"
            else pa.array(nodes_np.astype(object), pa.string())
        )
        return ray.data.from_arrow(
            pa.table(
                {
                    "node": id_arr,
                    "hub": pa.array(h, pa.float64()),
                    "authority": pa.array(a, pa.float64()),
                }
            )
        )

    cpus = (
        int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    )
    npart = max(2, cpus // 2)

    def nodes_of(b: pa.Table) -> pa.Table:
        both = pa.concat_arrays(
            [b["src"].combine_chunks(), b["dst"].combine_chunks()]
        )
        return pa.table({"node": pc.unique(both)})

    nodes = (
        edges.map_batches(nodes_of, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Count())
        .drop_columns(["count()"])
        .materialize()
    )

    def _norm_of(state, col):
        sq = state.map_batches(
            lambda b: pa.table({"s": pc.multiply(b[col], b[col])}),
            batch_format="pyarrow",
        ).sum("s")
        return float(sq or 0.0) ** 0.5 or 1.0

    def _push(state, col, key_out, key_group):
        """sum state[col] of the join side over edges into key_group."""
        attached = _attach_or_join(edges, key_out, state, "node", [col], npart)
        sums = (
            attached.map_batches(
                lambda b: pa.table({"node": b[key_group], "v": b[col]}),
                batch_format="pyarrow",
            )
            .groupby("node")
            .aggregate(Sum("v", alias_name="v"))
        )
        zero = nodes.map_batches(
            lambda b: pa.table(
                {
                    "node": b["node"],
                    "v": pa.array(np.zeros(b.num_rows), pa.float64()),
                }
            ),
            batch_format="pyarrow",
        )
        return (
            sums.union(zero)
            .groupby("node")
            .aggregate(Sum("v", alias_name="v"))
            .materialize()
        )

    state = nodes.map_batches(
        lambda b: pa.table(
            {
                "node": b["node"],
                "hub": pa.array(np.ones(b.num_rows), pa.float64()),
                "authority": pa.array(np.ones(b.num_rows), pa.float64()),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(iters):
        auth = _push(
            state.map_batches(
                lambda b: pa.table({"node": b["node"], "hub": b["hub"]}),
                batch_format="pyarrow",
            ),
            "hub",
            "src",
            "dst",
        )
        an = _norm_of(auth, "v")
        auth_n = auth.map_batches(
            lambda b, _n=an: pa.table(
                {"node": b["node"], "authority": pc.divide(b["v"], _n)}
            ),
            batch_format="pyarrow",
        ).materialize()
        hub = _push(auth_n, "authority", "dst", "src")
        hn = _norm_of(hub, "v")
        hub_n = hub.map_batches(
            lambda b, _n=hn: pa.table(
                {"node": b["node"], "hub": pc.divide(b["v"], _n)}
            ),
            batch_format="pyarrow",
        ).materialize()
        state = _attach_or_join(
            hub_n, "node", auth_n, "node", ["authority"], npart
        ).materialize()

    return state


def co_citation_pairs(edges, n_parts: int = 64):
    """(dst_a, dst_b, n_common): page pairs cited by the same source, with
    the number of common citing pages — the classic co-citation similarity
    signal (Small 1973) a related-pages feature feeds on.

    Scale shape: pair expansion happens per SOURCE, so the blow-up is
    bounded by out-degree squared per page, not corpus-squared; sources
    group by a bounded hash partition (many sources vectorized per
    partition — the engine's measured per-group-tax rule), and the final
    (pair) groupby-count shuffles id pairs only."""
    import pandas as pd
    from ray.data.aggregate import Sum

    def with_part(b: pa.Table) -> pa.Table:
        ids = b["src"].combine_chunks().to_numpy(zero_copy_only=False)
        if ids.dtype.kind == "U":
            ids = ids.astype(object)
        part = (pd.util.hash_array(ids, categorize=False) % n_parts).astype(
            np.int32
        )
        return b.append_column("part", pa.array(part))

    def pairs_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["src", "dst"], kind="stable")
        src = g["src"].to_numpy()
        dst = g["dst"].to_numpy()
        _, starts, counts = np.unique(src, return_index=True, return_counts=True)
        oa, ob = [], []
        for s0, c in zip(starts, counts):
            if c < 2:
                continue
            d = dst[s0 : s0 + c]
            iu, ju = np.triu_indices(len(d), k=1)
            oa.extend(d[iu])
            ob.extend(d[ju])
        return pd.DataFrame(
            {
                "dst_a": np.array(oa, dtype=dst.dtype),
                "dst_b": np.array(ob, dtype=dst.dtype),
                "n": np.ones(len(oa), np.int64),
            }
        )

    return (
        edges.map_batches(with_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pairs_part, batch_format="pandas")
        .groupby(["dst_a", "dst_b"])
        .aggregate(Sum("n", alias_name="n_common"))
    )


def pagerank(
    edges,
    damping: float = 0.85,
    iters: int = 10,
    inmemory_threshold: int = 2_000_000,
):
    """(node, rank) PageRank over a ``(src, dst)`` edge Dataset after
    ``iters`` power iterations with uniform init 1/N, uniform teleport and
    uniform dangling-mass redistribution:

        rank'(v) = (1-d)/N + d * (sum_{u->v} rank(u)/deg(u)
                                  + dangling_sum/N)

    Node ids may be any joinable type (int doc ids, URL strings).

    Cost-based, like every small-side decision in this engine: at or below
    ``inmemory_threshold`` edges the graph is pulled ONCE (bounded by the
    threshold) and iterated as numpy bincounts — a Ray groupby costs
    seconds of fixed exchange setup PER ITERATION, which at small graph
    sizes multiplies into minutes of pure overhead for microseconds of
    math. Above the threshold the BSP dataflow below runs (see the module
    docstring); a test pins both paths to identical ranks."""
    import ray
    from ray.data.aggregate import Count, Max, Sum

    from .relational import _attach_or_join

    cpus = (
        int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    )
    npart = max(2, cpus // 2)

    edges = edges.materialize()

    if edges.count() <= inmemory_threshold:
        edf = edges.to_pandas()
        nodes_np = np.unique(
            np.concatenate(
                [edf["src"].to_numpy(), edf["dst"].to_numpy()]
            )
        )
        n = len(nodes_np)
        if n == 0:
            return ray.data.from_arrow(
                pa.table({"node": pa.array([]), "rank": pa.array([], pa.float64())})
            )
        pos = {v: i for i, v in enumerate(nodes_np)}
        src = edf["src"].map(pos).to_numpy()
        dst = edf["dst"].map(pos).to_numpy()
        deg = np.bincount(src, minlength=n)
        r = np.full(n, 1.0 / n)
        for _ in range(iters):
            dang = r[deg == 0].sum()
            contrib = np.bincount(dst, weights=r[src] / deg[src], minlength=n)
            r = (1 - damping) / n + damping * (contrib + dang / n)
        id_arr = (
            pa.array(nodes_np)
            if nodes_np.dtype.kind != "O"
            else pa.array(nodes_np.astype(object), pa.string())
        )
        return ray.data.from_arrow(
            pa.table({"node": id_arr, "rank": pa.array(r, pa.float64())})
        )

    # static: out-degree attached to edges once; node set; dangling flags
    deg = edges.groupby("src").aggregate(Count(alias_name="deg"))
    edges_deg = _attach_or_join(
        edges, "src", deg.rename_columns(["node", "deg"]), "node", ["deg"], npart
    ).materialize()

    def nodes_of(b: pa.Table) -> pa.Table:
        both = pa.concat_arrays(
            [b["src"].combine_chunks(), b["dst"].combine_chunks()]
        )
        return pa.table({"node": pc.unique(both)})

    nodes = (
        edges.map_batches(nodes_of, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Count())
        .drop_columns(["count()"])
        .materialize()
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.map_batches(
            lambda b: pa.table(
                {"node": b["node"], "rank": pa.array([], pa.float64())}
            ),
            batch_format="pyarrow",
        )

    # is_dangling: node never appears as src (deg undefined -> parks mass).
    # Every src IS a node, so +1 per node row and -1 per distinct-src row
    # sum to 1 exactly for dangling nodes, 0 for the rest.
    flags = nodes.map_batches(
        lambda b: pa.table(
            {
                "node": b["node"],
                "is_dangling": pa.array(np.ones(b.num_rows, np.int8)),
            }
        ),
        batch_format="pyarrow",
    ).union(
        deg.map_batches(
            lambda b: pa.table(
                {
                    "node": b["src"],
                    "is_dangling": pa.array(np.zeros(b.num_rows, np.int8) - 1),
                }
            ),
            batch_format="pyarrow",
        )
    )
    # dangling iff only the all-nodes row exists (max flag 1); srcs get -1
    base = (
        flags.groupby("node")
        .aggregate(Sum("is_dangling", alias_name="f"))
        .map_batches(
            lambda b: pa.table(
                {
                    "node": b["node"],
                    "is_dangling": pc.cast(
                        pc.equal(b["f"], 1), pa.int8()
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        .materialize()
    )

    init = 1.0 / n_nodes
    state = base.map_batches(
        lambda b: b.append_column(
            "rank", pa.array(np.full(b.num_rows, init), pa.float64())
        ),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(iters):
        dangling_sum = (
            state.map_batches(
                lambda b: pa.table(
                    {
                        "d": pc.multiply(
                            b["rank"],
                            pc.cast(b["is_dangling"], pa.float64()),
                        )
                    }
                ),
                batch_format="pyarrow",
            ).sum("d")
            or 0.0
        )
        contribs = _attach_or_join(
            edges_deg, "src", state, "node", ["rank"], npart
        ).map_batches(
            lambda b: pa.table(
                {
                    "node": b["dst"],
                    "in_sum": pc.divide(
                        b["rank"], pc.cast(b["deg"], pa.float64())
                    ),
                    "is_dangling": pa.array(
                        np.zeros(b.num_rows, np.int8)
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        zero = state.map_batches(
            lambda b: pa.table(
                {
                    "node": b["node"],
                    "in_sum": pa.array(np.zeros(b.num_rows), pa.float64()),
                    "is_dangling": b["is_dangling"],
                }
            ),
            batch_format="pyarrow",
        )
        teleport = (1.0 - damping) / n_nodes
        dang_share = damping * float(dangling_sum) / n_nodes

        def new_rank(b: pa.Table) -> pa.Table:
            s = b["in_sum"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "node": b["node"],
                    "is_dangling": pc.cast(b["flag"], pa.int8()),
                    "rank": pa.array(
                        teleport + damping * s + dang_share, pa.float64()
                    ),
                }
            )

        state = (
            contribs.union(zero)
            .groupby("node")
            .aggregate(
                Sum("in_sum", alias_name="in_sum"),
                Max("is_dangling", alias_name="flag"),
            )
            .map_batches(new_rank, batch_format="pyarrow")
            .materialize()
        )

    return state.drop_columns(["is_dangling"])


def seed_hops(
    edges,
    seeds: list[int],
    max_hops: int = 3,
    inmemory_threshold: int = 2_000_000,
):
    """(node, hop): minimum hop distance from the seed set along directed
    edges, for hop <= max_hops — exact distributed BFS, the iterative-graph
    companion of `pagerank`/`hits` whose result is integer-exact (so it
    oracle-hashes against a DuckDB recursive CTE, unlike the float-iterative
    rank operators).

    This is the crawl-analysis primitive "which pages are within k clicks
    of the seeds" — the same frontier-expansion semantics the crawl engine
    runs live (`pipelines/crawl.py` depth limits), expressed over a stored
    edge table.

    Cost-based, same policy as pagerank: at or below ``inmemory_threshold``
    edges the graph is pulled ONCE and BFS runs as numpy searchsorted hops
    (a Ray exchange costs seconds PER HOP of fixed setup — pure overhead on
    small graphs). Above it, the distributed loop per hop:

      1. frontier semi-join: `_attach_or_join(edges, src, frontier)` —
         itself cost-based (frontier broadcast when small, hash-shuffle
         join when a hop explodes), so no driver state ever exceeds the
         broadcast threshold;
      2. candidate dst's anti-join the reached set partition-grouped
         (hash(node) % 64 union + per-partition np.isin — the
         dedup_keep_first shape), so reached never leaves the cluster;
      3. new nodes take hop h; reached = reached UNION new.

    Per-hop cost is one edges pass + one bounded shuffle of (node, hop)
    rows; edges are materialized once. max_hops bounds the iteration.
    Returns a Dataset of (node, hop) for every node reachable in
    <= max_hops hops (seeds at hop 0)."""
    import pandas as pd
    import ray

    from .relational import _attach_or_join, _join_partitions

    N_PARTS = 64
    seeds_np = np.unique(np.asarray(list(seeds), dtype=np.int64))

    edges = edges.materialize()
    if edges.count() <= inmemory_threshold:
        edf = edges.to_pandas()
        src = edf["src"].to_numpy().astype(np.int64)
        dst = edf["dst"].to_numpy().astype(np.int64)
        order = np.argsort(src, kind="stable")
        src_s, dst_s = src[order], dst[order]
        dist: dict[int, int] = {int(s): 0 for s in seeds_np}
        frontier = seeds_np
        for h in range(1, max_hops + 1):
            if frontier.size == 0:
                break
            lo = np.searchsorted(src_s, frontier, side="left")
            hi = np.searchsorted(src_s, frontier, side="right")
            if lo.size == 0:
                break
            nxt = np.unique(
                np.concatenate(
                    [dst_s[a:b] for a, b in zip(lo, hi) if b > a]
                    or [np.array([], dtype=np.int64)]
                )
            )
            new = np.array(
                [v for v in nxt if int(v) not in dist], dtype=np.int64
            )
            for v in new:
                dist[int(v)] = h
            frontier = new
        items = sorted(dist.items())
        return ray.data.from_arrow(
            pa.table(
                {
                    "node": pa.array([k for k, _ in items], pa.int64()),
                    "hop": pa.array([v for _, v in items], pa.int64()),
                }
            )
        )

    npart = _join_partitions(n_joins=1)

    def tag_part(tag: int):
        def f(b: pa.Table) -> pa.Table:
            nodes = b["node"].to_numpy().astype(np.int64)
            return pa.table(
                {
                    "node": pa.array(nodes),
                    "hop": pc.cast(b["hop"], pa.int64())
                    if "hop" in b.column_names
                    else pa.array(np.zeros(len(nodes), np.int64)),
                    "part": pa.array((nodes % N_PARTS).astype(np.int32)),
                    "tag": pa.array(np.full(len(nodes), tag, np.int8)),
                }
            )

        return f

    reached = ray.data.from_arrow(
        pa.table(
            {
                "node": pa.array(seeds_np, pa.int64()),
                "hop": pa.array(np.zeros(len(seeds_np), np.int64)),
            }
        )
    ).materialize()
    frontier_ds = reached

    for h in range(1, max_hops + 1):
        if frontier_ds.count() == 0:
            break
        cand = _attach_or_join(
            edges,
            "src",
            frontier_ds.map_batches(
                lambda b: pa.table({"node": b["node"]}), batch_format="pyarrow"
            ),
            "node",
            [],
            npart,
        ).map_batches(
            lambda b: pa.table(
                {"node": pc.cast(b["dst"], pa.int64())}
            ),
            batch_format="pyarrow",
        )

        def anti_part(g: pd.DataFrame) -> pd.DataFrame:
            seen = g.loc[g["tag"] == 1, "node"].to_numpy()
            cand_nodes = g.loc[g["tag"] == 0, "node"].to_numpy()
            new = np.unique(cand_nodes[~np.isin(cand_nodes, seen)])
            return pd.DataFrame({"node": new})

        new_ds = (
            cand.map_batches(tag_part(0), batch_format="pyarrow")
            .union(reached.map_batches(tag_part(1), batch_format="pyarrow"))
            .groupby("part")
            .map_groups(anti_part, batch_format="pandas")
            .map_batches(
                lambda b, _h=h: pa.table(
                    {
                        "node": pc.cast(b["node"], pa.int64()),
                        "hop": pa.array(
                            np.full(b.num_rows, _h, np.int64)
                        ),
                    }
                ),
                batch_format="pyarrow",
            )
            .materialize()
        )
        reached = reached.union(new_ds).materialize()
        frontier_ds = new_ds

    return reached.sort("node")


def triangle_list(edges):
    """(a, b, c) with a < b < c: every triangle in the undirected view of
    the edge table — the classic distributed-graph benchmark op (clustering
    coefficients, community seeds, spam-farm detection all start here), and
    a different algorithmic shape from the iterative ops (pagerank/hits/
    seed_hops): one wedge expansion + one co-located membership join, no
    iteration.

    Exact algorithm, each triangle emitted ONCE at its smallest member:
      1. canonicalize (u=min, v=max), drop self-loops; distinct edges via
         partition-grouped dedup (hash(u,v) % 64 — only (int, int) rows
         ever shuffle);
      2. wedges at the smallest node: partition by u % 64, per-partition
         vectorized self-merge of the adjacency on u, keep v1 < v2 — so a
         triangle a<b<c becomes the candidate (a, b, c) exactly once.
         Candidate volume is sum_u C(deg+(u), 2) where deg+ is CANONICAL
         out-degree; on skewed real graphs the standard mitigation is
         degree-ordered orientation (direct edges low->high degree, which
         caps deg+ at O(sqrt(|E|))) — same partition shape, different
         orientation rule, documented not implemented;
      3. membership: candidates (b, c) and edges (u, v) co-locate by
         hash % 64 and a per-partition vectorized merge keeps candidates
         whose closing edge exists.

    Returns a Dataset of (a, b, c) int64 rows, each triangle once."""
    import pandas as pd

    N_PARTS = 64

    def canon(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy().astype(np.int64)
        d = b["dst"].to_numpy().astype(np.int64)
        keep = s != d
        u = np.minimum(s[keep], d[keep])
        v = np.maximum(s[keep], d[keep])
        # per-block pre-dedup before the partition-grouped distinct; the
        # int64 pack assumes node ids < 2^32 (true for every graph here —
        # for a wider id space swap in a 128-bit pack or tuple dedup)
        packed = np.unique(u * np.int64(1 << 32) + v)
        pu = packed >> np.int64(32)
        pv = packed & np.int64((1 << 32) - 1)
        return pa.table(
            {
                "u": pa.array(pu),
                "v": pa.array(pv),
                "part": pa.array(((pu * 31 + pv) % N_PARTS).astype(np.int32)),
            }
        )

    def dedup_part(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["u", "v"])[["u", "v"]]

    dedup = (
        edges.map_batches(canon, batch_format="pyarrow")
        .groupby("part")
        .map_groups(dedup_part, batch_format="pandas")
        .materialize()  # consumed twice: wedge source and closing-edge probe
    )

    def by_u(b: pa.Table) -> pa.Table:
        u = b["u"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "u": pa.array(u),
                "v": pc.cast(b["v"], pa.int64()),
                "part": pa.array((u % N_PARTS).astype(np.int32)),
            }
        )

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        adj = g[["u", "v"]]
        m = adj.merge(adj, on="u", suffixes=("_1", "_2"))
        m = m[m["v_1"] < m["v_2"]]
        return pd.DataFrame(
            {"a": m["u"], "b": m["v_1"], "c": m["v_2"]}
        )

    cand = (
        dedup.map_batches(by_u, batch_format="pyarrow")
        .groupby("part")
        .map_groups(wedges, batch_format="pandas")
    )

    def tag_cand(b: pa.Table) -> pa.Table:
        bb = b["b"].to_numpy().astype(np.int64)
        cc = b["c"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "a": pc.cast(b["a"], pa.int64()),
                "b": pa.array(bb),
                "c": pa.array(cc),
                "part": pa.array(((bb * 31 + cc) % N_PARTS).astype(np.int32)),
                "tag": pa.array(np.zeros(len(bb), np.int8)),
            }
        )

    def tag_edge(b: pa.Table) -> pa.Table:
        u = b["u"].to_numpy().astype(np.int64)
        v = b["v"].to_numpy().astype(np.int64)
        return pa.table(
            {
                "a": pa.array(np.full(len(u), -1, np.int64)),
                "b": pa.array(u),
                "c": pa.array(v),
                "part": pa.array(((u * 31 + v) % N_PARTS).astype(np.int32)),
                "tag": pa.array(np.ones(len(u), np.int8)),
            }
        )

    def close(g: pd.DataFrame) -> pd.DataFrame:
        have = g.loc[g["tag"] == 1, ["b", "c"]]
        cands = g.loc[g["tag"] == 0, ["a", "b", "c"]]
        return cands.merge(have, on=["b", "c"])

    return (
        cand.map_batches(tag_cand, batch_format="pyarrow")
        .union(dedup.map_batches(tag_edge, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(close, batch_format="pandas")
    )


def kcore(edges, k: int = 2, inmemory_threshold: int = 2_000_000, max_iters: int = 50):
    """(node, deg): the k-CORE of the undirected graph — iteratively peel
    nodes of degree < k until the fixpoint; `deg` is the node's degree
    INSIDE the surviving subgraph. The classic graph-mining density screen
    (spam farms and template link-rings survive high k; organic long-tail
    pages don't) completing the iterative family: pagerank/hits (float),
    seed_hops (traversal), triangles (local), kcore (global fixpoint).
    Peeling is non-monotone, so no recursive-CTE oracle — exactness is
    pinned by a brute-force peeling reference in pytest.

    Edges are symmetrized, self-loops dropped, and parallel edges deduped
    partition-grouped (hash(u) % 64 co-location, one vectorized
    drop_duplicates per partition) before any degree counting.

    Cost-based, same policy as pagerank/seed_hops: at or below
    ``inmemory_threshold`` edges the peel runs as one numpy loop on the
    driver (a Ray exchange per ITERATION is pure overhead on small
    graphs). Above it, each iteration is:

      1. degrees: per-block (node, 1) partials -> one groupby-sum
         (node-bounded rows move, never edges);
      2. survivors co-locate with edges by hash(endpoint) % 64 — one
         marker-union + per-partition vectorized np.isin per ENDPOINT
         (the dedup_keep_first shape) filters the edge set in place.

    Iteration count is bounded by ``max_iters`` (each pass strictly
    shrinks the node set or terminates)."""
    import pandas as pd
    import ray
    from ray.data.aggregate import Sum

    N_PARTS = 64

    def symmetrize(b: pa.Table) -> pa.Table:
        s = b["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = b["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        u = np.concatenate([s, d])
        v = np.concatenate([d, s])
        keep = u != v
        return pa.table(
            {"u": pa.array(u[keep]), "v": pa.array(v[keep])}
        )

    und = edges.map_batches(symmetrize, batch_format="pyarrow")

    def add_part_u(b: pa.Table) -> pa.Table:
        part = (
            b["u"].to_numpy(zero_copy_only=False).astype(np.int64) * 2654435761
            % N_PARTS
        ).astype(np.int32)
        return b.append_column("part", pa.array(part))

    def dedup_part(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["u", "v"])[["u", "v"]]

    und = (
        und.map_batches(add_part_u, batch_format="pyarrow")
        .groupby("part")
        .map_groups(dedup_part, batch_format="pandas")
        .materialize()
    )

    if und.count() <= inmemory_threshold:
        df = und.to_pandas()
        u = df["u"].to_numpy().astype(np.int64)
        v = df["v"].to_numpy().astype(np.int64)
        for _ in range(max_iters):
            if len(u) == 0:
                break
            nodes, deg = np.unique(u, return_counts=True)
            dropped = nodes[deg < k]
            if dropped.size == 0:
                break
            keep = ~np.isin(u, dropped) & ~np.isin(v, dropped)
            u, v = u[keep], v[keep]
        if len(u) == 0:
            return ray.data.from_arrow(
                pa.table(
                    {"node": pa.array([], pa.int64()), "deg": pa.array([], pa.int64())}
                )
            )
        nodes, deg = np.unique(u, return_counts=True)
        return ray.data.from_arrow(
            pa.table({"node": pa.array(nodes), "deg": pa.array(deg.astype(np.int64))})
        )

    def degrees(ds):
        def partial(b: pa.Table) -> pa.Table:
            n, c = np.unique(
                b["u"].to_numpy(zero_copy_only=False).astype(np.int64),
                return_counts=True,
            )
            return pa.table(
                {"node": pa.array(n), "d": pa.array(c.astype(np.int64))}
            )

        return (
            ds.map_batches(partial, batch_format="pyarrow")
            .groupby("node")
            .aggregate(Sum("d", alias_name="deg"))
        )

    def filter_endpoint(ds, deg_ds, col: str):
        # survivors co-locate with edges by hash(col) % 64: marker rows
        # (u=node, v=-1) union in, one vectorized isin per partition
        def surv_marker(b: pa.Table) -> pa.Table:
            nodes = b["node"].to_numpy(zero_copy_only=False).astype(np.int64)
            keep = b["deg"].to_numpy(zero_copy_only=False).astype(np.int64) >= k
            nodes = nodes[keep]
            return pa.table(
                {
                    "u": pa.array(nodes if col == "u" else np.full(len(nodes), -1)),
                    "v": pa.array(nodes if col == "v" else np.full(len(nodes), -1)),
                    "is_marker": pa.array(np.ones(len(nodes), bool)),
                }
            )

        def edge_rows(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "u": b["u"],
                    "v": b["v"],
                    "is_marker": pa.array(np.zeros(b.num_rows, bool)),
                }
            )

        def add_part(b: pa.Table) -> pa.Table:
            key = b[col].to_numpy(zero_copy_only=False).astype(np.int64)
            return b.append_column(
                "part", pa.array((key * 2654435761 % N_PARTS).astype(np.int32))
            )

        def keep_alive(g: pd.DataFrame) -> pd.DataFrame:
            alive = g.loc[g["is_marker"], col].to_numpy()
            e = g[~g["is_marker"]]
            return e[np.isin(e[col].to_numpy(), alive)][["u", "v"]]

        tagged = (
            deg_ds.map_batches(surv_marker, batch_format="pyarrow")
            .union(ds.map_batches(edge_rows, batch_format="pyarrow"))
            .map_batches(add_part, batch_format="pyarrow")
        )
        return tagged.groupby("part").map_groups(keep_alive, batch_format="pandas")

    cur = und
    for _ in range(max_iters):
        deg = degrees(cur).materialize()
        n_dropped = deg.map_batches(
            lambda b: pa.table(
                {
                    "x": pa.array(
                        [
                            int(
                                (
                                    b["deg"].to_numpy(zero_copy_only=False) < k
                                ).sum()
                            )
                        ],
                        pa.int64(),
                    )
                }
            ),
            batch_format="pyarrow",
        ).sum("x")
        if not n_dropped:
            break
        cur = filter_endpoint(cur, deg, "u")
        cur = filter_endpoint(cur, deg, "v").materialize()
        if cur.count() == 0:
            break
    final = degrees(cur)
    return final.map_batches(
        lambda b: b.filter(
            pa.array(b["deg"].to_numpy(zero_copy_only=False) >= k)
        ),
        batch_format="pyarrow",
    )
