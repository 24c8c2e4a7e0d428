"""BM25 ranking as a Ray Data pipeline.

Formula transliterated from `rank_bm25` (`Serial Version/src/ranking.c:27-91`):

  idf   = ln((N - df + 0.5) / (df + 0.5) + 1.0)        (ranking.c:55)
  score = idf * (tf * (1.5+1)) / (tf + 1.5*(1 - 0.75 + 0.75*dl/avgdl))
                                                        (ranking.c:61)
  k1 = 1.5, b = 0.75 hardcoded (config.ini's BM25_K1=1.2 is never parsed —
  SURVEY.md §2.9); query tokenized on whitespace only (ranking.c:36);
  results sorted score-desc, zero scores dropped (ranking.c:87-90).

Dataflow (broadcast-small-side join, SURVEY.md §2.4 J1):
  tf rows for the query's terms only (vectorized is_in filter — tiny slice)
  -> df per term (small aggregate, broadcast as a dict)
  -> per-row score in map_batches (numpy, float64, same expression shape as
     the DuckDB oracle so doubles agree bit-for-bit)
  -> groupby(doc_id).sum -> sort(score desc, doc_id asc) -> limit k

avgdl = total kept tokens / total docs (docs with zero kept tokens count in
the denominator, as the reference's loop over 0..total_docs does,
ranking.c:39-42). Tie-break doc_id asc (the C qsort is unstable; ties are
rare and the deterministic rule is documented here).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.distinct import distinct_values
from ..functions.rounding import round_half_away
from ..functions.tokenize import tokenize_query
from .index import term_doc_tf

K1 = 1.5
B = 0.75


def bm25_topk(
    docs,
    query: str,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int | None = 6,
    tf=None,
    stats: tuple | None = None,
):
    """Top-k (doc_id, score) for one query over a (doc_id, text) Dataset.
    Returns a pyarrow Table (small result; schema stable even when empty).
    Pass a precomputed/materialized ``tf`` (term_doc_tf output) to share the
    tokenize pass across queries (multi-query loops, expanded retries).
    Pass ``stats=(n_docs, avgdl)`` to serve from a PERSISTED index
    (``bm25_from_index``): ``docs`` may then be None and ``tf`` may be
    pre-pruned to the query terms — no corpus pass runs at all.

    Scale note (100 TB): the plain single-query call runs ONE fused
    tokenize pass and materializes only the query-term slice plus one
    (token-sum, doc-count) sentinel row per batch — nothing corpus-scale
    is ever pinned in the object store. Repeated serving should still use
    a persisted index (``index.write_term_index`` + ``bm25_from_index``),
    which reads only the query terms' hash buckets per query."""
    import ray

    id_type = (
        docs.schema().base_schema.field(id_col).type
        if docs is not None
        else tf.schema().base_schema.field(id_col).type
    )
    out_schema = pa.schema([(id_col, id_type), ("score", pa.float64())])

    qterms = tokenize_query(query)
    if not qterms:
        return out_schema.empty_table()
    qset = pa.array(sorted(set(qterms)))

    def only_query_terms(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b["term"], value_set=qset))

    if tf is None and stats is None:
        # Single-query ad-hoc path: ONE tokenize pass. Each batch emits its
        # query-term tf rows plus one SENTINEL row (term="" — the tokenizer
        # never emits empty terms) carrying the batch's total kept tokens
        # (tf field) and input row count (dl field). Only this tiny result
        # materializes; the full corpus tf table never pins.
        from .index import tf_dl_batch

        def fused(b: pa.Table) -> pa.Table:
            t = tf_dl_batch(b, id_col, text_col)
            kept = t.filter(pc.is_in(t["term"], value_set=qset))
            sentinel = pa.table(
                {
                    "term": pa.array([""], pa.string()),
                    "doc_id": pa.array([None], t.schema.field("doc_id").type),
                    "tf": pa.array(
                        [pc.sum(t["tf"]).as_py() or 0],
                        t.schema.field("tf").type,
                    ),
                    "dl": pa.array([b.num_rows], t.schema.field("dl").type),
                }
            )
            return pa.concat_tables([kept, sentinel])

        fused_mat = docs.map_batches(fused, batch_format="pyarrow").materialize()
        meta = fused_mat.map_batches(
            lambda b: b.filter(pc.equal(b["term"], "")),
            batch_format="pyarrow",
        )
        n_docs = meta.sum("dl") or 0
        total_tokens = meta.sum("tf") or 0
        if n_docs == 0:
            return out_schema.empty_table()
        avgdl = total_tokens / n_docs
        tf_q = fused_mat.map_batches(
            lambda b: b.filter(pc.not_equal(b["term"], "")),
            batch_format="pyarrow",
        )
    else:
        if tf is None:
            tf = term_doc_tf(docs, id_col, text_col).materialize()
        # tf_q is tiny (query terms only) and consumed twice (df + scoring).
        # ONE tokenize pass upstream: tf is consumed up to three times
        # (total_tokens, df, scoring) and each action would otherwise re-run
        # the whole tokenize pipeline (measured 3-4x redundant work per
        # query); materialize() pins blocks in the OBJECT STORE, not the
        # driver.
        tf_q = tf.map_batches(
            only_query_terms, batch_format="pyarrow"
        ).materialize()

        if stats is None:
            # Global corpus stats: N docs, total kept tokens. Small
            # aggregates over the shared materialized tf.
            n_docs = docs.count()
            total_tokens = tf.map_batches(
                lambda b: pa.table({"s": [pc.sum(b["tf"]).as_py() or 0]}),
                batch_format="pyarrow",
            ).sum("s")
            avgdl = (total_tokens or 0) / n_docs
        else:
            n_docs, avgdl = stats

    from ray.data.aggregate import Count

    df_rows = tf_q.groupby("term").aggregate(Count(alias_name="df")).take_all()
    df_map = {r["term"]: r["df"] for r in df_rows}
    # A query term can appear multiple times (each occurrence re-scores in
    # the C loop, ranking.c:46-79) — weight = occurrences.
    weights = {}
    for t in qterms:
        weights[t] = weights.get(t, 0) + 1
    df_ref = ray.put((df_map, weights, n_docs, avgdl))

    def score_batch(b: pa.Table) -> pa.Table:
        dfm, w, n, adl = ray.get(df_ref)
        terms = b["term"].to_pylist()
        tf_v = b["tf"].to_numpy().astype(np.float64)
        dl_v = b["dl"].to_numpy().astype(np.float64)
        df_v = np.array([dfm[t] for t in terms], dtype=np.float64)
        w_v = np.array([w[t] for t in terms], dtype=np.float64)
        idf = np.log((n - df_v + 0.5) / (df_v + 0.5) + 1.0)
        score = idf * (tf_v * (K1 + 1)) / (tf_v + K1 * (1 - B + B * dl_v / adl)) * w_v
        return pa.table({id_col: b["doc_id"], "score_part": pa.array(score, pa.float64())})

    scored = tf_q.map_batches(score_batch, batch_format="pyarrow")
    from ray.data.aggregate import Sum

    agg = scored.groupby(id_col).aggregate(Sum("score_part", alias_name="score"))
    if round_to is not None:
        agg = agg.map_batches(
            lambda b: b.set_column(
                b.schema.get_field_index("score"),
                "score",
                round_half_away(b["score"], round_to),
            ),
            batch_format="pyarrow",
        )
    out = agg.map_batches(
        lambda b: b.filter(pc.greater(b["score"], 0.0)), batch_format="pyarrow"
    )
    rows = out.sort(["score", id_col], descending=[True, False]).limit(k).take_all()
    return pa.Table.from_pylist(
        [{id_col: r[id_col], "score": r["score"]} for r in rows], schema=out_schema
    )


def index_term_slice(index_dir: str, terms: list[str], id_col: str = "doc_id"):
    """(manifest, tf-slice Dataset | None) for a set of terms against a
    persisted `index.write_term_index` layout: reads only the terms' hash
    bucket directories with a ``term IN (...)`` predicate pushed into the
    parquet scan, honoring tombstones left by `index.update_term_index`
    (dead (doc, gen) rows are dropped from the tiny slice). This is the
    serving read primitive shared by `bm25_from_index`,
    `bm25_from_index_expanded` and the REST server — at 100 TB the read is
    postings-of-q, never the corpus."""
    import glob

    import pandas as pd
    import pyarrow.dataset as pads
    import ray.data as rd

    from ..sources.io import read_manifest
    from .index import live_postings_mask, read_tombstones

    man = read_manifest(index_dir)
    if man is None:
        raise FileNotFoundError(f"no index manifest under {index_dir}")
    uniq = sorted(set(terms))
    if not uniq:
        return man, None
    hashes = pd.util.hash_array(np.asarray(uniq, dtype=object), categorize=False)
    # modulo on the ARRAY: a np.uint64 SCALAR % python-int promotes to
    # float64 and silently corrupts the bucket (>2^53 hashes)
    buckets = sorted(set((hashes % man["n_buckets"]).astype(np.int64).tolist()))
    # ray.data's parquet reader rejects directory paths in a list when a
    # scan filter is attached -> enumerate the partition files explicitly
    paths = [
        f
        for b in buckets
        for f in sorted(glob.glob(f"{index_dir}/postings/bucket={b}/*.parquet"))
    ]
    tomb = read_tombstones(index_dir)
    if not paths:
        return man, None
    cols = ["term", id_col, "tf", "dl"] + (["gen"] if tomb else [])
    tf_q = rd.read_parquet(
        paths,
        columns=cols,
        filter=pads.field("term").isin(uniq),
    ).materialize()
    if tomb is not None:
        tf_q = tf_q.map_batches(
            lambda b: b.filter(
                pa.array(live_postings_mask(b, tomb, id_col))
            ).select(["term", id_col, "tf", "dl"]),
            batch_format="pyarrow",
        ).materialize()
    return man, tf_q


def bm25_from_index(
    index_dir: str,
    query: str,
    k: int = 10,
    id_col: str = "doc_id",
    round_to: int | None = 6,
):
    """BM25 served from a PERSISTED index (`index.write_term_index`
    layout) via `index_term_slice` — zero corpus passes per query, the
    serving shape the reference's query loop uses against its in-memory
    index (`Serial Version/src/main.c` build-once then query-many).
    Value-identical to ``bm25_topk`` over the same corpus (oracle-checked
    via the bm25_served entry)."""
    qterms = tokenize_query(query)
    if not qterms:
        return pa.table({id_col: pa.array([]), "score": pa.array([], pa.float64())})
    man, tf_q = index_term_slice(index_dir, qterms, id_col)
    if tf_q is None or tf_q.count() == 0:
        id_type = pa.int64()
        return pa.schema([(id_col, id_type), ("score", pa.float64())]).empty_table()
    return bm25_topk(
        None,
        query,
        k=k,
        id_col=id_col,
        round_to=round_to,
        tf=tf_q,
        stats=(man["n_docs"], man["avgdl"]),
    )


def bm25_from_index_expanded(
    index_dir: str,
    query: str,
    k: int = 10,
    id_col: str = "doc_id",
    round_to: int | None = 6,
):
    """The OpenMP plural/singular expansion (`expand_query_terms`,
    `OpenMP Version/src/ranking.c:110-150`) served from a persisted index:
    ONE bucket-pruned read of the candidate expansions (t, t+'s', t[:-1] —
    a 3|q|-element set), term existence decided from that slice, then the
    expanded query scored against the SAME slice filtered down — no corpus
    pass and no second index read. Value-identical to
    `bm25_topk_expanded` over the same corpus."""
    qterms = tokenize_query(query)
    if not qterms:
        return pa.table({id_col: pa.array([]), "score": pa.array([], pa.float64())})
    man, slice_ds = index_term_slice(
        index_dir, sorted(expansion_candidates(qterms)), id_col
    )
    if slice_ds is None or slice_ds.count() == 0:
        return pa.schema([(id_col, pa.int64()), ("score", pa.float64())]).empty_table()
    known = set(distinct_values(slice_ds.select_columns(["term"]), "term"))
    expanded = expand_query_terms(qterms, known)
    exp_arr = pa.array(sorted(set(expanded)))
    tf_q = slice_ds.map_batches(
        lambda b: b.filter(pc.is_in(b["term"], value_set=exp_arr)),
        batch_format="pyarrow",
    ).materialize()
    if tf_q.count() == 0:
        return pa.schema([(id_col, pa.int64()), ("score", pa.float64())]).empty_table()
    return bm25_topk(
        None,
        " ".join(expanded),
        k=k,
        id_col=id_col,
        round_to=round_to,
        tf=tf_q,
        stats=(man["n_docs"], man["avgdl"]),
    )


def snippets(
    docs,
    query: str,
    before: int = 30,
    length: int = 80,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """(doc_id, snippet) for every doc containing a query term: a fixed
    ``length``-char window starting ``before`` chars left of the earliest
    query-term occurrence (case-insensitive) — the result-page excerpt a
    search frontend renders. Vectorized find per term + element-wise min;
    the final per-row slice is C-level str slicing on matched rows only.
    SQL mirror: strpos/substr/least/greatest."""
    import numpy as np

    qterms = sorted(set(tokenize_query(query)))
    if not qterms:
        return docs.map_batches(
            lambda b: pa.table(
                {id_col: b[id_col].slice(0, 0),
                 "snippet": pa.array([], pa.string())}
            ),
            batch_format="pyarrow",
        )
    BIG = np.int64(2**31 - 1)

    def snip(b: pa.Table) -> pa.Table:
        low = pc.utf8_lower(b[text_col])
        pos = None
        for t in qterms:
            p = pc.find_substring(low, t).to_numpy(zero_copy_only=False).astype(np.int64)
            p = np.where(p < 0, BIG, p)
            pos = p if pos is None else np.minimum(pos, p)
        hit = pos < BIG
        ids = b[id_col].filter(pa.array(hit))
        starts = np.maximum(0, pos[hit] - before)
        texts = b[text_col].to_pylist()
        out = [
            texts[i][s : s + length]
            for i, s in zip(np.nonzero(hit)[0], starts)
        ]
        return pa.table({id_col: ids, "snippet": pa.array(out, pa.string())})

    return docs.map_batches(snip, batch_format="pyarrow")


def bm25_multi(
    docs,
    queries: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "pa.Table":
    """Batch evaluation: top-k for EVERY query over ONE shared tokenize
    pass (tf materialized once in the object store and reused — the multi-
    query analog of the reference's evaluate loop, `Serial Version/src/
    evaluate.c:28-66`, which also builds the index once). Returns one
    table with a ``query`` column."""
    tf = term_doc_tf(docs, id_col, text_col).materialize()
    parts = []
    for q in queries:
        t = bm25_topk(docs, q, k, id_col, text_col, tf=tf)
        parts.append(t.append_column("query", pa.array([q] * t.num_rows)))
    return pa.concat_tables(parts)


def rrf_topk(
    docs,
    query: str,
    k: int = 10,
    k_each: int = 20,
    rrf_k: int = 60,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> "pa.Table":
    """Reciprocal-rank fusion (Cormack/Clarke/Buettcher's RRF, the standard
    rank-level combiner for hybrid retrieval): fuse BM25 and a raw
    summed-term-frequency ranking for one query —
    ``rrf = Σ_systems 1/(rrf_k + rank)`` over each system's top ``k_each``,
    absent systems contributing 0. Returns top-``k`` (doc_id, rrf) with
    rrf rounded 6dp, ties broken doc_id asc.

    Scale shape: ONE shared tokenize pass (tf materialized, reused by both
    systems); each system's candidate list is k_each rows, so the fusion
    itself is a driver-side merge of two bounded lists — the corpus is
    scanned once regardless of system count.
    """
    tf = term_doc_tf(docs, id_col, text_col).materialize()
    bm = bm25_topk(docs, query, k=k_each, id_col=id_col,
                   text_col=text_col, tf=tf)

    qterms = sorted(set(tokenize_query(query)))
    if not qterms:
        return pa.schema([(id_col, pa.int64()), ("rrf", pa.float64())]).empty_table()
    qset = pa.array(qterms)
    from ray.data.aggregate import Sum

    tf_rows = (
        tf.map_batches(
            lambda b: b.filter(pc.is_in(b["term"], value_set=qset)),
            batch_format="pyarrow",
        )
        .groupby(id_col)
        .aggregate(Sum("tf", alias_name="tf_sum"))
        .sort(["tf_sum", id_col], descending=[True, False])
        .limit(k_each)
        .take_all()
    )

    # rank maps: position 1.. in each system's (score desc, id asc) order
    scores: dict = {}
    for rank, r in enumerate(bm.to_pylist(), start=1):
        scores[r[id_col]] = scores.get(r[id_col], 0.0) + 1.0 / (rrf_k + rank)
    for rank, r in enumerate(tf_rows, start=1):
        scores[r[id_col]] = scores.get(r[id_col], 0.0) + 1.0 / (rrf_k + rank)

    fused = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    id_type = bm.schema.field(id_col).type
    return pa.table(
        {
            id_col: pa.array([i for i, _ in fused], id_type),
            "rrf": pa.array(
                [float(round_half_away(s, 6)) for _, s in fused], pa.float64()
            ),
        }
    )


def bm25_pagerank_topk(
    docs,
    query: str,
    pr,
    k: int = 10,
    mix: float = 0.3,
    candidates: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    tf=None,
):
    """Retrieval with a static link-authority prior — the composition a web
    search engine actually serves: ``final = (1-mix) * bm25_norm + mix *
    pagerank_norm`` over the BM25 top-``candidates*k`` candidate set, both
    components min-max normalized ON THAT SET (the standard prior-fusion
    recipe; rank-stable and scale-free).

    Scale shape: BM25 does the heavy lifting (shared tokenize pass, see
    bm25_topk); the candidate table is k-scale, so the prior lookup is a
    broadcast ``is_in`` filter over the (node-scale) PageRank Dataset —
    never a full join. Candidates missing from the graph take prior 0.
    Returns a small pyarrow table (doc_id, score, bm25, prior)."""
    cand = bm25_topk(docs, query, k=candidates * k, id_col=id_col,
                     text_col=text_col, round_to=None, tf=tf)
    if cand.num_rows == 0:
        return pa.table(
            {
                id_col: pa.array([], cand.schema.field(id_col).type),
                "score": pa.array([], pa.float64()),
                "bm25": pa.array([], pa.float64()),
                "prior": pa.array([], pa.float64()),
            }
        )
    id_set = cand[id_col].combine_chunks()
    pr_rows = pr.map_batches(
        lambda b: b.filter(pc.is_in(b["node"], value_set=id_set)),
        batch_format="pyarrow",
    ).take_all()  # candidate-scale pull, bounded by candidates*k
    pr_map = {r["node"]: r["rank"] for r in pr_rows}
    bm = cand["score"].to_numpy()
    prior = np.array(
        [pr_map.get(x, 0.0) for x in cand[id_col].to_pylist()], np.float64
    )

    def _norm(v: np.ndarray) -> np.ndarray:
        lo, hi = float(v.min()), float(v.max())
        return (v - lo) / (hi - lo) if hi > lo else np.zeros_like(v)

    final = (1.0 - mix) * _norm(bm) + mix * _norm(prior)
    order = np.lexsort((cand[id_col].to_numpy(zero_copy_only=False), -final))[
        :k
    ]
    take = pa.array(order)
    return pa.table(
        {
            id_col: id_set.take(take),
            "score": pa.array(round_half_away(final[order], 6), pa.float64()),
            "bm25": pa.array(round_half_away(bm[order], 6), pa.float64()),
            "prior": pa.array(prior[order], pa.float64()),
        }
    )


def expansion_candidates(qterms: list[str]) -> set[str]:
    """Every term `expand_query_terms` could pick: t, t+'s', t[:-1]. The
    ONE definition both the corpus-pass and index-served expanded paths
    probe with — if the fallback chain grows, the probe set grows here."""
    cands: set[str] = set()
    for t in qterms:
        cands.update((t, t + "s", t[:-1] if len(t) > 1 else t))
    return cands


def expand_query_terms(qterms: list[str], known_terms: set[str]) -> list[str]:
    """Plural/singular fallback (`OpenMP Version/src/ranking.c:110-150`): a
    query term absent from the index retries as term+'s', then term[:-1]."""
    out = []
    for t in qterms:
        if t in known_terms:
            out.append(t)
        elif t + "s" in known_terms:
            out.append(t + "s")
        elif len(t) > 1 and t[:-1] in known_terms:
            out.append(t[:-1])
        else:
            out.append(t)  # keep; scores nothing, as in the reference
    return out


def bm25_topk_expanded(
    docs, query: str, k: int = 10, id_col: str = "doc_id", text_col: str = "text"
):
    """BM25 with the OpenMP plural/singular term-expansion semi-join. The
    index-side probe only touches the CANDIDATE expansions (each query term
    t, t+'s', t[:-1] — a 3|q|-element set), not the whole vocabulary: at
    100 TB the distinct-term domain is GBs, the candidate probe is bytes.
    The tokenize pass is shared: tf is materialized once and reused for
    the existence probe and scoring."""
    tf = term_doc_tf(docs, id_col, text_col).materialize()
    qterms = tokenize_query(query)
    cand_arr = pa.array(sorted(expansion_candidates(qterms)))
    # distinct_values, NOT Dataset.unique() (empty-block crash; see
    # functions/distinct.py)
    known = set(
        distinct_values(
            tf.map_batches(
                lambda b: b.filter(
                    pc.is_in(b["term"], value_set=cand_arr)
                ).select(["term"]),
                batch_format="pyarrow",
            ),
            "term",
        )
    )
    expanded = expand_query_terms(qterms, known)
    return bm25_topk(docs, " ".join(expanded), k, id_col, text_col, tf=tf)


def pattern_match_counts(docs, patterns: list[str], id_col: str = "doc_id", text_col: str = "text"):
    """Per-doc substring occurrence counts for a broadcast pattern list —
    the GPU string-matching kernel's semantics
    (`CUDA-OpenMP Hybrid Version/src/cuda_kernels.cu:144-192`) as a
    vectorized pc.count_substring over Arrow batches. Returns one row per
    (doc, pattern): (doc_id, pattern, n_matches)."""

    def count_batch(b: pa.Table) -> pa.Table:
        outs = []
        for pat in patterns:
            n = pc.count_substring(b[text_col], pat)
            outs.append(
                pa.table(
                    {
                        id_col: b[id_col],
                        "pattern": pa.array([pat] * b.num_rows, pa.string()),
                        "n_matches": n.cast(pa.int64()),
                    }
                )
            )
        return pa.concat_tables(outs)

    return docs.map_batches(count_batch, batch_format="pyarrow")


def bm25_eval_queries() -> list[str]:
    """The reference's fixed evaluation queries (`Serial Version/src/
    evaluate.c:12-19`)."""
    return [
        "circuit breaker",
        "distributed tracing",
        "linux wake up",
        "parallel computing",
        "microservices",
    ]


def _df_model(tf, max_model_terms: int | None = None):
    """Sorted (terms, dfs) numpy arrays for the vocabulary df model.

    ``max_model_terms=None`` pulls the full vocabulary (exact; fine to a few
    million terms). Bounded mode keeps the TOP-V terms by df (ties term-asc,
    deterministic) via a distributed sort+limit — the pull and the ray.put
    broadcast are then V-bounded no matter how pathological the corpus
    vocabulary is (hashes, ids, mojibake push real web-text vocabularies
    toward billions of types at 100 TB). Out-of-model terms take the tail
    default df=1.0 at lookup time (`_df_lookup`): by construction every
    dropped term has df <= the smallest kept df, so df=1 is the documented
    lower-bound default (rare terms get max idf — graceful degradation for
    keyword extraction / cosine weighting, never a KeyError).

    100-TB setting: max_model_terms ~ 5-20M keeps the broadcast in the
    hundreds of MB; leave None only when the tokenizer's vocabulary is known
    bounded."""
    from ray.data.aggregate import Count

    g = tf.groupby("term").aggregate(Count(alias_name="df"))
    if max_model_terms is None:
        rows = g.take_all()  # vocab-bounded pull (see docstring)
    else:
        rows = (
            g.sort(["df", "term"], descending=[True, False])
            .limit(int(max_model_terms))
            .take_all()
        )
    terms = np.array([r["term"] for r in rows])
    dfs = np.array([r["df"] for r in rows], dtype=np.float64)
    order = np.argsort(terms)
    return terms[order], dfs[order]


def _df_lookup(t_s: np.ndarray, df_s: np.ndarray, tt: np.ndarray,
               default: float = 1.0) -> np.ndarray:
    """Vectorized df lookup into a sorted (terms, dfs) model; misses (terms
    outside a bounded model) take ``default``. With an unbounded model every
    term hits and this is exactly the old searchsorted path."""
    if t_s.size == 0:
        return np.full(len(tt), default, np.float64)
    pos = np.clip(np.searchsorted(t_s, tt), 0, t_s.size - 1)
    return np.where(t_s[pos] == tt, df_s[pos], default)


def tfidf_topk(
    docs,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_model_terms: int | None = None,
):
    """Top-k terms per document by tf-idf (tfidf = tf * ln(N / df), rounded
    6dp BEFORE ranking; ties broken term-asc). The classic keyword-extraction
    summary a curation pipeline runs next to BM25 (same tf/df building
    blocks as the inverted index, `Serial Version/src/index.c:15-114`).

    Dataflow (no join shuffle):
      tf rows (one tokenize pass, materialized once)
        -> df per term: groupby('term') count — vocab-sized result,
           broadcast ONCE as sorted arrays via ray.put (searchsorted
           lookup per batch; same bounded-model pattern as
           text.unigram_logprob)
        -> per-row tfidf in map_batches (numpy float64, the same double
           expression the DuckDB oracle evaluates)
        -> per-doc top-k partition-grouped by hash(doc)%64 (one pandas
           sort+cumcount per PARTITION, not per doc — the per-group-tax
           rule, pipelines/relational.py:433-440).

    ``max_model_terms`` bounds the df model to the top-V terms by df
    (out-of-model terms idf from df=1 — see `_df_model` for the 100-TB
    setting); None = exact full vocabulary (the oracle contract)."""
    import pandas as pd
    import ray

    tf = term_doc_tf(docs, id_col, text_col).materialize()

    model_ref = ray.put(_df_model(tf, max_model_terms))

    # N = docs with >= 1 kept token (the oracle's COUNT(DISTINCT doc_id))
    n_docs = float(
        tf.map_batches(
            lambda b: pa.table({id_col: pc.unique(b[id_col])}),
            batch_format="pyarrow",
        )
        .groupby(id_col)
        .count()
        .count()
    )

    def score(b: pa.Table) -> pa.Table:
        t_s, df_s = ray.get(model_ref)
        tt = b["term"].to_numpy(zero_copy_only=False)
        tfidf = b["tf"].to_numpy(zero_copy_only=False) * np.log(
            n_docs / _df_lookup(t_s, df_s, tt)
        )
        return pa.table(
            {
                id_col: b[id_col],
                "term": b["term"],
                "tfidf": pa.array(round_half_away(tfidf, 6), pa.float64()),
            }
        )

    scored = tf.map_batches(score, batch_format="pyarrow")

    n_parts = 64

    def add_part(b: pa.Table) -> pa.Table:
        part = (
            pd.util.hash_array(
                b[id_col].to_numpy(zero_copy_only=False), categorize=False
            )
            % n_parts
        ).astype(np.int32)
        return b.append_column("part", pa.array(part))

    def topk_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            [id_col, "tfidf", "term"], ascending=[True, False, True], kind="stable"
        ).copy()
        g["rank"] = g.groupby(id_col, sort=False).cumcount() + 1
        g = g[g["rank"] <= k]
        return g[[id_col, "term", "tfidf", "rank"]]

    return (
        scored.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(topk_part, batch_format="pandas")
    )


def boolean_and_search(docs, terms: list[str]):
    """(doc_id, n_matched): conjunctive boolean retrieval — documents whose
    kept-token set contains EVERY query term (the classic AND query next
    to BM25's ranked OR). Query terms normalize through the shared
    ``tokenize_query`` (lowercase, stopword drop) like every other rank.py
    operator, so ["Hash", "table"] matches; a query whose terms ALL
    normalize away raises rather than silently matching nothing. Zero
    shuffles: each document lives wholly inside its batch, so the distinct
    query-term count per doc is block-local (tokenize -> is_in filter ->
    block group_by distinct -> per-doc count == n_terms)."""
    import numpy as np

    from ..functions.tokenize import tokenize_query
    from .index import tokenize_batch

    want = sorted(set(tokenize_query(" ".join(terms))))
    if not want:
        raise ValueError("every query term normalized away (stopwords?)")
    n_want = len(want)
    probe = pa.array(want)

    def match(b: pa.Table) -> pa.Table:
        t = tokenize_batch(b)
        kept = t.filter(pc.is_in(t["term"], value_set=probe))
        # distinct (doc, term) then count per doc — block-local is global
        # because docs never span batches
        d = kept.group_by(["doc_id", "term"]).aggregate([])
        g = d.group_by("doc_id").aggregate([([], "count_all")])
        g = g.rename_columns(["doc_id", "n_matched"])
        return g.filter(pc.equal(g["n_matched"], n_want)).cast(
            pa.schema(
                [("doc_id", g.schema.field("doc_id").type),
                 ("n_matched", pa.int64())]
            )
        )

    return docs.map_batches(match, batch_format="pyarrow")


def _deletions1(word: str) -> set[str]:
    return {word[:d] + word[d + 1 :] for d in range(len(word))}


def _ed_le1(a: str, b: str) -> bool:
    """Exact Levenshtein(a, b) <= 1 (insert/delete/substitute; NO
    transposition — plain Levenshtein, the same metric DuckDB's
    levenshtein() computes)."""
    if a == b:
        return True
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la > lb:
        a, b, la, lb = b, a, lb, la
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    if la == lb:
        return a[i + 1 :] == b[i + 1 :]
    return a[i:] == b[i + 1 :]


def spell_suggest(
    docs,
    word: str,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Did-you-mean: the k corpus-vocabulary terms within Levenshtein
    distance 1 of ``word``, ranked df-desc then term-asc — the spell-check
    rung above the reference's plural/singular fallback
    (`OpenMP Version/src/ranking.c:110-150`, ``expand_query_terms``).

    SymSpell-style distributed shape (Garbe 2012, public algorithm): the
    query's deletion neighborhood is tiny (len(word)+1 strings, broadcast
    in the task closure); each VOCAB block prunes to the +-1 length window,
    generates its terms' 1-deletions VECTORIZED (one pandas slice-concat
    per deletion position, <= len(word)+1 positions — never a per-term
    Python loop), and keeps terms whose deletion set intersects the query
    set. That candidate set is a small SUPERSET of the ed<=1 ball (shared
    deletions of equal-length strings can be ed 2, e.g. 'ab'~'ba'), so an
    exact _ed_le1 verify on the bounded candidates firms it up — the same
    sketch-then-exact-verify contract as the bloom/minhash paths. Only the
    (term, df) vocab ever moves; at 100 TB the vocab is GBs while the
    candidate pull is bytes."""
    import pandas as pd

    from .index import term_df

    vocab = term_df(docs, id_col, text_col)
    qset = {word} | _deletions1(word)
    lw = len(word)

    def cands(b: pa.Table) -> pa.Table:
        t_all = pd.Series(
            b["term"].to_numpy(zero_copy_only=False), dtype=object
        )
        ln = t_all.str.len().to_numpy()
        window = (ln >= lw - 1) & (ln <= lw + 1)
        t = t_all[window]
        mask = t.isin(qset).to_numpy()
        for d in range(lw + 1):
            deleted = t.str.slice(0, d) + t.str.slice(d + 1)
            mask |= deleted.isin(qset).to_numpy()
        full = np.zeros(len(t_all), bool)
        full[np.flatnonzero(window)[mask]] = True
        return b.filter(pa.array(full))

    cand_rows = vocab.map_batches(cands, batch_format="pyarrow").take_all()
    hits = [
        (r["term"], int(r["df"]))
        for r in cand_rows
        if _ed_le1(r["term"], word)
    ]
    hits.sort(key=lambda x: (-x[1], x[0]))
    hits = hits[:k]
    return pa.table(
        {
            "term": pa.array([h[0] for h in hits], pa.string()),
            "df": pa.array([h[1] for h in hits], pa.int64()),
            "rank": pa.array(range(1, len(hits) + 1), pa.int64()),
        }
    )


def phrase_search(docs, phrase: str, id_col: str = "doc_id", text_col: str = "text"):
    """(doc_id, n_hits) for every document containing the exact two-word
    ``phrase`` as ADJACENT whitespace tokens (case-folded) — real phrase
    match, the positional step past ``boolean_and_search``'s bag-of-words
    conjunction. Block-local and shuffle-free: docs never span blocks, so
    one vectorized pass (lower -> regex split -> flattened token stream
    with doc indices -> adjacent-equality mask -> per-doc bincount) answers
    the phrase query with zero data movement. Multi-word phrases chain the
    same mask; two words is the oracle-anchored shape."""
    import numpy as np

    words = phrase.lower().split()
    if len(words) != 2:
        raise ValueError("phrase_search: exactly two words (the 2-gram anchor)")
    w1, w2 = words

    def hits(b: pa.Table) -> pa.Table:
        n = b.num_rows
        txt = pc.utf8_lower(pc.fill_null(b[text_col], ""))
        toks = pc.split_pattern_regex(txt, r"\s+")
        la = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        counts = np.asarray(
            pc.fill_null(pc.list_value_length(la), 0).to_numpy(zero_copy_only=False),
            dtype=np.int64,
        )
        vals = np.asarray(la.flatten().to_numpy(zero_copy_only=False), dtype=object)
        di = np.repeat(np.arange(n, dtype=np.int64), counts)
        keep = vals != ""
        vals, di = vals[keep], di[keep]
        nh = np.zeros(n, np.int64)
        if len(vals) > 1:
            hit = (vals[:-1] == w1) & (vals[1:] == w2) & (di[:-1] == di[1:])
            np.add.at(nh, di[:-1][hit], 1)
        t = pa.table(
            {id_col: b[id_col], "n_hits": pa.array(nh, pa.int64())}
        )
        return t.filter(pa.array(nh > 0))

    return docs.map_batches(hits, batch_format="pyarrow")


def autocomplete_prefix(
    docs, prefix: str, k: int = 10, id_col: str = "doc_id", text_col: str = "text"
):
    """(term, df, rank): the k highest-df vocabulary terms starting with
    ``prefix`` — query auto-complete over the live index vocabulary (the
    serving companion of ``spell_suggest``). The vocab is the only thing
    that moves; the prefix filter is a vectorized starts_with per block and
    the global order is sort + limit over the filtered (tiny) slice."""
    from .index import term_df

    vocab = term_df(docs, id_col, text_col)

    def pref(b: pa.Table) -> pa.Table:
        return b.filter(pc.starts_with(b["term"], prefix))

    top = (
        vocab.map_batches(pref, batch_format="pyarrow")
        .sort(["df", "term"], descending=[True, False])
        .limit(k)
        .take_all()
    )
    return pa.table(
        {
            "term": pa.array([r["term"] for r in top], pa.string()),
            "df": pa.array([int(r["df"]) for r in top], pa.int64()),
            "rank": pa.array(range(1, len(top) + 1), pa.int64()),
        }
    )


def phrase_search_indexed(postings, phrase: str, id_col: str = "doc_id"):
    """(doc_id, n_hits): answer the adjacent-token phrase query FROM a
    positional postings Dataset (``index.positional_postings``) — the
    index-served counterpart of the scan-based ``phrase_search`` (pinned
    equal by a cross-operator test; the reason a search engine builds a
    positional index is exactly this query).

    Only the TWO query terms' postings are pulled out of the index
    (vectorized is_in filter — bytes, however big the corpus), co-located
    per doc driver-side over the bounded candidate slice, and the
    adjacency test is one vectorized searchsorted per doc pair."""
    import numpy as np

    words = phrase.lower().split()
    if len(words) != 2:
        raise ValueError("phrase_search_indexed: exactly two words")
    w1, w2 = words
    term_set = pa.array(sorted({w1, w2}))

    rows = postings.map_batches(
        lambda b: b.filter(pc.is_in(b["term"], value_set=term_set)),
        batch_format="pyarrow",
    ).take_all()  # bounded: two terms' postings
    p1 = {r[id_col]: np.asarray(r["positions"], np.int64) for r in rows if r["term"] == w1}
    p2 = {r[id_col]: np.asarray(r["positions"], np.int64) for r in rows if r["term"] == w2}
    out_ids, out_n = [], []
    for d in sorted(set(p1) & set(p2)):
        a, bpos = p1[d], p2[d]
        # w1 at position p counts iff w2 sits at p+1
        hits = np.isin(a + 1, bpos, assume_unique=True).sum()
        if w1 == w2:
            hits = np.isin(a + 1, a, assume_unique=True).sum()
        if hits:
            out_ids.append(int(d))
            out_n.append(int(hits))
    return pa.table(
        {
            id_col: pa.array(out_ids, pa.int64()),
            "n_hits": pa.array(out_n, pa.int64()),
        }
    )


def proximity_search(
    postings, term_a: str, term_b: str, window: int = 3, id_col: str = "doc_id"
):
    """(doc_id, n_pairs): count of (pos_a, pos_b) pairs with
    |pos_a - pos_b| <= ``window`` — proximity ranking's raw signal ("hash
    NEAR join"), served FROM the positional index like
    ``phrase_search_indexed`` (phrase = the window-1 ordered special
    case). Only the two terms' postings leave the index; the window count
    per doc is two vectorized searchsorted probes (|a - b| <= w  <=>
    b in [a-w, a+w] — count via sorted-range subtraction, never an
    all-pairs expansion)."""
    import numpy as np

    ta, tb = term_a.lower(), term_b.lower()
    term_set = pa.array(sorted({ta, tb}))
    rows = postings.map_batches(
        lambda b: b.filter(pc.is_in(b["term"], value_set=term_set)),
        batch_format="pyarrow",
    ).take_all()
    p1 = {r[id_col]: np.asarray(r["positions"], np.int64) for r in rows if r["term"] == ta}
    p2 = {r[id_col]: np.asarray(r["positions"], np.int64) for r in rows if r["term"] == tb}
    out_ids, out_n = [], []
    for d in sorted(set(p1) & set(p2)):
        a, b = p1[d], np.sort(p2[d])
        n = int(
            (np.searchsorted(b, a + window, side="right")
             - np.searchsorted(b, a - window, side="left")).sum()
        )
        if ta == tb:
            n -= len(a)  # drop the zero-distance self pairs
        if n:
            out_ids.append(int(d))
            out_n.append(n)
    return pa.table(
        {
            id_col: pa.array(out_ids, pa.int64()),
            "n_pairs": pa.array(out_n, pa.int64()),
        }
    )


def eval_ndcg(
    results,
    relevant: dict[int, set],
    k: int = 10,
    id_col: str = "doc_id",
):
    """(query_idx, ndcg, recall): NDCG@k and recall@k of a ranked result
    table (columns query_idx, doc_id/vec_id, rank) against a relevance
    oracle — the offline eval every ranking change ships behind. Binary
    gains; IDCG over min(k, |relevant|). Driver-side over the bounded
    result set (k rows per query by construction)."""
    import numpy as np
    import pandas as pd

    df = results.to_pandas() if not isinstance(results, pd.DataFrame) else results
    out_q, out_ndcg, out_rec = [], [], []
    for qi, g in df.groupby("query_idx", sort=True):
        rel = relevant.get(int(qi), set())
        g = g.sort_values("rank").head(k)
        gains = np.array([1.0 if d in rel else 0.0 for d in g[id_col]])
        disc = 1.0 / np.log2(np.arange(2, len(gains) + 2))
        dcg = float((gains * disc).sum())
        ideal_n = min(k, len(rel))
        idcg = float(disc[:ideal_n].sum()) if ideal_n else 0.0
        out_q.append(int(qi))
        out_ndcg.append(round(dcg / idcg, 6) if idcg else 0.0)
        out_rec.append(round(gains.sum() / len(rel), 6) if rel else 0.0)
    return pa.table(
        {
            "query_idx": pa.array(out_q, pa.int64()),
            "ndcg": pa.array(out_ndcg, pa.float64()),
            "recall": pa.array(out_rec, pa.float64()),
        }
    )


def prf_expand_topk(
    docs,
    query: str,
    k: int = 10,
    fb_docs: int = 5,
    fb_terms: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int | None = 6,
):
    """Pseudo-relevance-feedback retrieval (Rocchio/RM3 family, unweighted
    expansion): round 1 ranks the original query, the top ``fb_docs``
    results vote expansion terms (highest summed tf inside the feedback
    set, excluding the query's own terms; ties break term-asc), and the
    final ranking is plain BM25 of the expanded query — the principled
    big sibling of the reference's hardcoded plural/singular retry
    (`OpenMP Version/src/ranking.c:110-150`), which re-runs the query
    with one morphological variant when recall disappoints.

    Scale shape: ONE shared tokenize pass (`tf` materialized once) feeds
    both rounds; the feedback slice is ``fb_docs`` documents' tf rows (a
    bounded is_in filter), so the driver-side term vote is feedback-sized,
    never corpus-sized. Assumes the query string has no repeated terms
    (expansion weights are occurrence counts; the oracle SQL mirrors the
    distinct-term form)."""
    import pandas as pd

    from .index import term_doc_tf

    tf = term_doc_tf(docs, id_col, text_col).materialize()
    # round 1 unrounded: only the ORDER feeds the feedback cut, and the
    # oracle's base CTE orders on raw doubles
    base = bm25_topk(
        docs, query, k=fb_docs, id_col=id_col, text_col=text_col,
        round_to=None, tf=tf,
    )
    fb_ids = base[id_col].to_pylist()
    qterms = tokenize_query(query)
    if not fb_ids:
        return bm25_topk(
            docs, query, k=k, id_col=id_col, text_col=text_col,
            round_to=round_to, tf=tf,
        )
    idset = pa.array(fb_ids)
    cand = tf.map_batches(
        lambda b: b.filter(pc.is_in(b[id_col], value_set=idset)),
        batch_format="pyarrow",
    ).take_all()  # bounded: sum of fb_docs documents' vocabularies
    votes = (
        pd.DataFrame(cand)
        .groupby("term", as_index=False)["tf"]
        .sum()
    )
    votes = votes[~votes["term"].isin(set(qterms))]
    votes = votes.sort_values(
        ["tf", "term"], ascending=[False, True], kind="stable"
    ).head(fb_terms)
    expanded = " ".join(list(dict.fromkeys(qterms)) + votes["term"].tolist())
    return bm25_topk(
        docs, expanded, k=k, id_col=id_col, text_col=text_col,
        round_to=round_to, tf=tf,
    )


def more_like_this(
    docs,
    seed_doc_id: int,
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_to: int | None = 6,
    max_model_terms: int | None = None,
):
    """Related-documents serving ("more like this"): top-k docs by TF-IDF
    cosine similarity to a seed document — the content-based neighbor
    query every result page and recommendation sidebar runs, and the
    sparse lexical complement of the dense `ann.brute_force_topk` path.

    Scale shape: per-batch PARTIAL (doc_id, dot, n2) sums inside
    map_batches, then ONE groupby(doc_id) Sum merges partials before the
    cosine — correct even when Ray Data's dynamic block splitting slices
    a tokenize task's output mid-document (target_max_block_size), which
    a block-local sqrt(n2) silently gets wrong at corpus scale. The
    shuffle carries three numbers per (doc, batch) — the pre-aggregate
    rule, not a fact-scale exchange. The df model and the seed's (term,
    weight) vector are vocab-/doc-bounded broadcasts (`ray.put` once,
    searchsorted lookup per batch); only (doc_id, cos) survivor rows
    reach the final sort/limit. ``max_model_terms`` bounds the df model
    to the top-V terms by df (out-of-model terms weight with df=1 — see
    `_df_model` for the 100-TB setting); None = exact."""
    import ray
    from ray.data.aggregate import Sum

    from .index import term_doc_tf

    tf = term_doc_tf(docs, id_col, text_col).materialize()
    terms, dfs = _df_model(tf, max_model_terms)
    n_docs = float(
        tf.map_batches(
            lambda b: pa.table({id_col: pc.unique(b[id_col])}),
            batch_format="pyarrow",
        )
        .groupby(id_col)
        .count()
        .count()
    )

    seed_rows = tf.map_batches(
        lambda b: b.filter(pc.equal(b[id_col], seed_doc_id)),
        batch_format="pyarrow",
    ).take_all()
    out_schema = pa.schema([(id_col, pa.int64()), ("cos_sim", pa.float64())])
    if not seed_rows:
        return out_schema.empty_table()
    s_terms = np.array([r["term"] for r in seed_rows])
    s_w = np.array([r["tf"] for r in seed_rows], np.float64) * np.log(
        n_docs / _df_lookup(terms, dfs, s_terms)
    )
    s_order = np.argsort(s_terms)
    s_terms, s_w = s_terms[s_order], s_w[s_order]
    s_norm = float(np.sqrt(np.sum(s_w * s_w)))
    model_ref = ray.put((terms, dfs, s_terms, s_w))

    def score_partial(b: pa.Table) -> pa.Table:
        import pandas as pd

        t_s, df_s, st, sw = ray.get(model_ref)
        tt = b["term"].to_numpy(zero_copy_only=False)
        w = b["tf"].to_numpy(zero_copy_only=False) * np.log(
            n_docs / _df_lookup(t_s, df_s, tt)
        )
        pos = np.clip(np.searchsorted(st, tt), 0, len(st) - 1)
        in_seed = st[pos] == tt
        dot_part = np.where(in_seed, w * sw[pos], 0.0)
        d = pd.DataFrame(
            {
                "id": b[id_col].to_numpy(zero_copy_only=False),
                "dot": dot_part,
                "n2": w * w,
            }
        )
        # per-batch combine only — a doc's rows may straddle blocks, so
        # no filtering here (a doc whose dot-partial is 0 in THIS batch
        # may accumulate dot > 0 in another)
        agg = d.groupby("id", as_index=False, sort=False).sum()
        return pa.table(
            {
                id_col: pa.array(agg["id"].to_numpy().astype(np.int64)),
                "dot": pa.array(agg["dot"].to_numpy(), pa.float64()),
                "n2": pa.array(agg["n2"].to_numpy(), pa.float64()),
            }
        )

    sums = (
        tf.map_batches(score_partial, batch_format="pyarrow")
        .groupby(id_col)
        .aggregate(Sum("dot", alias_name="dot"), Sum("n2", alias_name="n2"))
    )

    def finalize(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        dot = b["dot"].to_numpy(zero_copy_only=False)
        n2 = b["n2"].to_numpy(zero_copy_only=False)
        m = (dot > 0) & (ids != seed_doc_id)
        cos = dot[m] / (np.sqrt(n2[m]) * s_norm)
        if round_to is not None:
            cos = round_half_away(cos, round_to)
        return pa.table(
            {
                id_col: pa.array(ids[m].astype(np.int64)),
                "cos_sim": pa.array(cos, pa.float64()),
            }
        )

    sims = sums.map_batches(finalize, batch_format="pyarrow")
    rows = (
        sims.sort(["cos_sim", id_col], descending=[True, False])
        .limit(k)
        .take_all()
    )
    return pa.Table.from_pylist(
        [{id_col: r[id_col], "cos_sim": r["cos_sim"]} for r in rows],
        schema=out_schema,
    )


def related_terms(
    docs,
    focal: str,
    k: int = 10,
    min_co: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_model_terms: int | None = None,
):
    """Co-occurrence term suggestion: top-k terms by LIFT against a focal
    term — lift(t) = P(t | focal-doc) / P(t) = (co_df/df_focal)/(df/N) —
    the "searches related to ..." box next to `autocomplete` (prefix) and
    `spell_suggest` (edit distance); unlike `phrase_pmi` it scores
    document-level co-occurrence, not adjacency.

    Scale shape: the focal term's doc-id set is df(focal)-bounded
    (broadcast once); co-occurrence counts are ONE groupby over the
    focal docs' postings slice; df/N ride the same vocab-bounded
    broadcast every rank op uses; lift, the min_co gate, and the
    sort/limit all run distributed — no corpus row reaches the driver.
    ``max_model_terms`` bounds the df model to the top-V terms by df
    (out-of-model terms take df=1, i.e. max lift, and are still co_df- and
    min_co-gated — see `_df_model` for the 100-TB setting); None = exact."""
    import ray
    from ray.data.aggregate import Count

    from .index import term_doc_tf

    out_schema = pa.schema(
        [("term", pa.string()), ("co_df", pa.int64()), ("lift", pa.float64())]
    )
    tf = term_doc_tf(docs, id_col, text_col).materialize()
    terms, dfs = _df_model(tf, max_model_terms)
    n_docs = float(
        tf.map_batches(
            lambda b: pa.table({id_col: pc.unique(b[id_col])}),
            batch_format="pyarrow",
        )
        .groupby(id_col)
        .count()
        .count()
    )
    fids = np.sort(
        np.array(
            [
                r[id_col]
                for r in tf.map_batches(
                    lambda b: b.filter(pc.equal(b["term"], focal)),
                    batch_format="pyarrow",
                ).take_all()
            ],
            np.int64,
        )
    )
    if not fids.size:
        return out_schema.empty_table()
    df_focal = float(fids.size)
    fids_ref = ray.put(fids)

    def in_focal(b: pa.Table) -> pa.Table:
        wanted = ray.get(fids_ref)
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.clip(np.searchsorted(wanted, ids), 0, wanted.size - 1)
        keep = (wanted[pos] == ids) & (
            b["term"].to_numpy(zero_copy_only=False) != focal
        )
        return b.filter(pa.array(keep))

    co = (
        tf.map_batches(in_focal, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Count(alias_name="co_df"))
    )
    model_ref = ray.put((terms, dfs))

    def with_lift(b: pa.Table) -> pa.Table:
        t_s, df_s = ray.get(model_ref)
        tt = b["term"].to_numpy(zero_copy_only=False)
        cov = b["co_df"].to_numpy(zero_copy_only=False).astype(np.float64)
        lift = (cov * 1.0 / df_focal) / (
            _df_lookup(t_s, df_s, tt) * 1.0 / n_docs
        )
        out = pa.table(
            {
                "term": b["term"],
                "co_df": pa.array(
                    b["co_df"].to_numpy(zero_copy_only=False).astype(np.int64)
                ),
                "lift": pa.array(round_half_away(lift, 6), pa.float64()),
            }
        )
        return out.filter(pc.greater_equal(out["co_df"], min_co))

    rows = (
        co.map_batches(with_lift, batch_format="pyarrow")
        .sort(["lift", "term"], descending=[True, False])
        .limit(k)
        .take_all()
    )
    return pa.Table.from_pylist(
        [
            {"term": r["term"], "co_df": r["co_df"], "lift": r["lift"]}
            for r in rows
        ],
        schema=out_schema,
    )


def bm25_dedup_serp(
    docs,
    query: str,
    k: int = 10,
    pool: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Dedup-aware result serving: rank a BM25 pool, then collapse exact
    duplicates (md5 of the text) to their best-ranked representative
    before returning top-k — the SERP hygiene every engine applies so one
    mirrored page can't occupy half the results; the serving-side
    composition of `dedup.exact_dedup` with ranking.

    Scale shape: the distributed part is the plain BM25 top-``pool``;
    everything after — fetching the ≤pool texts (one is_in semi-filter),
    hashing, keep-first — is pool-bounded driver work."""
    import hashlib

    ranked = bm25_topk(
        docs, query, k=pool, id_col=id_col, text_col=text_col, round_to=6
    )
    if ranked.num_rows == 0:
        return ranked
    ids = ranked[id_col].to_pylist()
    scores = ranked["score"].to_pylist()
    idset = pa.array(ids)
    texts = {
        r[id_col]: r[text_col]
        for r in docs.map_batches(
            lambda b: b.filter(pc.is_in(b[id_col], value_set=idset)),
            batch_format="pyarrow",
        ).take_all()
    }
    seen, out = set(), []
    for i, s in zip(ids, scores):  # already (score desc, id asc) ordered
        h = hashlib.md5(texts[i].encode()).hexdigest()
        if h in seen:
            continue
        seen.add(h)
        out.append({id_col: i, "score": s})
        if len(out) >= k:
            break
    return pa.Table.from_pylist(
        out, schema=pa.schema([(id_col, pa.int64()), ("score", pa.float64())])
    )


def bm25_source_quota(
    docs,
    query: str,
    k: int = 10,
    per_source: int = 2,
    pool: int = 30,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
):
    """Source-diversified serving: rank a BM25 pool, cap results at
    ``per_source`` per source (best-ranked survive), return top-k — the
    host-quota rule every SERP applies so one domain can't monopolize the
    page; the grouped-quota sibling of `bm25_dedup_serp` (exact-dup
    collapse) and `mmr_rerank` (embedding diversity).

    Scale shape: the distributed part is the plain top-``pool``; source
    attach is one is_in semi-filter over the ≤pool ids; the quota walk is
    pool-bounded driver work."""
    ranked = bm25_topk(
        docs, query, k=pool, id_col=id_col, text_col=text_col, round_to=6
    )
    out_schema = pa.schema(
        [(id_col, pa.int64()), ("score", pa.float64()),
         (source_col, pa.string())]
    )
    if ranked.num_rows == 0:
        return out_schema.empty_table()
    ids = ranked[id_col].to_pylist()
    scores = ranked["score"].to_pylist()
    idset = pa.array(ids)
    src = {
        r[id_col]: r[source_col]
        for r in docs.map_batches(
            lambda b: pa.table(
                {id_col: b[id_col], source_col: b[source_col]}
            ).filter(pc.is_in(b[id_col], value_set=idset)),
            batch_format="pyarrow",
        ).take_all()
    }
    taken, out = {}, []
    for i, s in zip(ids, scores):  # (score desc, id asc) order from bm25
        g = src[i]
        if taken.get(g, 0) >= per_source:
            continue
        taken[g] = taken.get(g, 0) + 1
        out.append({id_col: i, "score": s, source_col: g})
        if len(out) >= k:
            break
    return pa.Table.from_pylist(out, schema=out_schema)
