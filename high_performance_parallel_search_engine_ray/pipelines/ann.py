"""Approximate-nearest-neighbor search over an embedding column.

- brute_force_topk: exact cosine top-k. The query matrix is ray.put once and
  read per batch inside map_batches (broadcast-small-side; numpy matmul) —
  the baseline and the oracle anchor (DuckDB list_cosine_similarity).
- ivf_topk: IVF-style scale path — k-means-lite centroids (deterministic
  seeded init, few Lloyd iterations over a sample), assign each corpus
  vector to its nearest centroid (one pass), probe the nprobe closest
  centroids per query. Trades recall for touching only a fraction of the
  corpus per query; recall vs brute force is measured in tests.
- lsh_topk: data-independent scale path — random-hyperplane sign buckets
  (no training pass at all); each query scores only vectors whose bucket is
  hamming-close to its own (multiprobe). Complements IVF: no sample/Lloyd
  step to coordinate, bucket assignment is a single matmul per batch, and
  the same signature space serves dedup (dedup.embedding_dup_pairs_lsh).

GPU analog in the reference: `gpu_cosine_similarity` kernels
(`CUDA-OpenMP Hybrid Version/src/cuda_kernels.cu:198-225`) — here the batch
matmul is the same computation on CPU BLAS.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.rounding import round_half_away
from ..functions.textstats import cosine_topk
from ..functions.veclib import list_column_to_matrix


def _to_matrix(col) -> np.ndarray:
    # vectorized list<float> -> matrix (flatten/reshape; no per-row Python)
    return list_column_to_matrix(col)


def brute_force_topk(
    embeddings,
    query_vectors: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Exact top-k per query: per-batch local top-k (matmul against the
    broadcast query matrix) then a global merge of the tiny per-batch
    results. Returns (query_idx, vec_id, cosine, rank) rows; cosine rounded
    6dp, ties broken by vec_id asc."""
    import ray

    q_ref = ray.put(np.asarray(query_vectors, dtype=np.float64))

    def local_topk(b: pa.Table) -> pa.Table:
        q = ray.get(q_ref)
        ids = b[id_col].to_numpy(zero_copy_only=False)
        m = _to_matrix(b[vec_col])
        idx, scores = cosine_topk(q, m, k)
        out = {"query_idx": [], id_col: [], "cosine": []}
        for qi in range(q.shape[0]):
            out["query_idx"].extend([qi] * idx.shape[1])
            out[id_col].extend(ids[idx[qi]].tolist())
            out["cosine"].extend(scores[qi].tolist())
        return pa.table(
            {
                "query_idx": pa.array(out["query_idx"], pa.int32()),
                id_col: pa.array(out[id_col]),
                "cosine": pa.array(out["cosine"], pa.float64()),
            }
        )

    import pandas as pd

    local = embeddings.map_batches(local_topk, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", id_col], ascending=[False, True]).head(k)
        g = g.copy()
        g["cosine"] = round_half_away(g["cosine"].to_numpy(), 6)
        g["rank"] = range(1, len(g) + 1)
        return g

    return local.groupby("query_idx").map_groups(merge, batch_format="pandas")


def lsh_topk(
    embeddings,
    query_vectors: np.ndarray,
    k: int = 10,
    n_planes: int = 12,
    max_hamming: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 11,
):
    """LSH-bucketed cosine top-k: corpus vectors hash to sign buckets of
    ``n_planes`` random hyperplanes (one matmul per batch, no training);
    each query scores only vectors whose bucket differs from the query's
    bucket by <= ``max_hamming`` bits (multiprobe). Candidate fraction
    ~= sum_{i<=h} C(n,i)/2^n (n=12, h=2: ~1.9%), recall grows with
    max_hamming; measured vs brute force in tests. Approximate by
    construction — rows-only driver check."""
    import ray

    q = np.asarray(query_vectors, dtype=np.float64)
    dim = q.shape[1]
    planes = np.random.default_rng(seed).standard_normal((dim, n_planes))
    weights = (1 << np.arange(n_planes)).astype(np.int64)

    def bucket_of(m: np.ndarray) -> np.ndarray:
        return ((m @ planes) >= 0) @ weights

    q_buckets = bucket_of(q)
    # popcount table for n_planes-bit xor values (tiny: 4096 entries)
    pop = np.array([bin(i).count("1") for i in range(1 << n_planes)], dtype=np.int8)
    refs = ray.put((q, q_buckets, planes, weights, pop))

    def local_topk(b: pa.Table) -> pa.Table:
        qm, qb, pl, w, popc = ray.get(refs)
        ids = b[id_col].to_numpy(zero_copy_only=False)
        m = _to_matrix(b[vec_col])
        cb = ((m @ pl) >= 0) @ w
        out = {"query_idx": [], id_col: [], "cosine": []}
        for qi in range(qm.shape[0]):
            mask = popc[np.bitwise_xor(cb, qb[qi])] <= max_hamming
            if not mask.any():
                continue
            idx, scores = cosine_topk(qm[qi : qi + 1], m[mask], k)
            sub_ids = ids[mask]
            out["query_idx"].extend([qi] * idx.shape[1])
            out[id_col].extend(sub_ids[idx[0]].tolist())
            out["cosine"].extend(scores[0].tolist())
        return pa.table(
            {
                "query_idx": pa.array(out["query_idx"], pa.int32()),
                id_col: pa.array(out[id_col]),
                "cosine": pa.array(out["cosine"], pa.float64()),
            }
        )

    import pandas as pd

    local = embeddings.map_batches(local_topk, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", id_col], ascending=[False, True]).head(k)
        g = g.copy()
        g["cosine"] = round_half_away(g["cosine"].to_numpy(), 6)
        g["rank"] = range(1, len(g) + 1)
        return g

    return local.groupby("query_idx").map_groups(merge, batch_format="pandas")


def ivf_topk(
    embeddings,
    query_vectors: np.ndarray,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_sample: int = 2048,
    seed: int = 11,
):
    """IVF cosine top-k: centroids from a driver-side sample (bounded),
    assignment + probing distributed. Approximate by construction."""
    import ray

    q = np.asarray(query_vectors, dtype=np.float64)

    sample = embeddings.random_sample(1.0, seed=seed).limit(train_sample).take_all()
    x = _to_matrix([r[vec_col] for r in sample])
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    cent = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(5):  # a few Lloyd iterations
        assign = np.argmax(x @ cent.T, axis=1)
        for c in range(cent.shape[0]):
            mask = assign == c
            if mask.any():
                v = x[mask].mean(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-12)
    cent_ref = ray.put(cent)

    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    probe = np.argsort(-(qn @ cent.T), axis=1)[:, :nprobe]  # (Q, nprobe)
    probe_sets = [set(row.tolist()) for row in probe]
    probe_ref = ray.put(probe_sets)
    q_ref = ray.put(q)

    def local_topk(b: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        psets = ray.get(probe_ref)
        qm = ray.get(q_ref)
        ids = b[id_col].to_numpy(zero_copy_only=False)
        m = _to_matrix(b[vec_col])
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        cell = np.argmax(mn @ c.T, axis=1)
        out = {"query_idx": [], id_col: [], "cosine": []}
        for qi, pset in enumerate(psets):
            mask = np.isin(cell, list(pset))
            if not mask.any():
                continue
            idx, scores = cosine_topk(qm[qi : qi + 1], m[mask], k)
            sub_ids = ids[mask]
            out["query_idx"].extend([qi] * idx.shape[1])
            out[id_col].extend(sub_ids[idx[0]].tolist())
            out["cosine"].extend(scores[0].tolist())
        return pa.table(
            {
                "query_idx": pa.array(out["query_idx"], pa.int32()),
                id_col: pa.array(out[id_col]),
                "cosine": pa.array(out["cosine"], pa.float64()),
            }
        )

    import pandas as pd

    local = embeddings.map_batches(local_topk, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", id_col], ascending=[False, True]).head(k)
        g = g.copy()
        g["cosine"] = round_half_away(g["cosine"].to_numpy(), 6)
        g["rank"] = range(1, len(g) + 1)
        return g

    return local.groupby("query_idx").map_groups(merge, batch_format="pandas")


from ..functions.hashing import fold_bucket as _fold_bucket


def hashed_chunk_embeddings(chunks, dims: int = 64):
    """(doc_id, chunk_id, vec: list<double>): deterministic hashed
    bag-of-words embeddings over chunk rows (``text.chunk_token_windows``
    output) — the training-free featurizer that makes the chunk→embed→
    retrieve RAG prep fully oracle-checkable. Each chunk's lowercased
    space-split tokens fold into ``dims`` buckets; the vector is the raw
    bucket-count histogram. Per-batch vectorized (unique-token hash cache
    + np.add.at scatter), shuffle-free."""
    import pyarrow.compute as pc

    def embed(b: pa.Table) -> pa.Table:
        n = b.num_rows
        words = pc.split_pattern(pc.utf8_lower(b["chunk_text"]), " ")
        flat = pc.list_flatten(words)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        parents = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
        toks = flat.to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(toks, return_inverse=True)
        bk = (
            np.array([_fold_bucket(t, dims) for t in uniq], np.int64)[inv]
            if len(uniq)
            else np.empty(0, np.int64)
        )
        mat = np.zeros((n, dims), np.float64)
        np.add.at(mat, (parents, bk), 1.0)
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "chunk_id": b["chunk_id"],
                "vec": pa.array(list(mat), pa.list_(pa.float64())),
            }
        )

    return chunks.map_batches(embed, batch_format="pyarrow")


def rag_chunk_search(
    docs,
    query: str,
    window: int = 32,
    stride: int = 32,
    dims: int = 64,
    k: int = 10,
):
    """(doc_id, chunk_id, score): the RAG retrieval prep, end to end —
    fixed-stride chunking -> hashed-BoW chunk embeddings -> cosine top-k
    against the query's embedding. Composition of
    ``text.chunk_token_windows`` + ``hashed_chunk_embeddings`` + a
    broadcast-query scoring map; the only non-map stage is the final
    distributed sort + limit(k). Deterministic tiebreak: (score desc,
    doc_id, chunk_id); score rounded 6dp."""
    from ..functions.rounding import round_half_away as _r6
    from .text import chunk_token_windows

    qtoks = [t for t in query.lower().split() if t]
    qv = np.zeros(dims, np.float64)
    for t in qtoks:
        qv[_fold_bucket(t, dims)] += 1.0
    qnorm = float(np.sqrt((qv * qv).sum()))
    if qnorm == 0.0:
        raise ValueError("query has no tokens")

    emb = hashed_chunk_embeddings(
        chunk_token_windows(docs, window=window, stride=stride), dims=dims
    )

    import ray

    qref = ray.put(qv)

    def score(b: pa.Table) -> pa.Table:
        q = ray.get(qref)
        mat = np.asarray(
            b["vec"].combine_chunks().flatten(), np.float64
        ).reshape(b.num_rows, dims) if b.num_rows else np.zeros((0, dims))
        dot = mat @ q
        ss = (mat * mat).sum(axis=1)
        sc = _r6(dot / (np.sqrt(ss) * qnorm), 6)
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "chunk_id": b["chunk_id"],
                "score": pa.array(sc, pa.float64()),
            }
        )

    return (
        emb.map_batches(score, batch_format="pyarrow")
        .sort(["score", "doc_id", "chunk_id"], descending=[True, False, False])
        .limit(k)
    )


def _jl_matrix(in_dim: int, out_dim: int, seed: int) -> np.ndarray:
    """Deterministic Gaussian JL projection, scaled 1/sqrt(out_dim) so
    expected pairwise distances are preserved. The (in_dim x out_dim)
    matrix is a few KB — regenerating it from the seed inside each task is
    cheaper than a broadcast round-trip; for a large in_dim x out_dim
    you'd generate once and ray.put it like the query matrix."""
    rng = np.random.RandomState(seed)
    return rng.standard_normal((in_dim, out_dim)) / np.sqrt(out_dim)


def jl_project(
    embeddings,
    out_dim: int = 16,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Johnson–Lindenstrauss random projection of the embedding column to
    ``out_dim`` dims — the cheapest dimensionality reducer that still
    carries distance guarantees (distortion 1±eps with out_dim =
    O(log n / eps^2), independent of the input dimension). At 100 TB this
    is the pre-pass that makes every downstream geometric stage (ANN
    probing, semdedup, kmeans assignment) 4-8x cheaper per batch: one
    matmul per batch, no training pass, no shuffle, streaming-safe.

    Deterministic (seeded matrix), vectorized (single BLAS matmul per
    batch). Returns (id_col, embedding list<float>) with out_dim dims."""

    def project(b: pa.Table) -> pa.Table:
        m = _to_matrix(b[vec_col])
        proj = m.astype(np.float64) @ _jl_matrix(m.shape[1], out_dim, seed)
        flat = pa.array(
            proj.astype(np.float32).ravel(), pa.float32()
        )
        return pa.table(
            {
                id_col: b[id_col],
                vec_col: pa.FixedSizeListArray.from_arrays(flat, out_dim).cast(
                    pa.list_(pa.float32())
                ),
            }
        )

    return embeddings.map_batches(project, batch_format="pyarrow")


def jl_topk(
    embeddings,
    query_vectors: np.ndarray,
    k: int = 10,
    out_dim: int = 16,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Top-k cosine search in the JL-projected space: corpus and queries
    go through the SAME seeded projection, then the exact brute-force
    kernel runs over out_dim-wide vectors. Recall vs the full-dimension
    search is measured in tests (clustered data: recall ~1.0; the 4x
    per-batch FLOP reduction is the point at scale)."""
    q = np.asarray(query_vectors, dtype=np.float64)
    q_proj = q @ _jl_matrix(q.shape[1], out_dim, seed)
    return brute_force_topk(
        jl_project(
            embeddings, out_dim=out_dim, seed=seed,
            id_col=id_col, vec_col=vec_col,
        ),
        q_proj,
        k=k,
        id_col=id_col,
        vec_col=vec_col,
    )


def mmr_rerank(
    embeddings,
    query_vector,
    k: int = 10,
    pool: int = 50,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein 1998):
    greedily pick argmax lam*cos(q, d) - (1-lam)*max_{s in selected}
    cos(d, s) — the serving-side diversifier that keeps a result page from
    being k near-copies of one document (the retrieval companion of the
    near-dup screens).

    Distributed shape: the POOL comes from the exact distributed
    ``brute_force_topk`` (per-block local top-k, tiny merge); only the
    pool's <= ``pool`` vectors are pulled (bounded is_in semi-join filter —
    never the embedding table); the inherently-sequential greedy loop runs
    driver-side over a pool x pool cosine matrix. Ties break id-asc.
    Returns (rank, id, cosine, mmr) with cosine/mmr rounded 6dp."""
    import ray  # noqa: F401  (brute_force_topk owns the broadcast)

    q = np.asarray(query_vector, dtype=np.float64)
    cand = (
        brute_force_topk(embeddings, q[None, :], k=pool, id_col=id_col, vec_col=vec_col)
        .to_pandas()
        .sort_values("rank")
    )
    ids = cand[id_col].to_numpy()
    rel = cand["cosine"].to_numpy(dtype=np.float64)
    if len(ids) == 0:
        return pa.table(
            {
                "rank": pa.array([], pa.int64()),
                id_col: pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
                "mmr": pa.array([], pa.float64()),
            }
        )

    idset = pa.array(ids)

    def pool_vecs(b: pa.Table) -> pa.Table:
        return b.filter(pc.is_in(b[id_col], value_set=idset)).select(
            [id_col, vec_col]
        )

    rows = embeddings.map_batches(pool_vecs, batch_format="pyarrow").take_all()
    vmap = {r[id_col]: np.asarray(r[vec_col], np.float64) for r in rows}
    m = np.stack([vmap[i] for i in ids])
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    m = m / norms
    sim = m @ m.T  # pool x pool, bounded

    selected: list[int] = []
    mmr_scores: list[float] = []
    remaining = list(range(len(ids)))
    while remaining and len(selected) < k:
        if not selected:
            best_j = 0  # pool is already (rel desc, id asc)-ordered
            score = lam * rel[remaining[best_j]]
        else:
            r = np.asarray(remaining)
            penal = sim[np.ix_(r, selected)].max(axis=1)
            mmr = lam * rel[r] - (1.0 - lam) * penal
            best_j = int(np.lexsort((ids[r], -mmr))[0])
            score = float(mmr[best_j])
        mmr_scores.append(score)
        selected.append(remaining.pop(best_j))

    from ..functions.rounding import round_half_away

    return pa.table(
        {
            "rank": pa.array(range(1, len(selected) + 1), pa.int64()),
            id_col: pa.array(ids[selected]),
            "cosine": pa.array(round_half_away(rel[selected], 6), pa.float64()),
            "mmr": pa.array(
                round_half_away(np.asarray(mmr_scores), 6), pa.float64()
            ),
        }
    )


def pca_fit(embeddings, n_components: int = 2, vec_col: str = "embedding"):
    """Exact distributed PCA fit via the classic sufficient-moment plan:
    each block emits ONE partial row (n, sum-vector, flattened sum of outer
    products — d + d^2 doubles, constant in the row count), the driver sums
    the block-count-bounded partials, forms the covariance C = M/n - mu
    mu^T, and takes the top eigenvectors with numpy.linalg.eigh. The only
    data movement is one partial row per block; the corpus never shuffles
    and never lands on the driver. Deterministic sign fix: each component's
    largest-|.|-coordinate is made positive. Returns (mu, components
    [n_components x d], explained_variance)."""

    def partials(b: pa.Table) -> pa.Table:
        m = _to_matrix(b[vec_col]).astype(np.float64)
        return pa.table(
            {
                "n": pa.array([m.shape[0]], pa.int64()),
                "s": pa.array([m.sum(axis=0).tolist()]),
                "m2": pa.array([(m.T @ m).ravel().tolist()]),
            }
        )

    rows = embeddings.map_batches(partials, batch_format="pyarrow").take_all()
    n = sum(r["n"] for r in rows)
    if n == 0:
        raise ValueError("pca_fit: empty embeddings dataset")
    s = np.sum([np.asarray(r["s"]) for r in rows], axis=0)
    m2 = np.sum([np.asarray(r["m2"]) for r in rows], axis=0)
    d = s.shape[0]
    mu = s / n
    cov = m2.reshape(d, d) / n - np.outer(mu, mu)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    idx = np.argsort(evals)[::-1][:n_components]
    comps = evecs[:, idx].T
    flip = np.sign(comps[np.arange(len(idx)), np.abs(comps).argmax(axis=1)])
    flip[flip == 0] = 1.0
    comps = comps * flip[:, None]
    return mu, comps, evals[idx]


def pca_project(
    embeddings,
    n_components: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
):
    """(id, p0..p{k-1}): project every embedding onto the PCA basis fit by
    ``pca_fit`` — the dimensionality-reduction pre-pass (companion of the
    data-independent ``jl_project``: PCA buys the best linear compression
    for one cheap extra moments pass). The (mu, W) model is broadcast once
    via ray.put; projection is one BLAS matmul per batch, shuffle-free."""
    import ray

    mu, comps, _ = pca_fit(embeddings, n_components, vec_col)
    model_ref = ray.put((mu, comps.T))  # d x k

    def project(b: pa.Table) -> pa.Table:
        mu_, w = ray.get(model_ref)
        m = _to_matrix(b[vec_col]).astype(np.float64)
        p = (m - mu_) @ w
        cols = {id_col: b[id_col]}
        for j in range(p.shape[1]):
            cols[f"p{j}"] = pa.array(
                round_half_away(p[:, j], round_to), pa.float64()
            )
        return pa.table(cols)

    return embeddings.map_batches(project, batch_format="pyarrow")


def _lloyd(x: np.ndarray, k: int, seed: int, iters: int = 8) -> np.ndarray:
    """Seeded plain-L2 Lloyd over an in-memory sample (bounded)."""
    rng = np.random.RandomState(seed)
    cent = x[rng.choice(len(x), size=min(k, len(x)), replace=False)].copy()
    for _ in range(iters):
        d = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(cent.shape[0]):
            m = assign == c
            if m.any():
                cent[c] = x[m].mean(axis=0)
    return cent


def pq_fit(
    embeddings,
    m: int = 4,
    kbits: int = 4,
    sample_n: int = 2048,
    seed: int = 13,
    vec_col: str = "embedding",
):
    """Product-quantization codebooks (Jégou et al. 2011, the FAISS IVF-PQ
    building block): split the (unit-normalized) vector into ``m``
    subspaces and train 2^kbits L2 centroids per subspace with a seeded
    Lloyd over a BOUNDED driver sample — the training pass touches
    ``sample_n`` rows however big the corpus is. Returns an (m, 2^kbits,
    d/m) float64 array. At 100 TB this is what makes billion-vector search
    feasible: 64 float32 dims (256 B) compress to m uint8 codes (4 B) with
    distance evaluation via table lookups."""
    k = 1 << kbits
    sample = embeddings.random_sample(1.0, seed=seed).limit(sample_n).take_all()
    x = _to_matrix([r[vec_col] for r in sample]).astype(np.float64)
    x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    d = x.shape[1]
    if d % m:
        raise ValueError(f"pq_fit: dim {d} not divisible by m={m}")
    sub = d // m
    return np.stack(
        [_lloyd(x[:, j * sub : (j + 1) * sub], k, seed + j) for j in range(m)]
    )


def pq_encode(
    embeddings,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """(id, code0..code{m-1}): assign each (unit-normalized) subvector to
    its nearest subspace centroid — one broadcast of the tiny codebooks
    via ray.put, one vectorized argmin per batch per subspace; the corpus
    never shuffles and the output is m uint8 columns per row."""
    import ray

    cb_ref = ray.put(codebooks)
    m = codebooks.shape[0]

    def enc(b: pa.Table) -> pa.Table:
        cb = ray.get(cb_ref)
        x = _to_matrix(b[vec_col]).astype(np.float64)
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        sub = x.shape[1] // m
        cols = {id_col: b[id_col]}
        for j in range(m):
            xs = x[:, j * sub : (j + 1) * sub]
            # ||x - c||^2 argmin == argmax(2 x.c - ||c||^2)
            sc = 2.0 * xs @ cb[j].T - (cb[j] ** 2).sum(axis=1)[None, :]
            cols[f"code{j}"] = pa.array(
                sc.argmax(axis=1).astype(np.uint8)
            )
        return pa.table(cols)

    return embeddings.map_batches(enc, batch_format="pyarrow")


def pq_topk(
    embeddings,
    query_vectors: np.ndarray,
    k: int = 10,
    m: int = 4,
    kbits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 13,
):
    """PQ asymmetric-distance top-k: fit codebooks (bounded sample), encode
    the corpus in place, and score each query against CODES via its
    per-subspace lookup table (m x 2^kbits floats per query) — per batch
    the distance is m table-gathers + adds, never a full-dimension matmul.
    Approximate by construction (quantization error) — recall vs the exact
    brute force is pinned in pytest; rows-only at the driver. Returns
    (query_idx, vec_id, adc_dist, rank), distance rounded 6dp, ties
    id-asc."""
    import pandas as pd
    import ray

    q = np.asarray(query_vectors, dtype=np.float64)
    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    codebooks = pq_fit(embeddings, m=m, kbits=kbits, seed=seed, vec_col=vec_col)
    sub = qn.shape[1] // m
    # per-query distance tables: (Q, m, k) squared L2 between query subvec
    # and each centroid
    tables = np.stack(
        [
            ((qn[:, j * sub : (j + 1) * sub][:, None, :] - codebooks[j][None, :, :]) ** 2).sum(
                axis=2
            )
            for j in range(m)
        ],
        axis=1,
    )
    refs = ray.put((codebooks, tables))

    def local_topk(b: pa.Table) -> pa.Table:
        cb, tb = ray.get(refs)
        ids = b[id_col].to_numpy(zero_copy_only=False)
        x = _to_matrix(b[vec_col]).astype(np.float64)
        x = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
        codes = np.stack(
            [
                (
                    2.0 * x[:, j * sub : (j + 1) * sub] @ cb[j].T
                    - (cb[j] ** 2).sum(axis=1)[None, :]
                ).argmax(axis=1)
                for j in range(m)
            ],
            axis=1,
        )  # (n, m)
        out = {"query_idx": [], id_col: [], "adc_dist": []}
        for qi in range(tb.shape[0]):
            # ADC: sum the per-subspace table entries the codes select
            dist = tb[qi][np.arange(m)[None, :], codes].sum(axis=1)
            order = np.lexsort((ids, dist))[:k]
            out["query_idx"].extend([qi] * len(order))
            out[id_col].extend(ids[order].tolist())
            out["adc_dist"].extend(dist[order].tolist())
        return pa.table(
            {
                "query_idx": pa.array(out["query_idx"], pa.int32()),
                id_col: pa.array(out[id_col]),
                "adc_dist": pa.array(out["adc_dist"], pa.float64()),
            }
        )

    local = embeddings.map_batches(local_topk, batch_format="pyarrow")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["adc_dist", id_col], ascending=[True, True]).head(k)
        g = g.copy()
        g["adc_dist"] = round_half_away(g["adc_dist"].to_numpy(), 6)
        g["rank"] = range(1, len(g) + 1)
        return g

    return local.groupby("query_idx").map_groups(merge, batch_format="pandas")
