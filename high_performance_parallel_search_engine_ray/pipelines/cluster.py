"""Distributed clustering over an embedding column, and the cluster-based
semantic-dedup pass built on it (SemDeDup-style; Abbas et al. 2023, public).

The reference engine has no clustering — its nearest analog is the GPU
cosine-similarity ranking kernel (`CUDA-OpenMP Hybrid Version/src/
cuda_kernels.cu:198-225`). These operators are training-data-curation
additions: k-means gives the corpus a topic/cluster structure, and SemDeDup
removes semantic near-duplicates by comparing vectors only WITHIN a cluster
— turning the O(N^2) all-pairs cosine problem into k bounded problems.

Scale shape (100 TB):
- k-means is Lloyd iterations expressed as Ray Data passes. Centroids are
  broadcast once per iteration (`ray.put`, read per batch — never re-shipped
  per row). Each pass emits per-BLOCK partial sums (cluster, psum, pcount):
  k small rows per block, produced by one matmul + np.add.at, so the
  shuffle that merges partials moves k x n_blocks tiny rows — never the
  vectors. The k merged rows return to the driver because Lloyd inherently
  syncs there (next iteration needs the new centroids).
- semdedup co-locates each cluster with ONE groupby('cluster') shuffle.
  Vectors do travel in that shuffle — that is the algorithm's point: only
  within-cluster pairs are ever compared. Oversized clusters are capped
  (``max_cluster``, keep-smallest-ids) with the dropped count carried in a
  column and logged, the same guardrail as the LSH bucket caps in
  pipelines/dedup.py. k is bounded (caller-chosen), so the per-group
  map_groups tax is k calls, not N.

Determinism: init is seeded k-means++-lite over a bounded sample, and every
per-batch computation is deterministic; final centroids can differ in the
last float bits across runs because partial sums merge in
block-arrival order (documented, inherent to parallel reduction). The
assignment pass is self-consistent by construction: every vector is
assigned to its nearest FINAL centroid in one deterministic map.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.rounding import round_half_away
from ..functions.veclib import list_column_to_matrix


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def _init_centroids(embeddings, k: int, seed: int, vec_col: str, sample_n: int):
    """Seeded k-means++-lite init over a bounded sample (driver-side; the
    sample is `sample_n` rows however big the corpus is)."""
    sample = embeddings.random_sample(1.0, seed=seed).limit(sample_n).take_all()
    x = _normalize(list_column_to_matrix([r[vec_col] for r in sample]))
    # take_all returns blocks in COMPLETION order (measured: the first
    # execution of a fresh pipeline can arrive permuted) — lexicographic row
    # sort makes the k-means++ draw a function of the sample SET, not of
    # block arrival order
    x = x[np.lexsort(x.T[::-1])]
    rng = np.random.RandomState(seed)
    cent = [x[rng.randint(len(x))]]
    for _ in range(1, min(k, len(x))):
        # d2 = squared cosine distance to nearest chosen centroid
        sims = x @ np.stack(cent).T
        d2 = np.maximum(1.0 - sims.max(axis=1), 0.0) ** 2
        tot = d2.sum()
        if tot <= 0:
            cent.append(x[rng.randint(len(x))])
            continue
        cent.append(x[np.searchsorted(np.cumsum(d2 / tot), rng.rand())])
    return np.stack(cent)


def kmeans_fit(
    embeddings,
    k: int = 8,
    iters: int = 10,
    seed: int = 11,
    vec_col: str = "embedding",
    sample_n: int = 2048,
    tol: float = 1e-4,
    inmemory_vals: int = 20_000_000,
) -> np.ndarray:
    """Spherical k-means (cosine) over the FULL dataset: distributed Lloyd.

    Unlike ann.ivf_topk (which trains on a sample only), every iteration
    here streams the whole corpus: one map_batches pass per iteration emits
    per-block partial sums, a k-row groupby merges them, the driver
    renormalizes. Returns the (k, dim) unit-norm centroid matrix.

    The input is materialized once up front — each Lloyd pass then reads
    pinned object-store blocks instead of re-running the parquet read
    `iters` times (measured 9.7 s -> ~4 s on the sf0.1 contract query).
    Callers running fit + assign should pass the SAME materialized dataset
    to both. tol=1e-4 stops early once centroids move less than assignment
    boundaries can notice."""
    import ray

    embeddings = embeddings.materialize()
    cent = _init_centroids(embeddings, k, seed, vec_col, sample_n)
    k_eff = cent.shape[0]

    # Cost-based escape (the pagerank/dup_clusters lesson): each Lloyd
    # pass pays a full dataset execution; at or below ``inmemory_vals``
    # matrix floats (~160 MB default) the matrix is pulled ONCE and the
    # same iterations run as local matmuls — identical math, bounded pull.
    n_rows = embeddings.count()
    if n_rows * cent.shape[1] <= inmemory_vals:
        mats = [
            list_column_to_matrix(t[vec_col])
            for t in embeddings.select_columns([vec_col]).iter_batches(
                batch_format="pyarrow", batch_size=None
            )
            if t.num_rows
        ]
        m = _normalize(np.vstack(mats)) if mats else np.zeros((0, cent.shape[1]))
        for _ in range(iters):
            a = np.argmax(m @ cent.T, axis=1)
            sums = np.zeros_like(cent)
            np.add.at(sums, a, m)
            counts = np.bincount(a, minlength=k_eff)
            new = cent.copy()
            for c in range(k_eff):
                if counts[c] > 0:
                    v = sums[c] / counts[c]
                    new[c] = v / max(np.linalg.norm(v), 1e-12)
            shift = float(np.abs(new - cent).max())
            cent = new
            if shift < tol:
                break
        return cent

    for _ in range(iters):
        cent_ref = ray.put(cent)

        def partials(b: pa.Table) -> pa.Table:
            c = ray.get(cent_ref)
            m = _normalize(list_column_to_matrix(b[vec_col]))
            assign = np.argmax(m @ c.T, axis=1)
            psum = np.zeros((c.shape[0], m.shape[1]), dtype=np.float64)
            np.add.at(psum, assign, m)
            pcount = np.bincount(assign, minlength=c.shape[0])
            nz = np.nonzero(pcount)[0]
            return pa.table(
                {
                    "cluster": pa.array(nz.astype(np.int32)),
                    "psum": pa.array(list(psum[nz])),
                    "pcount": pa.array(pcount[nz].astype(np.int64)),
                }
            )

        # Merge partials DRIVER-side (k x n_blocks tiny rows; the
        # treeAggregate pattern): a groupby shuffle for k rows costs a full
        # sort-based all-to-all per iteration — measured ~0.6 s/iter of pure
        # overhead at bench scale. At very large block counts insert one
        # coarsening map_batches pass before the pull.
        rows = embeddings.map_batches(partials, batch_format="pyarrow").take_all()
        sums = np.zeros_like(cent)
        counts = np.zeros(k_eff, dtype=np.int64)
        for r in rows:
            c = r["cluster"]
            sums[c] += np.asarray(r["psum"], dtype=np.float64)
            counts[c] += r["pcount"]
        new = cent.copy()
        for c in range(k_eff):
            if counts[c] > 0:
                v = sums[c] / counts[c]
                new[c] = v / max(np.linalg.norm(v), 1e-12)
        shift = float(np.abs(new - cent).max())
        cent = new
        if shift < tol:
            break
    assert cent.shape[0] == k_eff
    return cent


def kmeans_assign(
    embeddings,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_vec: bool = False,
):
    """One deterministic pass: (id, cluster, cosine-to-centroid). With
    keep_vec=True the embedding column rides along (for a downstream
    within-cluster stage)."""
    import ray

    cent_ref = ray.put(np.asarray(centroids, dtype=np.float64))

    def assign(b: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        m = _normalize(list_column_to_matrix(b[vec_col]))
        sims = m @ c.T
        a = np.argmax(sims, axis=1)
        cols = {
            id_col: b[id_col],
            "cluster": pa.array(a.astype(np.int32)),
            "cosine": pa.array(
                round_half_away(sims[np.arange(len(a)), a], 6), pa.float64()
            ),
        }
        if keep_vec:
            cols[vec_col] = b[vec_col]
        return pa.table(cols)

    return embeddings.map_batches(assign, batch_format="pyarrow")


def kmeans_cluster_stats(
    embeddings,
    k: int = 8,
    iters: int = 10,
    seed: int = 11,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Contract query: fit + assign + per-cluster (size, mean cosine to
    centroid). Small output (k rows); approximate by construction (seeded
    Lloyd) — rows-only driver check, exactness tested in pytest against an
    in-memory numpy Lloyd with the same init."""
    from ray.data.aggregate import Count, Mean

    embeddings = embeddings.materialize()  # shared by fit AND assign
    cent = kmeans_fit(embeddings, k=k, iters=iters, seed=seed, vec_col=vec_col)
    assigned = kmeans_assign(embeddings, cent, id_col=id_col, vec_col=vec_col)
    stats = assigned.groupby("cluster").aggregate(
        Count(alias_name="size"), Mean("cosine", alias_name="mean_cosine")
    )

    def finish(b: pa.Table) -> pa.Table:
        return b.set_column(
            b.schema.get_field_index("mean_cosine"),
            "mean_cosine",
            round_half_away(b["mean_cosine"], 6),
        )

    return stats.map_batches(finish, batch_format="pyarrow").sort("cluster")


def semdedup(
    embeddings,
    k: int = 8,
    threshold: float = 0.95,
    iters: int = 10,
    seed: int = 11,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster: int = 4096,
):
    """SemDeDup: drop semantic near-duplicates, keeping per near-dup group
    the smallest id. Returns (id, cluster, dup_of, cosine) — one row per
    DROPPED vector, dup_of = the kept representative.

    Within each cluster (co-located by one groupby shuffle) the pairwise
    cosine matrix is computed vectorized over ids sorted ascending; a
    vector is dropped if some EARLIER vector in its cluster has cosine >=
    threshold (earliest such = its representative). Clusters above
    ``max_cluster`` are capped keep-smallest-ids with the overflow count
    logged — at real scale pick k so that N/k stays under the cap."""
    import logging

    embeddings = embeddings.materialize()  # shared by fit AND assign
    cent = kmeans_fit(embeddings, k=k, iters=iters, seed=seed, vec_col=vec_col)
    assigned = kmeans_assign(
        embeddings, cent, id_col=id_col, vec_col=vec_col, keep_vec=True
    )

    def cluster_dups(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="stable")
        if len(g) > max_cluster:
            logging.getLogger(__name__).warning(
                "semdedup: cluster %s capped %d -> %d (raise k)",
                g["cluster"].iloc[0], len(g), max_cluster,
            )
            g = g.head(max_cluster)
        ids = g[id_col].to_numpy()
        m = _normalize(list_column_to_matrix(list(g[vec_col])))
        sims = m @ m.T
        np.fill_diagonal(sims, -1.0)
        # strictly-lower triangle: candidate representatives are EARLIER rows
        tril = np.tril(sims, k=-1)
        hit = tril >= threshold
        has_dup = hit.any(axis=1)
        if not has_dup.any():
            return pd.DataFrame(
                {
                    id_col: pd.Series([], dtype=ids.dtype),
                    "cluster": pd.Series([], dtype=np.int32),
                    "dup_of": pd.Series([], dtype=ids.dtype),
                    "cosine": pd.Series([], dtype=np.float64),
                }
            )
        rep = hit.argmax(axis=1)  # earliest earlier row over threshold
        rows = np.nonzero(has_dup)[0]
        return pd.DataFrame(
            {
                id_col: ids[rows],
                "cluster": g["cluster"].to_numpy()[rows],
                "dup_of": ids[rep[rows]],
                "cosine": round_half_away(tril[rows, rep[rows]], 6),
            }
        )

    return assigned.groupby("cluster").map_groups(
        cluster_dups, batch_format="pandas"
    )
