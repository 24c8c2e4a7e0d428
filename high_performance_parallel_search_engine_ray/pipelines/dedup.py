"""Deduplication pipelines over a (doc_id, text) Dataset.

Engine additions for training-data curation (the reference's only dedup is
the exact URL-seen set, SURVEY.md §2.7). All deterministic; the probabilistic
ones (MinHash-LSH, SimHash) are fixed-seed.

- exact_dedup:        content-hash (md5) -> hash-partition groupby -> keep
                      min doc_id per group (per-group-first).
- minhash_lsh_pairs:  word-shingle MinHash -> banded LSH buckets ->
                      candidate pairs within buckets -> verified Jaccard.
- simhash_signatures: 64-bit SimHash per doc (near-dup by hamming radius).
- ngram_jaccard_pairs: exact char-3-gram Jaccard within cheap blocks
                      (SQL-expressible; serves as the dedup oracle anchor).
- embedding_dup_pairs: cosine >= threshold within label blocks over an
                      embedding column.

Scale notes (100 TB): exact_dedup shuffles only (hash, doc_id) pairs, not
text; LSH shuffles (band, bucket, doc_id) triples; candidate verification
re-reads only candidate texts. Blocked variants shuffle within blocks only.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import (
    minhash_params,
    minhash_signature,
    shingle_hashes_vec,
    simhash64,
    stable_hash64_bytes,
    token_hashes,
)
from ..functions.rounding import round_half_away
from ..functions.textstats import jaccard


def exact_dedup(docs, id_col: str = "doc_id", text_col: str = "text"):
    """(content_hash, doc_id=min, n_copies) per distinct text."""

    def hash_batch(b: pa.Table) -> pa.Table:
        hs = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in b[text_col].to_pylist()]
        return pa.table({"content_hash": pa.array(hs), id_col: b[id_col]})

    from ray.data.aggregate import Count, Min

    hashed = docs.map_batches(hash_batch, batch_format="pyarrow")
    return hashed.groupby("content_hash").aggregate(
        Min(id_col, alias_name="keeper_doc_id"), Count(alias_name="n_copies")
    )


def minhash_lsh_pairs(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    jaccard_threshold: float = 0.5,
    seed: int = 7,
    verify_batch_size: int = 4096,
):
    """Near-dup pairs via MinHash+LSH with exact-Jaccard verification.

    Scale-shaped dataflow — the shuffle moves HASHES, never text:
      1. shingle -> minhash per batch (numpy) -> explode to
         (band, band_hash, doc_id) rows
      2. groupby(band, band_hash) -> candidate pairs (ids only), distinct
      3. verification re-reads ONLY the candidate docs' texts (broadcast
         id-set filter over the docs Dataset) and computes exact
         word-shingle Jaccard per pair inside map_batches.
    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard >= threshold.
    """
    import ray

    a, b_ = minhash_params(num_perm, seed)
    rows_per_band = num_perm // bands

    def sig_batch(batch: pa.Table) -> pa.Table:
        out = {"band": [], "band_hash": [], id_col: []}
        ids = batch[id_col].to_pylist()
        texts = batch[text_col].to_pylist()
        for did, text in zip(ids, texts):
            toks = text.split()
            sig = minhash_signature(
                shingle_hashes_vec(token_hashes(toks), shingle_k), a, b_
            )
            for band in range(bands):
                chunk = sig[band * rows_per_band : (band + 1) * rows_per_band]
                bh = stable_hash64_bytes(chunk.tobytes()) & 0x7FFFFFFFFFFFFFFF
                out["band"].append(band)
                out["band_hash"].append(bh)
                out[id_col].append(did)
        return pa.table(
            {
                "band": pa.array(out["band"], pa.int32()),
                "band_hash": pa.array(out["band_hash"], pa.int64()),
                id_col: pa.array(out[id_col]),
            }
        )

    buckets = docs.map_batches(sig_batch, batch_format="pyarrow")

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": []})
        ids = sorted(g[id_col].tolist())
        out = {"doc_a": [], "doc_b": []}
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                out["doc_a"].append(ids[i])
                out["doc_b"].append(ids[j])
        return pd.DataFrame(out)

    cand = (
        buckets.groupby(["band", "band_hash"])
        .map_groups(pairs_in_bucket, batch_format="pandas")
        .groupby(["doc_a", "doc_b"])
        .map_groups(lambda g: g.head(1), batch_format="pandas")
    )
    pairs = [(int(r["doc_a"]), int(r["doc_b"])) if not isinstance(r["doc_a"], str)
             else (r["doc_a"], r["doc_b"]) for r in cand.take_all()]
    if not pairs:
        return ray.data.from_arrow(
            pa.table({"doc_a": pa.array([], pa.int64()),
                      "doc_b": pa.array([], pa.int64()),
                      "jaccard": pa.array([], pa.float64())})
        )
    cand_ids = sorted({x for p in pairs for x in p})
    id_set = pa.array(cand_ids)

    # Re-read only the candidate texts, build the shingle sets distributed,
    # broadcast the (small) candidate shingle map for the pair pass.
    def shingles_batch(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = b.filter(pc.is_in(b[id_col], value_set=id_set))
        rows = {"id": [], "sh": []}
        for did, text in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
            toks = text.split()
            sh = {
                " ".join(toks[i : i + shingle_k])
                for i in range(max(1, len(toks) - shingle_k + 1))
            }
            rows["id"].append(did)
            rows["sh"].append(sorted(sh))
        return pa.table({"id": pa.array(rows["id"]),
                         "sh": pa.array(rows["sh"], pa.list_(pa.string()))})

    sh_map = {
        r["id"]: set(r["sh"])
        for r in docs.map_batches(shingles_batch, batch_format="pyarrow").take_all()
    }
    out = {"doc_a": [], "doc_b": [], "jaccard": []}
    for da, db in pairs:
        jac = jaccard(sh_map.get(da, set()), sh_map.get(db, set()))
        if jac >= jaccard_threshold:
            out["doc_a"].append(da)
            out["doc_b"].append(db)
            out["jaccard"].append(round_half_away(jac, 6))
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_a": pa.array(out["doc_a"]),
                "doc_b": pa.array(out["doc_b"]),
                "jaccard": pa.array(out["jaccard"], pa.float64()),
            }
        )
    )


def simhash_signatures(docs, id_col: str = "doc_id", text_col: str = "text"):
    """(doc_id, simhash) — near-dup candidates are hamming-close signatures."""

    def sim_batch(b: pa.Table) -> pa.Table:
        sigs = [
            np.int64(np.uint64(simhash64(t.lower().split())))
            for t in b[text_col].to_pylist()
        ]
        return pa.table({id_col: b[id_col], "simhash": pa.array(sigs, pa.int64())})

    return docs.map_batches(sim_batch, batch_format="pyarrow")


def ngram_jaccard_pairs(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    block_prefix: int = 16,
):
    """Exact char-3-gram Jaccard over pairs sharing a text prefix block.

    SQL-expressible (grams via substr over generate_series; blocks via
    substr(text,1,16)) — this is the dedup family's oracle-checked anchor.
    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard rounded 6dp.
    """

    def block_batch(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "blk": pc.utf8_slice_codeunits(b[text_col], 0, block_prefix),
                id_col: b[id_col],
                "text": b[text_col],
            }
        )

    blocked = docs.map_batches(block_batch, batch_format="pyarrow")

    def pairs_in_block(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "jaccard": []})
        g = g.sort_values(id_col)
        ids = g[id_col].tolist()
        grams = [
            {t[i : i + 3] for i in range(len(t) - 2)} if len(t) >= 3 else {t}
            for t in g["text"].tolist()
        ]
        out = {"doc_a": [], "doc_b": [], "jaccard": []}
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                jac = jaccard(grams[i], grams[j])
                if jac >= threshold:
                    out["doc_a"].append(ids[i])
                    out["doc_b"].append(ids[j])
                    out["jaccard"].append(round_half_away(jac, 6))
        return pd.DataFrame(out)

    return blocked.groupby("blk").map_groups(pairs_in_block, batch_format="pandas")


def embedding_dup_pairs(
    embeddings,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str = "label",
    threshold: float = 0.95,
):
    """Cosine-similarity near-dup pairs within blocks (label column or an
    LSH bucket at scale). Returns (id_a, id_b, cosine) rounded 6dp."""

    def pairs_in_block(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        g = g.sort_values(id_col)
        ids = g[id_col].tolist()
        m = np.stack([np.asarray(v, dtype=np.float64) for v in g[vec_col]])
        nrm = np.linalg.norm(m, axis=1, keepdims=True)
        nrm[nrm == 0] = 1.0
        sims = (m / nrm) @ (m / nrm).T
        out = {"id_a": [], "id_b": [], "cosine": []}
        iu, ju = np.triu_indices(len(ids), k=1)
        for i, j in zip(iu, ju):
            c = sims[i, j]
            if c >= threshold:
                out["id_a"].append(ids[i])
                out["id_b"].append(ids[j])
                out["cosine"].append(round_half_away(float(c), 6))
        return pd.DataFrame(out)

    return embeddings.groupby(block_col).map_groups(pairs_in_block, batch_format="pandas")
