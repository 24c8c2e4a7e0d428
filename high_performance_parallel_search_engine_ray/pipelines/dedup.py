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
    max_bucket: int = 128,
):
    """Near-dup pairs via MinHash+LSH with exact-Jaccard verification.

    Scale-shaped dataflow — no driver-side materialization of pairs or
    shingle sets; the only thing broadcast is the candidate ID set:
      1. shingle -> minhash per batch (numpy) -> explode to
         (band, band_hash, doc_id) rows
      2. groupby(band, band_hash) -> candidate pairs (ids only). Buckets
         with more than ``max_bucket`` members (degenerate: exact dups,
         empty docs, boilerplate) are truncated to the ``max_bucket``
         smallest ids; the number of dropped members is carried in a
         ``bucket_dropped`` column, summed cheaply, and logged.
      3. distinct pairs (groupby) stay a Dataset; the candidate ID set
         (ids only — small) is broadcast to filter the docs scan that
         builds per-candidate shingle strings.
      4. verification is a distributed co-location join: pair-membership
         rows union candidate shingle rows, groupby(doc id) attaches each
         doc's shingles to its pairs, groupby(pair) computes exact
         word-shingle Jaccard. (Ray 2.49's Dataset.join breaks on empty
         hash partitions — ArrowBlockBuilder().build() yields a
         zero-column table Acero rejects — so the join is expressed as
         union + groupby, which the sort-based shuffle handles.)
    Returns (doc_a, doc_b, jaccard) with doc_a < doc_b, jaccard >= threshold.
    """
    import logging

    import ray

    logger = logging.getLogger(__name__)

    a, b_ = minhash_params(num_perm, seed)
    rows_per_band = num_perm // bands
    id_type = docs.schema().base_schema.field(id_col).type

    def _empty():
        return ray.data.from_arrow(
            pa.table({"doc_a": pa.array([], id_type),
                      "doc_b": pa.array([], id_type),
                      "jaccard": pa.array([], pa.float64())})
        )

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
                id_col: pa.array(out[id_col], id_type),
            }
        )

    buckets = docs.map_batches(sig_batch, batch_format="pyarrow")

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"doc_a": pd.Series([], dtype=g[id_col].dtype),
             "doc_b": pd.Series([], dtype=g[id_col].dtype),
             "bucket_dropped": pd.Series([], dtype="int64")}
        )
        if len(g) < 2:
            return empty
        ids = sorted(g[id_col].tolist())
        dropped = 0
        if len(ids) > max_bucket:
            dropped = len(ids) - max_bucket
            ids = ids[:max_bucket]
        out = {"doc_a": [], "doc_b": []}
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                out["doc_a"].append(ids[i])
                out["doc_b"].append(ids[j])
        df = pd.DataFrame(out)
        df["bucket_dropped"] = 0
        if dropped and len(df):
            df.iloc[0, df.columns.get_loc("bucket_dropped")] = dropped
        return df

    # Candidate pairs: ids only — materialized in the OBJECT STORE (not the
    # driver) because three consumers follow (drop-count, distinct, joins).
    cand = (
        buckets.groupby(["band", "band_hash"])
        .map_groups(pairs_in_bucket, batch_format="pandas")
        .materialize()
    )
    dropped_total = cand.sum("bucket_dropped") or 0
    if dropped_total:
        logger.warning(
            "minhash_lsh_pairs: %d bucket members dropped by max_bucket=%d "
            "(degenerate LSH buckets; raise max_bucket or pre-collapse exact "
            "dups to cover them)", dropped_total, max_bucket,
        )

    from ray.data.aggregate import Count

    distinct = (
        cand.groupby(["doc_a", "doc_b"])
        .aggregate(Count(alias_name="_n"))
        .select_columns(["doc_a", "doc_b"])
        .materialize()  # candidate-scale, ids only
    )
    if distinct.count() == 0:
        return _empty()

    cand_ids = sorted(set(distinct.unique("doc_a")) | set(distinct.unique("doc_b")))
    id_set = pa.array(cand_ids, id_type)
    id_ref = ray.put(id_set)

    # Shingle strings for candidate docs only ('\x1f'-joined so the shuffle
    # carries a flat string, not a list<> column). Candidate-scale; object
    # store, never the driver. Row layout shared with membership rows:
    # (jk, p_a, p_b, sh, is_sh).
    def shingles_batch(b: pa.Table) -> pa.Table:
        vs = ray.get(id_ref)
        t = b.filter(pc.is_in(b[id_col], value_set=vs))
        rows = {"jk": [], "sh": []}
        for did, text in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
            toks = text.split()
            sh = {
                " ".join(toks[i : i + shingle_k])
                for i in range(max(1, len(toks) - shingle_k + 1))
            }
            rows["jk"].append(did)
            rows["sh"].append("\x1f".join(sorted(sh)))
        n = len(rows["jk"])
        jk = pa.array(rows["jk"], id_type)
        return pa.table({"jk": jk, "p_a": jk, "p_b": jk,
                         "sh": pa.array(rows["sh"], pa.string()),
                         "is_sh": pa.array([1] * n, pa.int8())})

    sh_rows = docs.map_batches(
        shingles_batch, batch_format="pyarrow", batch_size=verify_batch_size
    )

    def member_rows(b: pa.Table) -> pa.Table:
        da, db = b["doc_a"], b["doc_b"]
        n = b.num_rows
        return pa.table(
            {
                "jk": pa.concat_arrays([da.combine_chunks(), db.combine_chunks()]),
                "p_a": pa.concat_arrays([da.combine_chunks(), da.combine_chunks()]),
                "p_b": pa.concat_arrays([db.combine_chunks(), db.combine_chunks()]),
                "sh": pa.array([""] * (2 * n), pa.string()),
                "is_sh": pa.array([0] * (2 * n), pa.int8()),
            }
        )

    members = distinct.map_batches(member_rows, batch_format="pyarrow")

    # Co-locate each candidate doc's shingles with its pair memberships,
    # then co-locate the two sides of each pair — both shuffles move only
    # candidate-scale rows.
    def attach(g: pd.DataFrame) -> pd.DataFrame:
        shr = g[g["is_sh"] == 1]
        mem = g[g["is_sh"] == 0]
        if shr.empty or mem.empty:
            return pd.DataFrame(
                {"doc_a": pd.Series([], dtype=g["jk"].dtype),
                 "doc_b": pd.Series([], dtype=g["jk"].dtype),
                 "jk": pd.Series([], dtype=g["jk"].dtype),
                 "sh": pd.Series([], dtype="object")}
            )
        sh = shr["sh"].iloc[0]
        return pd.DataFrame(
            {"doc_a": mem["p_a"].values, "doc_b": mem["p_b"].values,
             "jk": mem["jk"].values, "sh": [sh] * len(mem)}
        )

    attached = members.union(sh_rows).groupby("jk").map_groups(
        attach, batch_format="pandas"
    )

    def verify_pair(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"doc_a": pd.Series([], dtype=g["doc_a"].dtype),
             "doc_b": pd.Series([], dtype=g["doc_b"].dtype),
             "jaccard": pd.Series([], dtype="float64")}
        )
        if len(g) != 2:
            return empty  # one side vanished from the corpus
        da, db = g["doc_a"].iloc[0], g["doc_b"].iloc[0]
        sh_a = g.loc[g["jk"] == da, "sh"]
        sh_b = g.loc[g["jk"] == db, "sh"]
        if sh_a.empty or sh_b.empty:
            return empty
        jac = jaccard(set(sh_a.iloc[0].split("\x1f")),
                      set(sh_b.iloc[0].split("\x1f")))
        if jac < jaccard_threshold:
            return empty
        return pd.DataFrame(
            {"doc_a": [da], "doc_b": [db],
             "jaccard": [round_half_away(jac, 6)]}
        )

    return attached.groupby(["doc_a", "doc_b"]).map_groups(
        verify_pair, batch_format="pandas"
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


def simhash_dup_pairs(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    radius: int = 3,
    max_bucket: int = 256,
):
    """Near-dup pairs by hamming distance <= ``radius`` over 64-bit SimHash.

    4-band LSH (16 bits per band): any pair within hamming <= 3 must agree
    exactly on at least one band (pigeonhole, radius < bands), so bucketing
    by (band, band_bits) finds every such pair. The bucket rows carry the
    full signature (8 bytes), so verification is a popcount inside the
    bucket group — no second join. Buckets over ``max_bucket`` members are
    truncated to the smallest ids (mirrors minhash_lsh_pairs).
    Returns (doc_a, doc_b, hamming) with doc_a < doc_b.
    """
    bands = 4
    assert radius < bands, "pigeonhole guarantee needs radius < bands"
    id_type = docs.schema().base_schema.field(id_col).type

    def sig_batch(b: pa.Table) -> pa.Table:
        out = {"band": [], "band_bits": [], id_col: [], "sig": []}
        for did, text in zip(b[id_col].to_pylist(), b[text_col].to_pylist()):
            s = simhash64(text.lower().split())
            s_signed = int(np.int64(np.uint64(s)))
            for band in range(bands):
                out["band"].append(band)
                out["band_bits"].append((s >> (band * 16)) & 0xFFFF)
                out[id_col].append(did)
                out["sig"].append(s_signed)
        return pa.table(
            {
                "band": pa.array(out["band"], pa.int32()),
                "band_bits": pa.array(out["band_bits"], pa.int32()),
                id_col: pa.array(out[id_col], id_type),
                "sig": pa.array(out["sig"], pa.int64()),
            }
        )

    buckets = docs.map_batches(sig_batch, batch_format="pyarrow")

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"doc_a": pd.Series([], dtype=g[id_col].dtype),
             "doc_b": pd.Series([], dtype=g[id_col].dtype),
             "hamming": pd.Series([], dtype="int64")}
        )
        if len(g) < 2:
            return empty
        g = g.sort_values(id_col).head(max_bucket)
        ids = g[id_col].tolist()
        sigs = [int(s) & 0xFFFFFFFFFFFFFFFF for s in g["sig"].tolist()]
        out = {"doc_a": [], "doc_b": [], "hamming": []}
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                h = bin(sigs[i] ^ sigs[j]).count("1")
                if h <= radius:
                    out["doc_a"].append(ids[i])
                    out["doc_b"].append(ids[j])
                    out["hamming"].append(h)
        return pd.DataFrame(out) if out["doc_a"] else empty

    pairs = buckets.groupby(["band", "band_bits"]).map_groups(
        pairs_in_bucket, batch_format="pandas"
    )
    # same pair can surface from up to `bands` buckets -> distinct
    return pairs.groupby(["doc_a", "doc_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


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


def embedding_dup_pairs_lsh(
    embeddings,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 11,
    max_bucket: int = 512,
):
    """Cosine near-dup pairs WITHOUT a label column: random-hyperplane LSH.

    The scale path ``embedding_dup_pairs`` documents: each vector gets an
    ``n_planes``-bit sign signature (one matmul per batch against a
    broadcast plane matrix — no per-row Python), split into ``bands`` bands;
    vectors agreeing on at least one band's bits land in a shared bucket
    (pigeonhole: any pair with < ``bands`` differing bits is guaranteed a
    bucket; at cosine >= 0.95 the expected bit disagreement is
    n_planes * acos(0.95)/pi ~= 1.6 bits, so recall is high but — unlike
    the label-blocked exact variant — not 1.0; that is the documented LSH
    trade). Exact cosine verification runs inside each bucket group.
    Shuffle volume: (band, bits, id, vector) rows — bands x the input, no
    all-pairs until inside a bounded bucket (``max_bucket`` truncation
    mirrors minhash_lsh_pairs).
    Returns (id_a, id_b, cosine) with id_a < id_b, cosine rounded 6dp.
    """
    assert n_planes % bands == 0
    bits_per_band = n_planes // bands
    # per-task plane cache; regeneration is deterministic (seeded by dim)
    planes_by_dim: dict[int, np.ndarray] = {}

    def sig_batch(b: pa.Table) -> pa.Table:
        vecs = np.stack(
            [np.asarray(v, dtype=np.float64) for v in b[vec_col].to_pylist()]
        )
        d = vecs.shape[1]
        planes = planes_by_dim.get(d)
        if planes is None:
            planes = np.random.default_rng(seed).standard_normal((d, n_planes))
            planes_by_dim[d] = planes
        bits = (vecs @ planes) >= 0  # (n, n_planes)
        out = {"band": [], "bits": [], id_col: [], "vec": []}
        ids = b[id_col].to_pylist()
        vec_list = b[vec_col].to_pylist()
        for band in range(bands):
            chunk = bits[:, band * bits_per_band : (band + 1) * bits_per_band]
            packed = chunk @ (1 << np.arange(bits_per_band))
            out["band"].extend([band] * len(ids))
            out["bits"].extend(int(x) for x in packed)
            out[id_col].extend(ids)
            out["vec"].extend(vec_list)
        return pa.table(
            {
                "band": pa.array(out["band"], pa.int32()),
                "bits": pa.array(out["bits"], pa.int64()),
                id_col: pa.array(out[id_col]),
                "vec": pa.array(out["vec"], pa.list_(pa.float64())),
            }
        )

    buckets = embeddings.map_batches(sig_batch, batch_format="pyarrow")

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"id_a": pd.Series([], dtype=g[id_col].dtype),
             "id_b": pd.Series([], dtype=g[id_col].dtype),
             "cosine": pd.Series([], dtype="float64")}
        )
        if len(g) < 2:
            return empty
        g = g.sort_values(id_col).head(max_bucket)
        ids = g[id_col].tolist()
        m = np.stack([np.asarray(v, dtype=np.float64) for v in g["vec"]])
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
        return pd.DataFrame(out) if out["id_a"] else empty

    pairs = buckets.groupby(["band", "bits"]).map_groups(
        pairs_in_bucket, batch_format="pandas"
    )
    # a pair can surface from several bands -> distinct (keep first)
    return pairs.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )
