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

from ..functions.distinct import distinct_values
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
from ..functions.veclib import list_column_to_matrix


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


def dedup_keep_first(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    drop_broadcast_ids: int = 2_000_000,
):
    """The filtering counterpart of exact_dedup: returns the docs Dataset
    with exact duplicates removed, keeping the min-id copy of each distinct
    text.

    Dataflow: (md5, id) rows -> bounded hash-partition groupby ->
    per-partition vectorized keep-min -> DROP-id set. The drop set holds
    only the non-min duplicate copies — in a real corpus a small fraction
    of the input — so its application is COST-BASED (same policy as the
    curate drop path and relational._attach_or_join): at or below
    ``drop_broadcast_ids`` the ids broadcast once via ray.put and docs
    filter in one map_batches (the text column never enters a shuffle and
    only the drop ids touch the driver); above it, the previous shape — a
    keeper-table hash-shuffle semi-join (Dataset.join) — applies, which
    stays fully distributed at any drop-set size. Both paths return the
    identical (docs-schema) result; a test forces the join path.

    This is the operator a training-data pipeline actually applies before
    tokenization."""
    import ray

    N_PARTS = 64

    def hash_rows(b: pa.Table) -> pa.Table:
        hs = [
            hashlib.md5(t.encode("utf-8")).hexdigest()
            for t in b[text_col].to_pylist()
        ]
        part = (
            pd.util.hash_array(np.asarray(hs, dtype=object)) % N_PARTS
        ).astype(np.int32)
        return pa.table(
            {"h": pa.array(hs), id_col: b[id_col], "part": pa.array(part)}
        )

    def drops_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["h", id_col], kind="stable")
        h = g["h"].to_numpy()
        keep = np.ones(len(g), dtype=bool)
        keep[1:] = h[1:] != h[:-1]  # first (min-id) row of each hash run
        return g.loc[~keep, [id_col]]

    drops = (
        docs.map_batches(hash_rows, batch_format="pyarrow")
        .groupby("part")
        .map_groups(drops_part, batch_format="pandas")
        .materialize()
    )
    if drops.count() <= drop_broadcast_ids:
        id_type = docs.schema().base_schema.field(id_col).type
        chunks = [
            t[id_col].combine_chunks().cast(id_type)
            for t in drops.iter_batches(batch_format="pyarrow", batch_size=None)
            if t.num_rows
        ]
        drop_ref = ray.put(
            pa.concat_arrays(chunks) if chunks else pa.array([], id_type)
        )
        return docs.map_batches(
            lambda b: b.filter(
                pc.invert(pc.is_in(b[id_col], value_set=ray.get(drop_ref)))
            ),
            batch_format="pyarrow",
        )

    keepers = exact_dedup(docs, id_col, text_col).map_batches(
        lambda b: b.select(["keeper_doc_id"]).rename_columns(["__keep_id"]),
        batch_format="pyarrow",
    )
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    npart = max(2, cpus // 2)
    # keeper table is an aggregate output -> launder through repartition
    # (Acero rejects empty no-schema hash partitions; see relational.py)
    return docs.join(
        keepers.repartition(npart), join_type="inner", num_partitions=npart,
        on=(id_col,), right_on=("__keep_id",),
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
    estimate_margin: float = 0.2,
):
    """Near-dup pairs via MinHash+LSH with exact-Jaccard verification.

    Scale-shaped dataflow — no driver-side materialization of pairs or
    shingle sets; the only thing broadcast is the candidate ID set:
      1. shingle -> minhash per batch (numpy) -> explode to
         (bucket key, doc_id, sig) rows (key folds band into the band
         hash; sig = the full num_perm signature, 8*num_perm bytes —
         carried so buckets can PRUNE).
      2. partition-grouped bucket stage (groupby hash(key) % N_PARTS, all
         buckets of a partition processed vectorized — see the N_PARTS
         note below) -> candidate pairs (ids only), pruned in-bucket by
         the signature's ESTIMATED Jaccard (mean matching perms): pairs
         estimating below ``jaccard_threshold - estimate_margin`` are
         dropped before any further shuffle. At the default margin
         (0.2 ~= 2.5 sigma for 64 perms at t=0.5) the chance a true >=t
         pair is pruned is <1%, on top of LSH banding's own probabilistic
         recall; precision stays EXACT (survivors are shingle-verified).
         Buckets with more than ``max_bucket`` members (degenerate: exact
         dups, empty docs, boilerplate) are truncated to the
         ``max_bucket`` smallest ids; the number of dropped members is
         carried in a ``bucket_dropped`` column, summed cheaply, logged.
      3. the candidate ID set (ids only — small) is broadcast to filter
         the docs scan that builds per-candidate shingle strings. No
         distinct-pairs shuffle: the verification stage dedupes pairs
         that surfaced from several bands.
      4. verification is a distributed co-location join: pair-membership
         rows union candidate shingle rows, a partition-grouped stage on
         hash(doc id) merge-attaches each doc's shingles to its pairs,
         then a partition-grouped stage on hash(pair) computes exact
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
    est_floor = jaccard_threshold - estimate_margin

    def _empty():
        return ray.data.from_arrow(
            pa.table({"doc_a": pa.array([], id_type),
                      "doc_b": pa.array([], id_type),
                      "jaccard": pa.array([], pa.float64())})
        )

    # P-way partition grouping: all per-group stages below group by a
    # BOUNDED partition key (hash % N_PARTS) and process MANY logical
    # groups vectorized inside each partition, because Ray's
    # groupby().map_groups pays ~1-2ms of pandas set-up PER GROUP —
    # measured 3.3s -> 0.45s for the bucket-pair stage at sf0.1 (80k rows,
    # ~50k tiny LSH buckets). Partition count is fixed, so at 1000x the
    # data each partition simply carries more buckets (vectorized numpy
    # inside), not more per-group overhead.
    N_PARTS = 64

    def sig_batch(batch: pa.Table) -> pa.Table:
        out = {"key": [], id_col: [], "sig": []}
        ids = batch[id_col].to_pylist()
        texts = batch[text_col].to_pylist()
        for did, text in zip(ids, texts):
            toks = text.split()
            sig = minhash_signature(
                shingle_hashes_vec(token_hashes(toks), shingle_k), a, b_
            )
            sig_bytes = sig.tobytes()
            for band in range(bands):
                chunk = sig[band * rows_per_band : (band + 1) * rows_per_band]
                bh = stable_hash64_bytes(chunk.tobytes())
                # band folded into the bucket key (collisions across bands
                # merely union two buckets: extra candidates, still
                # exactly verified)
                key = (bh ^ (band * 0x9E3779B97F4A7C15)) & 0x7FFFFFFFFFFFFFFF
                out["key"].append(key)
                out[id_col].append(did)
                out["sig"].append(sig_bytes)
        t = pa.table(
            {
                "key": pa.array(out["key"], pa.int64()),
                id_col: pa.array(out[id_col], id_type),
                "sig": pa.array(out["sig"], pa.binary()),
            }
        )
        return t.append_column(
            "part", pc.cast(pc.bit_wise_and(t["key"], N_PARTS - 1), pa.int32())
        )

    buckets = docs.map_batches(sig_batch, batch_format="pyarrow")

    def pairs_part(g: pd.DataFrame) -> pd.DataFrame:
        """All LSH buckets of one partition: bucket boundaries via np.unique
        over the sorted key column, pair generation + estimated-Jaccard
        pruning vectorized per bucket."""
        g = g.sort_values(["key", id_col], kind="stable")
        keys = g["key"].to_numpy()
        ids_all = g[id_col].to_numpy()
        sig_blob = np.frombuffer(b"".join(g["sig"]), dtype=np.uint64).reshape(
            len(g), num_perm
        )
        _, starts, counts = np.unique(keys, return_index=True, return_counts=True)
        oa, ob = [], []
        dropped = 0
        for s0, c in zip(starts, counts):
            if c < 2:
                continue
            dropped += max(0, int(c) - max_bucket)
            ids = ids_all[s0 : s0 + c][:max_bucket]
            sigs = sig_blob[s0 : s0 + c][:max_bucket]
            iu, ju = np.triu_indices(len(ids), k=1)
            est = (sigs[iu] == sigs[ju]).mean(axis=1)  # estimated Jaccard
            keep = est >= est_floor
            oa.extend(ids[iu[keep]])
            ob.extend(ids[ju[keep]])
        df = pd.DataFrame(
            {"doc_a": np.array(oa, dtype=ids_all.dtype),
             "doc_b": np.array(ob, dtype=ids_all.dtype)}
        )
        df["bucket_dropped"] = 0
        if dropped:
            if len(df):
                df.iloc[0, df.columns.get_loc("bucket_dropped")] = dropped
            else:
                df = pd.DataFrame(
                    {"doc_a": [ids_all[0]], "doc_b": [ids_all[0]],
                     "bucket_dropped": [dropped]}
                )
        return df

    # Candidate pairs: ids only — materialized in the OBJECT STORE (not the
    # driver) because multiple consumers follow (drop-count, id set, join).
    cand = (
        buckets.groupby("part")
        .map_groups(pairs_part, batch_format="pandas")
        .materialize()
    )
    dropped_total = cand.sum("bucket_dropped") or 0
    if dropped_total:
        logger.warning(
            "minhash_lsh_pairs: %d bucket members dropped by max_bucket=%d "
            "(degenerate LSH buckets; raise max_bucket or pre-collapse exact "
            "dups to cover them)", dropped_total, max_bucket,
        )
        cand = cand.filter(expr="doc_a != doc_b")  # drop marker-only rows

    distinct = cand  # pair dedup happens in the verification groupby
    if distinct.count() == 0:
        return _empty()

    # distinct_values, NOT Dataset.unique(): `distinct` is map_groups output
    # whose empty hash partitions crash Ray 2.49's Unique aggregate
    cand_ids = distinct_values(
        distinct.map_batches(
            lambda b: pa.table(
                {"id": pa.concat_arrays(
                    [b["doc_a"].combine_chunks(), b["doc_b"].combine_chunks()]
                )}
            ),
            batch_format="pyarrow",
        ),
        "id",
    )
    id_set = pa.array(cand_ids, id_type)
    id_ref = ray.put(id_set)

    def _part_of(arr: np.ndarray) -> np.ndarray:
        # pd.util.hash_array is deterministic across processes (fixed-key
        # siphash) and handles int and object/string ids alike — but rejects
        # numpy unicode ('<U') arrays, which np.asarray(list[str]) produces
        if arr.dtype.kind == "U":
            arr = arr.astype(object)
        return (pd.util.hash_array(arr, categorize=False) % N_PARTS).astype(
            np.int32
        )

    # Shingle strings for candidate docs only ('\x1f'-joined so the shuffle
    # carries a flat string, not a list<> column). Candidate-scale; object
    # store, never the driver. Row layout shared with membership rows:
    # (jk, p_a, p_b, sh, is_sh, part=hash(jk)%N_PARTS).
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
        part = _part_of(np.asarray(rows["jk"]))
        return pa.table({"jk": jk, "p_a": jk, "p_b": jk,
                         "sh": pa.array(rows["sh"], pa.string()),
                         "is_sh": pa.array([1] * n, pa.int8()),
                         "part": pa.array(part, pa.int32())})

    sh_rows = docs.map_batches(
        shingles_batch, batch_format="pyarrow", batch_size=verify_batch_size
    )

    def member_rows(b: pa.Table) -> pa.Table:
        da, db = b["doc_a"].combine_chunks(), b["doc_b"].combine_chunks()
        n = b.num_rows
        jk = pa.concat_arrays([da, db])
        part = _part_of(jk.to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "jk": jk,
                "p_a": pa.concat_arrays([da, da]),
                "p_b": pa.concat_arrays([db, db]),
                "sh": pa.array([""] * (2 * n), pa.string()),
                "is_sh": pa.array([0] * (2 * n), pa.int8()),
                "part": pa.array(part, pa.int32()),
            }
        )

    members = distinct.map_batches(member_rows, batch_format="pyarrow")

    # Co-locate each candidate doc's shingles with its pair memberships,
    # then co-locate the two sides of each pair — both shuffles move only
    # candidate-scale rows, and both group by the BOUNDED partition key
    # (many docs/pairs per partition, vectorized pandas merges inside).
    def attach_part(g: pd.DataFrame) -> pd.DataFrame:
        shr = g[g["is_sh"] == 1][["jk", "sh"]].drop_duplicates("jk")
        mem = g[g["is_sh"] == 0]
        out = mem.merge(shr, left_on="jk", right_on="jk", how="inner",
                        suffixes=("", "_sh"))
        out = pd.DataFrame(
            {"doc_a": out["p_a"].values, "doc_b": out["p_b"].values,
             "jk": out["jk"].values, "sh": out["sh_sh"].values
             if "sh_sh" in out else out["sh"].values}
        )
        out["part2"] = (
            (pd.util.hash_array(out["doc_a"].to_numpy(), categorize=False)
             ^ (pd.util.hash_array(out["doc_b"].to_numpy(), categorize=False)
                * np.uint64(0x9E3779B1)))
            % N_PARTS
        ).astype(np.int32)
        return out

    attached = members.union(sh_rows).groupby("part").map_groups(
        attach_part, batch_format="pandas"
    )

    def verify_part(g: pd.DataFrame) -> pd.DataFrame:
        """All pairs of one partition. A pair may arrive with multiplicity
        > 1 (surfaced from several LSH bands — this stage IS the pair
        dedup); each side's shingle string is identical across copies."""
        g = g.drop_duplicates(["doc_a", "doc_b", "jk"])
        a_side = g[g["jk"] == g["doc_a"]][["doc_a", "doc_b", "sh"]]
        b_side = g[g["jk"] == g["doc_b"]][["doc_a", "doc_b", "sh"]]
        m = a_side.merge(b_side, on=["doc_a", "doc_b"], suffixes=("_a", "_b"))
        out = {"doc_a": [], "doc_b": [], "jaccard": []}
        for da, db, sa, sb in zip(m["doc_a"], m["doc_b"], m["sh_a"], m["sh_b"]):
            jac = jaccard(set(sa.split("\x1f")), set(sb.split("\x1f")))
            if jac >= jaccard_threshold:
                out["doc_a"].append(da)
                out["doc_b"].append(db)
                out["jaccard"].append(round_half_away(jac, 6))
        return pd.DataFrame(
            {"doc_a": pd.Series(out["doc_a"], dtype=g["doc_a"].dtype),
             "doc_b": pd.Series(out["doc_b"], dtype=g["doc_b"].dtype),
             "jaccard": pd.Series(out["jaccard"], dtype="float64")}
        )

    return attached.groupby("part2").map_groups(
        verify_part, batch_format="pandas"
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
    # bounded partition key — see minhash_lsh_pairs N_PARTS note (per-group
    # map_groups overhead; many buckets are processed vectorized per part)
    N_PARTS = 64

    def sig_batch(b: pa.Table) -> pa.Table:
        out = {"key": [], id_col: [], "sig": []}
        for did, text in zip(b[id_col].to_pylist(), b[text_col].to_pylist()):
            s = simhash64(text.lower().split())
            s_signed = int(np.int64(np.uint64(s)))
            for band in range(bands):
                bits = (s >> (band * 16)) & 0xFFFF
                out["key"].append((band << 16) | bits)
                out[id_col].append(did)
                out["sig"].append(s_signed)
        t = pa.table(
            {
                "key": pa.array(out["key"], pa.int64()),
                id_col: pa.array(out[id_col], id_type),
                "sig": pa.array(out["sig"], pa.int64()),
            }
        )
        return t.append_column(
            "part",
            pa.array(
                (pd.util.hash_array(t["key"].to_numpy()) % N_PARTS).astype(
                    np.int32
                )
            ),
        )

    buckets = docs.map_batches(sig_batch, batch_format="pyarrow")

    def pairs_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["key", id_col], kind="stable")
        keys = g["key"].to_numpy()
        ids_all = g[id_col].to_numpy()
        sigs_all = g["sig"].to_numpy().astype(np.uint64)
        _, starts, counts = np.unique(keys, return_index=True, return_counts=True)
        oa, ob, oh = [], [], []
        for s0, c in zip(starts, counts):
            if c < 2:
                continue
            ids = ids_all[s0 : s0 + c][:max_bucket]
            sigs = sigs_all[s0 : s0 + c][:max_bucket]
            iu, ju = np.triu_indices(len(ids), k=1)
            x = sigs[iu] ^ sigs[ju]
            # vectorized popcount (bit_count needs numpy>=2; this is 1.x-safe)
            h = np.zeros(len(x), dtype=np.int64)
            while x.any():
                h += (x & 1).astype(np.int64)
                x >>= np.uint64(1)
            keep = h <= radius
            oa.extend(ids[iu[keep]])
            ob.extend(ids[ju[keep]])
            oh.extend(h[keep])
        return pd.DataFrame(
            {"doc_a": np.array(oa, dtype=ids_all.dtype),
             "doc_b": np.array(ob, dtype=ids_all.dtype),
             "hamming": np.array(oh, dtype=np.int64)}
        )

    pairs = buckets.groupby("part").map_groups(pairs_part, batch_format="pandas")

    # same pair can surface from up to `bands` buckets -> distinct, again
    # partition-grouped (drop_duplicates inside each pair-hash partition)
    def pair_part(b: pa.Table) -> pa.Table:
        pa_h = pd.util.hash_array(
            b["doc_a"].to_numpy(zero_copy_only=False), categorize=False
        )
        pb_h = pd.util.hash_array(
            b["doc_b"].to_numpy(zero_copy_only=False), categorize=False
        )
        part2 = ((pa_h ^ (pb_h * np.uint64(0x9E3779B1))) % N_PARTS).astype(
            np.int32
        )
        return b.append_column("part2", pa.array(part2))

    return (
        pairs.map_batches(pair_part, batch_format="pyarrow")
        .groupby("part2")
        .map_groups(
            lambda g: g.drop_duplicates(["doc_a", "doc_b"]).drop(
                columns=["part2"]
            ),
            batch_format="pandas",
        )
    )


def _blocked_gram_pairs(
    docs,
    id_col: str,
    text_col: str,
    block_prefix: int,
    score_name: str,
    score_fn,
    threshold: float,
    n_parts: int = 64,
):
    """Shared engine for the exact-char-3-gram pair measures (Jaccard,
    containment): pairs form only within identical ``block_prefix`` text
    blocks; blocks are PARTITION-GROUPED (hash(blk) % n_parts, one pandas
    call per partition, block runs via sorted key boundaries) — the same
    fix as minhash/simhash for the measured 1-2 ms/group map_groups tax,
    which dominated when one group per block ran (4.5k blocks at sf0.1 =
    ~17 s of pure scheduling; partition-grouped ≈ 2 s). Inside a block the
    O(k²) set loop is fine: blocking keeps k tiny (≤10 at bench scale)."""

    def block_batch(b: pa.Table) -> pa.Table:
        blk = pc.utf8_slice_codeunits(b[text_col], 0, block_prefix)
        part = (
            pd.util.hash_array(
                blk.to_numpy(zero_copy_only=False).astype(object),
                categorize=False,
            )
            % n_parts
        ).astype(np.int32)
        return pa.table(
            {
                "blk": blk,
                id_col: b[id_col],
                "text": b[text_col],
                "part": pa.array(part),
            }
        )

    blocked = docs.map_batches(block_batch, batch_format="pyarrow")

    def pairs_part(g: pd.DataFrame) -> pd.DataFrame:
        id_dtype = g[id_col].dtype if len(g) else np.int64

        def empty() -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "doc_a": pd.Series([], dtype=id_dtype),
                    "doc_b": pd.Series([], dtype=id_dtype),
                    score_name: pd.Series([], dtype="float64"),
                }
            )

        if len(g) < 2:
            return empty()
        g = g.sort_values(["blk", id_col], kind="stable")
        blks = g["blk"].to_numpy()
        ids = g[id_col].to_numpy()
        texts = g["text"].tolist()
        first = np.ones(len(g), dtype=bool)
        first[1:] = blks[1:] != blks[:-1]
        bounds = np.append(np.flatnonzero(first), len(g))
        oa, ob, ov = [], [], []
        for s0, s1 in zip(bounds[:-1], bounds[1:]):
            k = s1 - s0
            if k < 2:
                continue
            grams = [
                {t[i : i + 3] for i in range(len(t) - 2)} if len(t) >= 3 else {t}
                for t in texts[s0:s1]
            ]
            for i in range(k):
                for j in range(i + 1, k):
                    v = score_fn(grams[i], grams[j])
                    if v >= threshold:
                        oa.append(ids[s0 + i])
                        ob.append(ids[s0 + j])
                        ov.append(round_half_away(v, 6))
        if not oa:
            return empty()
        return pd.DataFrame(
            {
                "doc_a": np.array(oa, dtype=ids.dtype),
                "doc_b": np.array(ob, dtype=ids.dtype),
                score_name: np.array(ov, dtype=np.float64),
            }
        )

    return blocked.groupby("part").map_groups(pairs_part, batch_format="pandas")


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
    return _blocked_gram_pairs(
        docs, id_col, text_col, block_prefix, "jaccard", jaccard, threshold
    )


def containment_pairs(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    block_prefix: int = 16,
):
    """Asymmetric near-dup: char-3-gram CONTAINMENT ``|A∩B| / min(|A|,|B|)``
    over pairs sharing a text prefix block — catches a document SUBSUMED in
    a longer one (quoted articles, boilerplate wrappers) that symmetric
    Jaccard dilutes below threshold (Broder's containment measure, the
    companion to resemblance). Same oracle-anchor role and blocking shape
    as ``ngram_jaccard_pairs``; MinHash banding stays the scale path for
    candidate generation.

    Returns (doc_a, doc_b, containment) with doc_a < doc_b, rounded 6dp.
    """

    def containment(a: set, b: set) -> float:
        return len(a & b) / min(len(a), len(b))

    return _blocked_gram_pairs(
        docs, id_col, text_col, block_prefix, "containment",
        containment, threshold,
    )


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
    verify_broadcast_ids: int = 200_000,
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
    trade).

    Dataflow (partition-grouped end to end, same shape as
    minhash_lsh_pairs/simhash_dup_pairs — Ray's map_groups pays ~1-2ms of
    pandas setup PER group, so every stage groups by a BOUNDED hash
    partition and vectorizes many buckets/pairs inside):
      1. membership rows (bucket key, id) only — the float vector never
         enters the bands-x shuffle;
      2. candidate pairs per partition (np.unique bucket boundaries,
         ``max_bucket`` truncation to the smallest ids);
      3. pair distinct per pair-hash partition (a pair surfaces from up to
         ``bands`` buckets);
      4. exact-cosine verify, COST-BASED (same broadcast-vs-shuffle policy
         as the relational ``_attach_or_join`` and the curate drop path):
         the distinct candidate-id set is already a bounded driver-side
         list; when it is <= ``verify_broadcast_ids`` the candidate
         vectors are pulled once, ``ray.put`` as a (sorted ids, matrix)
         lookup, and every candidate pair is verified in ONE map_batches
         via searchsorted + einsum — no union, no extra shuffles. Above
         the threshold the verify falls back to a union +
         partition-groupby co-location join: candidate vectors (flat
         binary cells) attach to pair memberships by id hash, the two
         pair sides co-locate by pair hash, cosine per partition.
    Returns (id_a, id_b, cosine) with id_a < id_b, cosine rounded 6dp.
    """
    import ray

    assert n_planes % bands == 0
    bits_per_band = n_planes // bands
    id_type = embeddings.schema().base_schema.field(id_col).type
    # bounded partition key everywhere — see minhash_lsh_pairs N_PARTS note
    # (Ray pays ~1-2ms pandas setup PER map_groups group; partition-grouping
    # processes many buckets/pairs vectorized inside each of 64 partitions)
    N_PARTS = 64
    # per-task plane cache; regeneration is deterministic (seeded by dim)
    planes_by_dim: dict[int, np.ndarray] = {}

    def _planes(d: int) -> np.ndarray:
        p = planes_by_dim.get(d)
        if p is None:
            p = np.random.default_rng(seed).standard_normal((d, n_planes))
            planes_by_dim[d] = p
        return p

    # 1. membership rows only — (bucket key, id); the float vector does NOT
    #    enter the bands-x shuffle (it is re-read once in the verify stage)
    def sig_batch(b: pa.Table) -> pa.Table:
        vecs = list_column_to_matrix(b[vec_col])
        bits = (vecs @ _planes(vecs.shape[1])) >= 0  # (n, n_planes)
        n = len(vecs)
        keys = np.empty(n * bands, dtype=np.int64)
        for band in range(bands):
            chunk = bits[:, band * bits_per_band : (band + 1) * bits_per_band]
            packed = chunk @ (1 << np.arange(bits_per_band))
            keys[band * n : (band + 1) * n] = (band << bits_per_band) | packed
        ids = pa.concat_arrays(
            [b[id_col].combine_chunks().cast(id_type)] * bands
        )
        part = (pd.util.hash_array(keys) % N_PARTS).astype(np.int32)
        return pa.table(
            {"key": pa.array(keys), id_col: ids, "part": pa.array(part)}
        )

    buckets = embeddings.map_batches(sig_batch, batch_format="pyarrow")

    # 2. candidate pairs, all buckets of a partition vectorized (np.unique
    #    boundaries over the sorted key column, triu pair indices per bucket,
    #    max_bucket truncation to the smallest ids — mirrors simhash)
    def pairs_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["key", id_col], kind="stable")
        keys = g["key"].to_numpy()
        ids_all = g[id_col].to_numpy()
        _, starts, counts = np.unique(keys, return_index=True, return_counts=True)
        oa, ob = [], []
        for s0, c in zip(starts, counts):
            if c < 2:
                continue
            ids = ids_all[s0 : s0 + c][:max_bucket]
            iu, ju = np.triu_indices(len(ids), k=1)
            oa.extend(ids[iu])
            ob.extend(ids[ju])
        df = pd.DataFrame(
            {"id_a": np.array(oa, dtype=ids_all.dtype),
             "id_b": np.array(ob, dtype=ids_all.dtype)}
        )
        df["part2"] = (
            (pd.util.hash_array(df["id_a"].to_numpy(), categorize=False)
             ^ (pd.util.hash_array(df["id_b"].to_numpy(), categorize=False)
                * np.uint64(0x9E3779B1)))
            % N_PARTS
        ).astype(np.int32)
        return df

    # 3. pair distinct, partition-grouped (a pair surfaces from <= bands
    #    buckets; drop_duplicates inside each pair-hash partition)
    cand = (
        buckets.groupby("part")
        .map_groups(pairs_part, batch_format="pandas")
        .groupby("part2")
        .map_groups(
            lambda g: g.drop_duplicates(["id_a", "id_b"]).drop(columns=["part2"]),
            batch_format="pandas",
        )
        .materialize()
    )
    if cand.count() == 0:
        return ray.data.from_arrow(
            pa.table({"id_a": pa.array([], id_type),
                      "id_b": pa.array([], id_type),
                      "cosine": pa.array([], pa.float64())})
        )

    # 4. exact-cosine verification as a distributed co-location join
    #    (union + partition-groupby, same shape as minhash_lsh_pairs):
    #    vector rows for CANDIDATE ids only (vec flattened to one binary
    #    cell so the shuffle carries a flat column) union pair-membership
    #    rows; attach each id's vector, then co-locate the two pair sides.
    cand_ids = distinct_values(
        cand.map_batches(
            lambda b: pa.table(
                {"id": pa.concat_arrays(
                    [b["id_a"].combine_chunks(), b["id_b"].combine_chunks()]
                )}
            ),
            batch_format="pyarrow",
        ),
        "id",
    )
    id_ref = ray.put(pa.array(cand_ids, id_type))

    if len(cand_ids) <= verify_broadcast_ids:
        # broadcast verify: pull just the candidate vectors (bounded by
        # the id-set size), sort by id, ship ONE lookup object
        ids_parts: list[np.ndarray] = []
        mats: list[np.ndarray] = []
        filt = embeddings.map_batches(
            lambda b: b.select([id_col, vec_col]).filter(
                pc.is_in(b[id_col], value_set=ray.get(id_ref))
            ),
            batch_format="pyarrow",
        )
        for t in filt.iter_batches(batch_format="pyarrow", batch_size=None):
            if t.num_rows:
                ids_parts.append(t[id_col].to_numpy(zero_copy_only=False))
                mats.append(list_column_to_matrix(t[vec_col]))
        ids_np = np.concatenate(ids_parts)
        mat = np.vstack(mats)
        order = np.argsort(ids_np, kind="stable")
        lut = ray.put((ids_np[order], mat[order]))

        def verify_batch(b: pa.Table) -> pa.Table:
            ids_s, m = ray.get(lut)
            a = b["id_a"].to_numpy(zero_copy_only=False)
            c = b["id_b"].to_numpy(zero_copy_only=False)
            va, vb2 = m[np.searchsorted(ids_s, a)], m[np.searchsorted(ids_s, c)]
            na = np.linalg.norm(va, axis=1)
            nb = np.linalg.norm(vb2, axis=1)
            na[na == 0] = 1.0
            nb[nb == 0] = 1.0
            cos = np.einsum("ij,ij->i", va, vb2) / (na * nb)
            keep = cos >= threshold
            return pa.table(
                {"id_a": pa.array(a[keep], id_type),
                 "id_b": pa.array(c[keep], id_type),
                 "cosine": pa.array(round_half_away(cos[keep], 6),
                                    pa.float64())}
            )

        return cand.map_batches(verify_batch, batch_format="pyarrow")

    def _part_of(arr: np.ndarray) -> np.ndarray:
        if arr.dtype.kind == "U":  # hash_array rejects numpy unicode
            arr = arr.astype(object)
        return (pd.util.hash_array(arr, categorize=False) % N_PARTS).astype(
            np.int32
        )

    def vec_rows(b: pa.Table) -> pa.Table:
        t = b.filter(pc.is_in(b[id_col], value_set=ray.get(id_ref)))
        ids = t[id_col].combine_chunks().cast(id_type)
        vb = [row.tobytes() for row in list_column_to_matrix(t[vec_col])]
        n = t.num_rows
        return pa.table(
            {"jk": ids, "p_a": ids, "p_b": ids,
             "vb": pa.array(vb, pa.binary()),
             "is_v": pa.array([1] * n, pa.int8()),
             "part": pa.array(_part_of(ids.to_numpy(zero_copy_only=False)),
                              pa.int32())}
        )

    def member_rows(b: pa.Table) -> pa.Table:
        da, db = b["id_a"].combine_chunks(), b["id_b"].combine_chunks()
        n = b.num_rows
        jk = pa.concat_arrays([da, db])
        return pa.table(
            {"jk": jk,
             "p_a": pa.concat_arrays([da, da]),
             "p_b": pa.concat_arrays([db, db]),
             "vb": pa.array([b""] * (2 * n), pa.binary()),
             "is_v": pa.array([0] * (2 * n), pa.int8()),
             "part": pa.array(_part_of(jk.to_numpy(zero_copy_only=False)),
                              pa.int32())}
        )

    def attach_part(g: pd.DataFrame) -> pd.DataFrame:
        vr = g[g["is_v"] == 1][["jk", "vb"]].drop_duplicates("jk")
        mem = g[g["is_v"] == 0]
        out = mem.merge(vr, on="jk", how="inner", suffixes=("", "_v"))
        out = pd.DataFrame(
            {"id_a": out["p_a"].values, "id_b": out["p_b"].values,
             "jk": out["jk"].values,
             "vb": out["vb_v"].values if "vb_v" in out else out["vb"].values}
        )
        out["part2"] = (
            (pd.util.hash_array(out["id_a"].to_numpy(), categorize=False)
             ^ (pd.util.hash_array(out["id_b"].to_numpy(), categorize=False)
                * np.uint64(0x9E3779B1)))
            % N_PARTS
        ).astype(np.int32)
        return out

    attached = (
        cand.map_batches(member_rows, batch_format="pyarrow")
        .union(embeddings.map_batches(vec_rows, batch_format="pyarrow"))
        .groupby("part")
        .map_groups(attach_part, batch_format="pandas")
    )

    def verify_part(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"id_a": pd.Series([], dtype=g["id_a"].dtype),
             "id_b": pd.Series([], dtype=g["id_b"].dtype),
             "cosine": pd.Series([], dtype="float64")}
        )
        a_side = g[g["jk"] == g["id_a"]][["id_a", "id_b", "vb"]]
        b_side = g[g["jk"] == g["id_b"]][["id_a", "id_b", "vb"]]
        m = a_side.merge(b_side, on=["id_a", "id_b"], suffixes=("_a", "_b"))
        if not len(m):
            return empty
        va = np.stack([np.frombuffer(x, dtype=np.float64) for x in m["vb_a"]])
        vc = np.stack([np.frombuffer(x, dtype=np.float64) for x in m["vb_b"]])
        na = np.linalg.norm(va, axis=1)
        nb = np.linalg.norm(vc, axis=1)
        na[na == 0] = 1.0
        nb[nb == 0] = 1.0
        cos = np.einsum("ij,ij->i", va, vc) / (na * nb)
        keep = cos >= threshold
        if not keep.any():
            return empty
        return pd.DataFrame(
            {"id_a": m["id_a"].to_numpy()[keep],
             "id_b": m["id_b"].to_numpy()[keep],
             "cosine": round_half_away(cos[keep], 6)}
        )

    return attached.groupby("part2").map_groups(
        verify_part, batch_format="pandas"
    )


# -- duplicate clustering (connected components over blocking edges) ---------

def dup_clusters(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_prefix: int = 16,
    max_iters: int = 64,
    broadcast_threshold: int | None = None,
    inmemory_threshold: int = 2_000_000,
):
    """(doc_id, cluster_id): connected components over the union of two
    blocking relations — docs sharing a text prefix-16 OR a text suffix-16
    are edges; cluster_id = the component's minimum doc_id. This is the
    step between near-dup PAIR generation and canonical-doc selection that
    every dedup pipeline needs (pairs alone over-drop when A~B and B~C but
    the pipeline keeps one doc per PAIR instead of one per COMPONENT).

    Distributed shape (no driver-side graph):
      1. edges: per blocking key, a star to the block minimum (same
         components as all-pairs within the block, |block| - 1 edges
         instead of |block|^2 / 2); prefix and suffix keyspaces are tagged
         apart so they never cross-join.
      2. labels: (id, label=id), then iterated min-label propagation —
         each round pushes labels across edges in both directions via the
         engine's cost-based attach (broadcast when the node table is
         small, hash-shuffle join at scale), takes a groupby-min, then
         path-halves (label <- label(label)) so chains converge in
         O(log diameter) rounds instead of O(diameter). Everything that
         shuffles is node-scale (id, label) rows — never text.
      3. convergence: labels only ever decrease, so an unchanged
         sum(label) aggregate is an exact fixpoint test (one scalar per
         round; at extreme scale swap for a count-of-changed check to
         dodge int64 summation limits).

    The large-star/small-star alternation (Kiveris et al., "Connected
    Components in MapReduce and Beyond") is the equivalent edge-rewriting
    formulation; this label-table form reuses the engine's join selection.
    SQL-expressible (recursive CTE), so the driver oracle-checks it.
    """
    import ray.data as rd
    from ray.data.aggregate import Min

    from .relational import _attach_or_join, _join_partitions

    N_PARTS = 64  # bounded partition key — see the minhash N_PARTS note

    def block_rows(b: pa.Table) -> pa.Table:
        pre = pc.binary_join_element_wise(
            "P:", pc.utf8_slice_codeunits(b[text_col], 0, block_prefix), ""
        )
        suf = pc.binary_join_element_wise(
            "S:", pc.utf8_slice_codeunits(b[text_col], -block_prefix), ""
        )
        ids = b[id_col]
        blk = pa.concat_arrays([c.combine_chunks() for c in (pre, suf)])
        part = (
            pd.util.hash_array(
                blk.to_numpy(zero_copy_only=False).astype(object),
                categorize=False,
            )
            % N_PARTS
        ).astype(np.int32)
        return pa.table(
            {
                "blk": blk,
                id_col: pa.chunked_array([pa.concat_arrays(
                    [ids.combine_chunks()] * 2
                )]),
                "part": pa.array(part),
            }
        )

    def star_edges_part(g: pd.DataFrame) -> pd.DataFrame:
        """All blocking keys of one partition: block runs via sorted key
        boundaries, star edges (everyone -> block min) fully vectorized —
        one pandas call per PARTITION, not per block (the measured
        1-2 ms/group map_groups tax; same fix as minhash's bucket stage)."""
        if not len(g):
            return pd.DataFrame({"u": pd.Series([], dtype="int64"),
                                 "v": pd.Series([], dtype="int64")})
        g = g.sort_values(["blk", id_col], kind="stable")
        blk = g["blk"].to_numpy()
        ids = g[id_col].to_numpy()
        first = np.ones(len(g), dtype=bool)
        first[1:] = blk[1:] != blk[:-1]
        seg = np.cumsum(first) - 1
        mins = ids[first]  # sorted within block -> first = min id
        keep = ~first
        return pd.DataFrame({"u": ids[keep], "v": mins[seg[keep]]})

    edges = (
        docs.map_batches(block_rows, batch_format="pyarrow")
        .groupby("part")
        .map_groups(star_edges_part, batch_format="pandas")
        .materialize()
    )

    labels = docs.map_batches(
        lambda b: pa.table({"id": b[id_col], "label": b[id_col]}),
        batch_format="pyarrow",
    ).materialize()
    n_nodes = labels.count()

    # Cost-based escape (the pagerank lesson, measured there at 235x): each
    # label-propagation round pays seconds of fixed exchange setup; at or
    # below the threshold the (id, label) + (u, v) tables are BOUNDED pulls
    # and an exact union-find computes the same min-label components in
    # microseconds. broadcast_threshold is the shuffle-path test knob —
    # when a caller forces it, the distributed loop must actually run.
    if (
        broadcast_threshold is None
        and n_nodes + edges.count() <= inmemory_threshold
    ):
        import ray.data as _rd

        id_arrow_type = labels.schema().base_schema.field("id").type
        ids_np = labels.to_pandas()["id"].to_numpy()
        nodes = np.sort(ids_np)
        pos = {v: i for i, v in enumerate(nodes)}
        parent = np.arange(len(nodes), dtype=np.int64)

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = int(parent[x])
            return x

        edf = edges.to_pandas()
        for u, v in zip(edf["u"].map(pos), edf["v"].map(pos)):
            ru, rv = find(int(u)), find(int(v))
            if ru != rv:
                # larger ordinal under smaller -> root == component min id
                parent[max(ru, rv)] = min(ru, rv)
        roots = np.array([find(i) for i in range(len(nodes))], np.int64)
        return _rd.from_arrow(
            pa.table(
                {
                    id_col: pa.array(nodes, id_arrow_type),
                    "cluster_id": pa.array(nodes[roots], id_arrow_type),
                }
            )
        )

    npart = _join_partitions(n_joins=3)
    prev_sum = None
    for _ in range(max_iters):
        # push label(v) to u and label(u) to v, then min per node
        to_u = _attach_or_join(
            edges, "v", labels.map_batches(
                lambda b: b.rename_columns(["vid", "label"]),
                batch_format="pyarrow"),
            "vid", ["label"], npart, broadcast_threshold=broadcast_threshold,
            dim_count_hint=n_nodes,
        ).map_batches(
            lambda b: pa.table({"id": b["u"], "label": b["label"]}),
            batch_format="pyarrow",
        )
        to_v = _attach_or_join(
            edges, "u", labels.map_batches(
                lambda b: b.rename_columns(["uid", "label"]),
                batch_format="pyarrow"),
            "uid", ["label"], npart, broadcast_threshold=broadcast_threshold,
            dim_count_hint=n_nodes,
        ).map_batches(
            lambda b: pa.table({"id": b["v"], "label": b["label"]}),
            batch_format="pyarrow",
        )
        # repartition bounds the label table's block count: union appends
        # to_u/to_v blocks to labels' every round and the sort-based groupby
        # preserves input block count, so without it blocks (and per-round
        # scheduling cost) grow linearly with iterations (measured: 66 s ->
        # 7 s at sf0.1). materialize: merged is consumed twice by the
        # halving attach (broadcast pull + fact side).
        merged = (
            labels.union(to_u, to_v)
            .repartition(npart)
            .groupby("id")
            .aggregate(Min("label", alias_name="label"))
            .materialize()
        )
        # path halving: label <- label(label)
        halved = _attach_or_join(
            merged.map_batches(
                lambda b: b.rename_columns(["id", "parent"]),
                batch_format="pyarrow"),
            "parent",
            merged.map_batches(
                lambda b: b.rename_columns(["pid", "label"]),
                batch_format="pyarrow"),
            "pid", ["label"], npart, broadcast_threshold=broadcast_threshold,
            dim_count_hint=n_nodes,
        ).map_batches(
            lambda b: pa.table({"id": b["id"], "label": b["label"]}),
            batch_format="pyarrow",
        ).materialize()
        cur_sum = halved.sum("label")
        labels = halved
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels.map_batches(
        lambda b: pa.table({id_col: b["id"], "cluster_id": b["label"]}),
        batch_format="pyarrow",
    )


def dup_substring_counts(
    docs,
    gram_len: int = 32,
    anchor: str = " ",
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Exact-substring duplication detector: per doc, how many of its
    anchored ``gram_len``-char grams also occur in ANOTHER document.

    Gram selection is CONTENT-DEFINED (Manber's sif anchors): a gram starts
    at every occurrence of the ``anchor`` byte (default space). Because the
    selection depends only on the text itself, two documents sharing a
    substring select the SAME grams from it regardless of where the run
    sits in each doc — a stride/offset sample would only collide when the
    two alignments agree mod stride (~1/stride of the time). Guarantee: any
    shared run that contains an anchor byte >= gram_len chars before the
    run's end lights up in both docs; anchor-free runs (e.g. base64 blobs)
    escape the screen. This is the standard scalable stand-in for
    suffix-array substring dedup — a screen, not a proof.

    Dataflow:
      explode (doc_id, gram) rows — one zero-copy numpy pass over the Arrow
      string buffers per batch (np.where on the byte array finds anchors,
      a broadcasted gather extracts all grams at once; no per-row Python);
      in-batch distinct per doc (a doc is wholly inside its batch)
        -> partition-grouped by hash(gram): grams seen in >= 2 docs emit
           one row per (doc, gram) — the shuffle carries (gram, doc_id)
           pairs; at 100 TB you would shuffle a 64-bit gram hash instead of
           the 32-byte gram and accept the collision odds (kept exact here
           so the DuckDB oracle matches bit-for-bit)
        -> groupby(doc_id) sum of per-partition partials.

    Byte-level slicing equals DuckDB's char-level substr because the corpus
    is ASCII (verified in tests); non-ASCII corpora would need the grams
    cast to binary on both sides.

    Returns (doc_id, n_dup_grams), docs with >= 1 shared gram only."""
    from ray.data.aggregate import Sum

    N_PARTS = 64
    anchor_byte = anchor.encode("ascii")[0]
    empty = pa.schema(
        [(id_col, pa.int64()), ("gram", pa.large_string()), ("part", pa.int32())]
    )

    def grams(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return empty.empty_table()
        b = b.filter(pc.is_valid(b[text_col]))
        texts = b[text_col].combine_chunks() if isinstance(
            b[text_col], pa.ChunkedArray
        ) else b[text_col]
        arr = texts.cast(pa.large_binary())
        n = len(arr)
        if n == 0:
            return empty.empty_table()
        offsets = np.frombuffer(arr.buffers()[1], dtype=np.int64)[
            arr.offset : arr.offset + n + 1
        ]
        data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
        # anchor positions inside this batch's value buffer
        pos = np.where(data[offsets[0] : offsets[-1]] == anchor_byte)[0]
        pos += offsets[0]
        row = np.searchsorted(offsets, pos, side="right") - 1
        fits = pos + gram_len <= offsets[row + 1]
        pos, row = pos[fits], row[fits]
        if pos.size == 0:
            return empty.empty_table()
        mat = np.ascontiguousarray(data[pos[:, None] + np.arange(gram_len)])
        off = np.arange(0, (pos.size + 1) * gram_len, gram_len, dtype=np.int64)
        gram_arr = pa.Array.from_buffers(
            pa.large_string(),
            pos.size,
            [None, pa.py_buffer(off.tobytes()), pa.py_buffer(mat.tobytes())],
        )
        ids = b[id_col].to_numpy(zero_copy_only=False)[row]
        t = pa.table({id_col: pa.array(ids), "gram": gram_arr})
        t = t.group_by([id_col, "gram"]).aggregate([])
        part = (
            pd.util.hash_array(t["gram"].to_numpy(zero_copy_only=False),
                               categorize=False)
            % N_PARTS
        ).astype(np.int32)
        return t.append_column("part", pa.array(part))

    def dup_rows(g: pd.DataFrame) -> pd.DataFrame:
        # all grams of the partition in one pass: keep rows whose gram
        # occurs in >= 2 docs (rows are already (doc, gram)-distinct)
        counts = g.groupby("gram", sort=False)["gram"].transform("size")
        kept = g[counts >= 2]
        out = kept.groupby(id_col, sort=False).size().reset_index(name="n")
        return out[[id_col, "n"]]

    exploded = docs.map_batches(grams, batch_format="pyarrow")
    partials = exploded.groupby("part").map_groups(dup_rows, batch_format="pandas")
    summed = partials.groupby(id_col).aggregate(Sum("n", alias_name="n_dup_grams"))

    def finish(b: pa.Table) -> pa.Table:
        return pa.table(
            {id_col: b[id_col], "n_dup_grams": b["n_dup_grams"].cast(pa.int64())}
        )

    return summed.map_batches(finish, batch_format="pyarrow")


def snapshot_diff(
    old,
    new,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_parts: int = 64,
):
    """(doc_id, status) between two crawl snapshots: ``added`` (only in
    new), ``removed`` (only in old), ``changed`` (in both, content hash
    differs), ``unchanged`` — the re-crawl maintenance report that decides
    what re-enters the pipeline.

    Scale shape: each side maps to (id, md5, side) rows — text never
    shuffles; classification is a bounded-hash-partition groupby with the
    per-doc pivot vectorized inside each partition (ids appear at most
    twice). An id must appear at most once PER SIDE (crawl snapshots are
    keyed by URL/doc id)."""

    def hashed(side: int):
        def h(b: pa.Table) -> pa.Table:
            hs = [
                hashlib.md5(t.encode("utf-8")).hexdigest()
                for t in b[text_col].to_pylist()
            ]
            ids = b[id_col].to_numpy(zero_copy_only=False)
            if ids.dtype.kind == "U":
                ids = ids.astype(object)
            part = (
                pd.util.hash_array(ids, categorize=False) % n_parts
            ).astype(np.int32)
            return pa.table(
                {
                    id_col: b[id_col],
                    "h": pa.array(hs, pa.string()),
                    "side": pa.array(
                        np.full(b.num_rows, side, np.int8)
                    ),
                    "part": pa.array(part),
                }
            )

        return h

    both = old.map_batches(hashed(0), batch_format="pyarrow").union(
        new.map_batches(hashed(1), batch_format="pyarrow")
    )

    def classify(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                {
                    id_col: pd.Series([], dtype="int64"),
                    "status": pd.Series([], dtype=object),
                }
            )
        g = g.sort_values([id_col, "side"], kind="stable")
        ids = g[id_col].to_numpy()
        side = g["side"].to_numpy()
        h = g["h"].to_numpy()
        first = np.ones(len(g), dtype=bool)
        first[1:] = ids[1:] != ids[:-1]
        starts = np.nonzero(first)[0]
        counts = np.diff(np.append(starts, len(g)))
        status = np.empty(len(starts), dtype=object)
        one = counts == 1
        # singletons: side 0 -> removed, side 1 -> added
        status[one] = np.where(side[starts[one]] == 0, "removed", "added")
        two = ~one
        s2 = starts[two]
        status[two] = np.where(h[s2] == h[s2 + 1], "unchanged", "changed")
        return pd.DataFrame({id_col: ids[starts], "status": status})

    return both.groupby("part").map_groups(classify, batch_format="pandas")


# -- recrawl scheduling (snapshot diff -> fetch priorities) --------------------

# Change-rate heuristic constants, mirrored literally by the recrawl_schedule
# oracle SQL: pages observed changing get refetched next round, fresh pages
# get verified next round, stable pages back off (the doubling-interval
# idea collapsed to one observation), removed pages leave the frontier.
RECRAWL_PRIORITY = {"changed": 3, "added": 2, "unchanged": 1}
RECRAWL_INTERVAL = {"changed": 1, "added": 1, "unchanged": 4}


def recrawl_schedule(diff, authority=None, id_col: str = "doc_id"):
    """(doc_id, status, priority, revisit_after): turn a `snapshot_diff`
    report into the next crawl round's frontier-admission table — the step
    that closes the maintenance loop (crawl -> diff -> schedule -> crawl).
    ``removed`` pages are dropped (nothing to refetch); the rest rank by
    observed change (changed > added > unchanged) with a per-status
    revisit interval. Batch-local and shuffle-free: a closed-set
    `pc.index_in` gather per block.

    With ``authority`` (a (node, in_degree-or-rank) Dataset, e.g.
    `graph.in_degree` keyed by the same doc ids), an ``auth`` tiebreak
    column is attached via the cost-based broadcast/shuffle join and the
    ordering contract becomes (priority desc, auth desc) — high-authority
    pages refresh first within a change class; missing ids get auth 0."""
    statuses = pa.array(list(RECRAWL_PRIORITY.keys()), pa.string())
    prio = np.array(list(RECRAWL_PRIORITY.values()), dtype=np.int64)
    ival = np.array(list(RECRAWL_INTERVAL.values()), dtype=np.int64)

    def sched(b: pa.Table) -> pa.Table:
        idx = pc.index_in(b["status"], value_set=statuses)
        keep = pc.is_valid(idx)  # 'removed' is not in the map -> dropped
        kept = b.filter(keep)
        ix = (
            pc.index_in(kept["status"], value_set=statuses)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        return pa.table(
            {
                id_col: kept[id_col],
                "status": kept["status"],
                "priority": pa.array(prio[ix], pa.int64()),
                "revisit_after": pa.array(ival[ix], pa.int64()),
            }
        )

    out = diff.map_batches(sched, batch_format="pyarrow")
    if authority is None:
        return out

    import ray

    from .relational import BROADCAST_THRESHOLD, _join_partitions

    acols = [c for c in authority.schema().names if c != "node"]
    if len(acols) != 1:
        raise ValueError("authority must have exactly (node, <score>) columns")

    def rekey(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: b["node"],
                "auth": b[acols[0]].cast(pa.float64()),
            }
        )

    auth = authority.map_batches(rekey, batch_format="pyarrow").materialize()
    if auth.count() <= BROADCAST_THRESHOLD:
        pdf = auth.to_pandas()
        keys = pdf[id_col].to_numpy()
        order = np.argsort(keys, kind="stable")
        keys, vals = keys[order], pdf["auth"].to_numpy()[order]
        ref = ray.put((keys, vals))

        def attach(b: pa.Table) -> pa.Table:
            k, v = ray.get(ref)
            bk = b[id_col].to_numpy(zero_copy_only=False)
            idx = np.searchsorted(k, bk)
            idx_c = np.minimum(idx, max(len(k) - 1, 0))
            valid = (k[idx_c] == bk) if len(k) else np.zeros(len(bk), bool)
            a = np.where(valid, v[idx_c], 0.0)  # missing ids: auth 0
            return b.append_column("auth", pa.array(a, pa.float64()))

        return out.map_batches(attach, batch_format="pyarrow")

    joined = out.join(
        auth,
        join_type="left_outer",
        num_partitions=_join_partitions(1),
        on=(id_col,),
        right_on=(id_col,),
    )

    def fill0(b: pa.Table) -> pa.Table:
        i = b.schema.get_field_index("auth")
        return b.set_column(
            i, "auth", pc.coalesce(b["auth"], pa.scalar(0.0, pa.float64()))
        )

    return joined.map_batches(fill0, batch_format="pyarrow")


def dedup_keep_richest(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    drop_broadcast_ids: int = 2_000_000,
):
    """Exact dedup over NORMALIZED text (lowercase, collapse whitespace
    runs, trim — `text.normalize_text_table`'s definition), keeping the
    RICHEST original of each variant group: max raw char length, then min
    id. This is the canonical-selection policy for case/whitespace mirror
    variants, where keep-first would arbitrarily keep a stripped copy and
    drop the best-formatted one. (For EXACT duplicate groups the two
    policies coincide — members are identical — which is why this operator
    normalizes first.)

    Dataflow mirrors ``dedup_keep_first``: (md5(norm), id, n_chars) rows
    -> bounded hash-partition groupby -> per-partition vectorized
    keeper selection -> cost-based drop application (broadcast is_in at or
    below ``drop_broadcast_ids``, keeper-table hash semi-join above; both
    paths identical, the join path is forced in a test)."""
    import ray

    N_PARTS = 64

    def hash_rows(b: pa.Table) -> pa.Table:
        norm = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(
                pc.utf8_lower(pc.fill_null(b[text_col], "")), r"\s+", " "
            )
        )
        hs = [
            hashlib.md5(t.encode("utf-8")).hexdigest()
            for t in norm.to_pylist()
        ]
        part = (
            pd.util.hash_array(np.asarray(hs, dtype=object)) % N_PARTS
        ).astype(np.int32)
        return pa.table(
            {
                "h": pa.array(hs),
                id_col: b[id_col],
                "nch": pc.utf8_length(
                    pc.fill_null(b[text_col], "")
                ).cast(pa.int64()),
                "part": pa.array(part),
            }
        )

    def flags_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["h", "nch", id_col], ascending=[True, False, True],
            kind="stable",
        )
        h = g["h"].to_numpy()
        keep = np.ones(len(g), dtype=bool)
        keep[1:] = h[1:] != h[:-1]  # first (richest, then min-id) per run
        out = g[[id_col]].copy()
        out["keep"] = keep
        return out

    flags = (
        docs.map_batches(hash_rows, batch_format="pyarrow")
        .groupby("part")
        .map_groups(flags_part, batch_format="pandas")
        .materialize()
    )
    drops = flags.map_batches(
        lambda b: b.filter(pc.invert(b["keep"])).select([id_col]),
        batch_format="pyarrow",
    ).materialize()
    if drops.count() <= drop_broadcast_ids:
        id_type = docs.schema().base_schema.field(id_col).type
        chunks = [
            t[id_col].combine_chunks().cast(id_type)
            for t in drops.iter_batches(batch_format="pyarrow", batch_size=None)
            if t.num_rows
        ]
        drop_ref = ray.put(
            pa.concat_arrays(chunks) if chunks else pa.array([], id_type)
        )
        return docs.map_batches(
            lambda b: b.filter(
                pc.invert(pc.is_in(b[id_col], value_set=ray.get(drop_ref)))
            ),
            batch_format="pyarrow",
        )
    keepers = flags.map_batches(
        lambda b: b.filter(b["keep"]).select([id_col]).rename_columns(
            ["__keep_id"]
        ),
        batch_format="pyarrow",
    )
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    npart = max(2, cpus // 2)
    return docs.join(
        keepers.repartition(npart), join_type="inner", num_partitions=npart,
        on=(id_col,), right_on=("__keep_id",),
    )


def cross_source_dups(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    max_group: int = 256,
):
    """(source_a, source_b, n_pairs): the duplicate-LEAKAGE report — for
    every unordered source pair, how many exact-duplicate document pairs
    span the two sources (source_a < source_b lexicographically; same-
    source duplicate pairs report with source_a == source_b). The table a
    data-governance review reads to find mirrored feeds before training.

    Dataflow: (md5, id, source) rows -> bounded hash-partition groupby ->
    per-partition vectorized within-group pair expansion (groups truncated
    at ``max_group`` smallest ids — all-pairs inside one content hash is
    quadratic only in the duplicate multiplicity) -> per-partition
    (source_a, source_b, n) partials -> bounded driver merge (the result
    is capped by n_sources^2, a bounded dimension — and the fixed output
    schema survives the zero-duplicates case, where an empty distributed
    groupby would lose its schema). Text never shuffles; ids only travel
    inside their hash partition."""
    N_PARTS = 64

    def hash_rows(b: pa.Table) -> pa.Table:
        hs = [
            hashlib.md5(t.encode("utf-8")).hexdigest()
            for t in b[text_col].to_pylist()
        ]
        part = (
            pd.util.hash_array(np.asarray(hs, dtype=object)) % N_PARTS
        ).astype(np.int32)
        return pa.table(
            {
                "h": pa.array(hs),
                id_col: b[id_col],
                source_col: b[source_col],
                "part": pa.array(part),
            }
        )

    def pairs_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["h", id_col], kind="stable")
        h = g["h"].to_numpy()
        src = g[source_col].to_numpy()
        starts = np.flatnonzero(np.r_[True, h[1:] != h[:-1]])
        ends = np.r_[starts[1:], len(h)]
        pa_, pb_ = [], []
        for s, e in zip(starts, ends):
            m = min(e - s, max_group)
            if m < 2:
                continue
            grp = np.sort(src[s : s + m])
            ia, ib = np.triu_indices(m, k=1)
            pa_.append(grp[ia])
            pb_.append(grp[ib])
        if not pa_:
            return pd.DataFrame(
                {"source_a": pd.Series([], dtype=object),
                 "source_b": pd.Series([], dtype=object),
                 "n": pd.Series([], dtype=np.int64)}
            )
        a = np.concatenate(pa_)
        b_ = np.concatenate(pb_)
        out = pd.DataFrame({"source_a": a, "source_b": b_})
        out = out.groupby(["source_a", "source_b"], as_index=False).size()
        out.columns = ["source_a", "source_b", "n"]
        out["n"] = out["n"].astype(np.int64)
        return out

    partials = (
        docs.map_batches(hash_rows, batch_format="pyarrow")
        .groupby("part")
        .map_groups(pairs_part, batch_format="pandas")
        .take_all()  # n_sources^2-bounded
    )
    agg: dict[tuple[str, str], int] = {}
    for r in partials:
        k = (r["source_a"], r["source_b"])
        agg[k] = agg.get(k, 0) + int(r["n"])
    keys = sorted(agg)
    return pa.table(
        {
            "source_a": pa.array([k[0] for k in keys], pa.string()),
            "source_b": pa.array([k[1] for k in keys], pa.string()),
            "n_pairs": pa.array([agg[k] for k in keys], pa.int64()),
        }
    )


def _minhash_membership(
    docs,
    id_col: str,
    text_col: str,
    num_perm: int,
    bands: int,
    shingle_k: int,
    seed: int,
    n_parts: int = 64,
):
    """(key, id, sig, part) LSH membership rows — the signature space
    shared by ``minhash_lsh_pairs``, ``write_minhash_store`` and
    ``dedup_against_store`` (same seed => same signatures => stores
    written at crawl N join cleanly with documents from crawl N+1).
    Mirrors ``minhash_lsh_pairs``' inline sig_batch exactly (pinned by
    test_minhash_store_incremental_dedup's cross-operator check)."""
    import ray

    a, b_ = minhash_params(num_perm, seed)
    rows_per_band = num_perm // bands
    id_type = docs.schema().base_schema.field(id_col).type

    def sig_batch(batch: pa.Table) -> pa.Table:
        out = {"key": [], id_col: [], "sig": []}
        ids = batch[id_col].to_pylist()
        texts = batch[text_col].to_pylist()
        for did, text in zip(ids, texts):
            toks = text.split()
            sig = minhash_signature(
                shingle_hashes_vec(token_hashes(toks), shingle_k), a, b_
            )
            sig_bytes = sig.tobytes()
            for band in range(bands):
                chunk = sig[band * rows_per_band : (band + 1) * rows_per_band]
                bh = stable_hash64_bytes(chunk.tobytes())
                key = (bh ^ (band * 0x9E3779B97F4A7C15)) & 0x7FFFFFFFFFFFFFFF
                out["key"].append(key)
                out[id_col].append(did)
                out["sig"].append(sig_bytes)
        t = pa.table(
            {
                "key": pa.array(out["key"], pa.int64()),
                id_col: pa.array(out[id_col], id_type),
                "sig": pa.array(out["sig"], pa.binary()),
            }
        )
        return t.append_column(
            "part",
            pc.cast(pc.bit_wise_and(t["key"], n_parts - 1), pa.int32()),
        )

    return docs.map_batches(sig_batch, batch_format="pyarrow")


def write_minhash_store(
    docs,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    seed: int = 7,
):
    """Persist the corpus's MinHash-LSH membership rows (key, id, sig) as
    parquet partitioned by the bounded bucket-hash partition — the
    signature STORE an incremental pipeline dedups each new crawl round
    against without ever re-reading old text (signatures are ~8*num_perm
    bytes/doc vs the full document). Resumable layout: one directory per
    partition."""
    mem = _minhash_membership(
        docs, id_col, text_col, num_perm, bands, shingle_k, seed
    )
    mem.write_parquet(out_dir, partition_cols=["part"])
    return out_dir


def dedup_against_store(
    new_docs,
    store_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    seed: int = 7,
    est_threshold: float = 0.8,
    max_bucket: int = 256,
):
    """(new_id, existing_id, est_jaccard): incremental near-dup dedup —
    which NEW documents near-duplicate something already in the persisted
    signature store. The store side ships only (key, id, sig) rows; old
    text is never read. Candidates come from shared LSH buckets, scored by
    the signature-estimated Jaccard (mean matching perms, the same
    estimator minhash_lsh_pairs prunes with), thresholded at
    ``est_threshold``; pairs seen via several bands dedup partition-
    grouped. Parameters must match the store's (same signature space)."""
    import ray

    N_PARTS = 64
    rows_per_band = num_perm // bands
    id_type = new_docs.schema().base_schema.field(id_col).type

    new_mem = _minhash_membership(
        new_docs, id_col, text_col, num_perm, bands, shingle_k, seed,
        n_parts=N_PARTS,
    ).map_batches(
        lambda b: b.append_column("is_new", pa.array([1] * b.num_rows, pa.int8())),
        batch_format="pyarrow",
    )
    old_mem = ray.data.read_parquet(store_dir).map_batches(
        lambda b: pa.table(
            {
                "key": b["key"],
                id_col: b[id_col].cast(id_type),
                "sig": b["sig"],
                "part": pc.cast(b["part"], pa.int32()),
                "is_new": pa.array([0] * b.num_rows, pa.int8()),
            }
        ),
        batch_format="pyarrow",
    )

    def pairs_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["key", "is_new", id_col], kind="stable")
        keys = g["key"].to_numpy()
        ids_all = g[id_col].to_numpy()
        is_new = g["is_new"].to_numpy()
        sig_blob = np.frombuffer(
            b"".join(g["sig"]), dtype=np.uint64
        ).reshape(len(g), num_perm)
        starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
        ends = np.r_[starts[1:], len(keys)]
        na, nb, ests = [], [], []
        n_dropped = 0
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            # cap EACH side independently (smallest ids kept): a hot store
            # bucket must never eject the new probe rows — the probe side
            # is the whole point of this operator
            idx = np.arange(s, e)
            old_idx = idx[is_new[s:e] == 0]
            new_idx = idx[is_new[s:e] == 1]
            n_dropped += max(0, len(old_idx) - max_bucket) + max(
                0, len(new_idx) - max_bucket
            )
            old_idx = old_idx[:max_bucket]
            new_idx = new_idx[:max_bucket]
            if not len(old_idx) or not len(new_idx):
                continue
            est = (
                sig_blob[new_idx][:, None, :] == sig_blob[old_idx][None, :, :]
            ).mean(axis=2)
            ii, jj = np.nonzero(est >= est_threshold)
            na.append(ids_all[new_idx][ii])
            nb.append(ids_all[old_idx][jj])
            ests.append(est[ii, jj])
        if n_dropped:
            import logging

            logging.getLogger(__name__).warning(
                "dedup_against_store: %d bucket members past max_bucket=%d "
                "not compared (raise max_bucket for hot templates)",
                n_dropped, max_bucket,
            )
        if not na:
            return pd.DataFrame(
                {
                    "new_id": pd.Series([], dtype=np.asarray(ids_all).dtype),
                    "existing_id": pd.Series([], dtype=np.asarray(ids_all).dtype),
                    "est_jaccard": pd.Series([], dtype=np.float64),
                }
            )
        out = pd.DataFrame(
            {
                "new_id": np.concatenate(na),
                "existing_id": np.concatenate(nb),
                "est_jaccard": np.round(np.concatenate(ests), 6),
            }
        )
        return out

    pairs = (
        new_mem.union(old_mem)
        .groupby("part")
        .map_groups(pairs_part, batch_format="pandas")
    )

    # distinct pairs (several bands can surface the same pair):
    # partition-group on a pair hash, np-dedup inside
    def pair_part(b: pa.Table) -> pa.Table:
        h = (
            pd.util.hash_array(
                b["new_id"].to_numpy(zero_copy_only=False).astype("int64", copy=False)
                if pa.types.is_integer(b.schema.field("new_id").type)
                else b["new_id"].to_numpy(zero_copy_only=False).astype(object)
            )
            ^ pd.util.hash_array(
                b["existing_id"].to_numpy(zero_copy_only=False).astype("int64", copy=False)
                if pa.types.is_integer(b.schema.field("existing_id").type)
                else b["existing_id"].to_numpy(zero_copy_only=False).astype(object)
            )
        ) % N_PARTS
        return b.append_column("ppart", pa.array(h.astype(np.int32)))

    def dedup_part(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["new_id", "existing_id"])[
            ["new_id", "existing_id", "est_jaccard"]
        ]

    return (
        pairs.map_batches(pair_part, batch_format="pyarrow")
        .groupby("ppart")
        .map_groups(dedup_part, batch_format="pandas")
    )


def paragraph_dedup(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Cross-document paragraph dedup (the Lee et al. 2021 boilerplate
    screen): every paragraph that appears more than once in the corpus
    survives only at its globally FIRST occurrence (min (doc_id, idx));
    each doc is reassembled from its kept paragraphs. Docs whose every
    paragraph is a repeat disappear.

    Output: (doc_id, clean_text, n_kept, n_dropped).

    Scale shape: docs explode to (doc_id, idx, para) rows block-locally
    (vectorized split/flatten/renumber); the winner table shuffles ONLY
    (md5, packed-position) pairs — paragraph text never enters the
    exchange — and comes back via the cost-based broadcast/shuffle join;
    reassembly is partition-grouped by doc-id hash (bounded partition
    count, many docs per pandas call). Position packing assumes
    doc_id < 2^43 and < 2^20 paragraphs per doc (asserted)."""
    from .relational import _attach_or_join, _join_partitions

    IDX_BITS = 20
    N_PARTS = 64

    def explode(b: pa.Table) -> pa.Table:
        n = b.num_rows
        segs = pc.split_pattern_regex(pc.fill_null(b[text_col], ""), r"\n\n+")
        flat = pc.list_flatten(segs)
        parents = pc.list_parent_indices(segs).to_numpy(zero_copy_only=False)
        mask = pc.greater(pc.utf8_length(flat), 0)
        mask_np = mask.to_numpy(zero_copy_only=False)
        kept = pc.filter(flat, mask)
        parents = parents[mask_np]
        counts = np.bincount(parents, minlength=n)
        starts = np.cumsum(counts) - counts
        idx = (np.arange(len(parents)) - starts[parents]).astype(np.int64)
        ids = (
            b[id_col].combine_chunks().take(pa.array(parents, pa.int64()))
        )
        ids_np = ids.to_numpy(zero_copy_only=False).astype(np.int64)
        assert idx.max(initial=0) < (1 << IDX_BITS), "too many paragraphs"
        assert ids_np.max(initial=0) < (1 << (63 - IDX_BITS)), "doc_id too big"
        hs = [
            hashlib.md5(t.encode("utf-8")).hexdigest()
            for t in kept.to_pylist()
        ]
        return pa.table(
            {
                id_col: ids,
                "idx": pa.array(idx, pa.int64()),
                "para": kept.cast(pa.string()),
                "h": pa.array(hs, pa.string()),
                "pack": pa.array((ids_np << IDX_BITS) | idx, pa.int64()),
            }
        )

    exploded = docs.map_batches(explode, batch_format="pyarrow").materialize()

    from ray.data.aggregate import Min

    winners = (
        exploded.select_columns(["h", "pack"])
        .groupby("h")
        .aggregate(Min("pack", alias_name="min_pack"))
    )
    tagged = _attach_or_join(
        exploded, "h", winners, "h", ["min_pack"], npart=_join_partitions()
    )
    kept_rows = tagged.filter(
        expr="pack == min_pack"
    ).select_columns([id_col, "idx", "para"])

    def reassemble_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([id_col, "idx"], kind="stable")
        agg = g.groupby(id_col, sort=False).agg(
            clean_text=("para", lambda s: "\n\n".join(s)),
            n_kept=("para", "size"),
        )
        return agg.reset_index()

    def add_part(b: pa.Table) -> pa.Table:
        part = (
            pd.util.hash_array(
                b[id_col].to_numpy(zero_copy_only=False), categorize=False
            )
            % N_PARTS
        ).astype(np.int32)
        return b.append_column("part", pa.array(part))

    reassembled = (
        kept_rows.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(
            lambda g: reassemble_part(g.drop(columns=["part"])),
            batch_format="pandas",
        )
    )

    # original paragraph counts (block-local; docs never span blocks)
    def orig_counts(b: pa.Table) -> pa.Table:
        segs = pc.split_pattern_regex(pc.fill_null(b[text_col], ""), r"\n\n+")
        flat = pc.list_flatten(segs)
        parents = pc.list_parent_indices(segs).to_numpy(zero_copy_only=False)
        mask_np = pc.greater(pc.utf8_length(flat), 0).to_numpy(
            zero_copy_only=False
        )
        n_paras = np.bincount(parents[mask_np], minlength=b.num_rows)
        return pa.table(
            {
                id_col: b[id_col],
                "n_paras": pa.array(n_paras.astype(np.int64), pa.int64()),
            }
        )

    totals = docs.map_batches(orig_counts, batch_format="pyarrow")
    # reassembled is map_groups output -> empty partitions lack a schema;
    # launder through a repartition before any Acero join (the
    # _attach_or_join top_customers quirk)
    out = _attach_or_join(
        reassembled, id_col, totals, id_col, ["n_paras"],
        npart=_join_partitions(), launder_fact=True,
    )

    def finalize(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: b[id_col],
                "clean_text": b["clean_text"],
                "n_kept": b["n_kept"],
                "n_dropped": pc.subtract(b["n_paras"], b["n_kept"]),
            }
        )

    return out.map_batches(finalize, batch_format="pyarrow")


# -- leakage-safe train/val/test split ----------------------------------------

def leakage_safe_split(
    docs,
    train_pct: int = 90,
    val_pct: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """(doc_id, split): train/val/test assignment that can NEVER leak an
    exact duplicate across splits — every copy of a text gets the split of
    the group REPRESENTATIVE (min doc_id per md5 group), so eval contamination
    from duplicated pages is impossible by construction. This is the
    dup-cluster-consistent upgrade of `text.train_val_test_split` (whose
    per-id hash puts two copies of the same page in train AND test with
    probability 2·p·(1-p)).

    Dataflow (scale shape = `dedup_keep_first`): only (md5, id) rows enter
    the bounded hash-partition groupby; each partition resolves the
    representative per md5 run vectorized (sort + run-boundary repeat) and
    emits (id, rep); the split is then a batch-local LCG mix of REP —
    mirrored literally by the SQL oracle, exact in int64 for ids < ~3.4e9
    (swap splitmix64 beyond, same dataflow). Text never shuffles."""
    N_PARTS = 64
    t_hi, v_hi = int(train_pct), int(train_pct) + int(val_pct)

    def hash_rows(b: pa.Table) -> pa.Table:
        hs = [
            hashlib.md5(t.encode("utf-8")).hexdigest()
            for t in b[text_col].to_pylist()
        ]
        part = (
            pd.util.hash_array(np.asarray(hs, dtype=object)) % N_PARTS
        ).astype(np.int32)
        return pa.table(
            {"h": pa.array(hs), id_col: b[id_col], "part": pa.array(part)}
        )

    def reps_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["h", id_col], kind="stable")
        h = g["h"].to_numpy()
        first = np.ones(len(g), dtype=bool)
        first[1:] = h[1:] != h[:-1]
        idx = np.nonzero(first)[0]
        runs = np.diff(np.append(idx, len(g)))
        ids = g[id_col].to_numpy()
        return pd.DataFrame({id_col: ids, "rep": np.repeat(ids[idx], runs)})

    def assign(b: pa.Table) -> pa.Table:
        rep = b["rep"].to_numpy().astype(np.int64)
        r = ((rep * 2654435761 + 1013904223) % (2**32)) % 100
        split = np.where(r < t_hi, "train", np.where(r < v_hi, "val", "test"))
        return pa.table(
            {
                id_col: pc.cast(b[id_col], pa.int64()),
                "split": pa.array(split, pa.string()),
            }
        )

    return (
        docs.map_batches(hash_rows, batch_format="pyarrow")
        .groupby("part")
        .map_groups(reps_part, batch_format="pandas")
        .map_batches(assign, batch_format="pyarrow")
    )


def fuzzy_name_pairs(
    ds,
    id_col: str = "p_partkey",
    name_col: str = "p_name",
    max_bucket: int = 256,
):
    """(id_a, id_b, ed): every pair of rows whose names are within plain
    Levenshtein distance 1 — the SIMILARITY JOIN completing the join
    family (inner/_attach, bloom semi, anti, as-of, range, full outer,
    now fuzzy); the entity-resolution screen for catalog variants
    ('blue rod' vs 'blue rods').

    SymSpell-blocked (Garbe 2012; the same deletion-neighborhood algebra
    as ``rank.spell_suggest``, lifted from lookup to self-join): every
    name emits its (len+1)-element deletion key set VECTORIZED (one
    pandas slice-concat per deletion POSITION, never per-name Python);
    candidate pairs can only share a key, so one hash(key) co-location
    bounds the all-pairs expansion to within-bucket; shared deletions of
    equal-length strings can be ed 2 ('ab'~'ba'), so an exact two-pointer
    ed<=1 verify fires on each bounded candidate before it survives; a
    second (id_a, id_b) co-location dedups pairs found under multiple
    keys. Only (key-hash, id, name) rows ever shuffle.

    Degenerate buckets (many IDENTICAL names share their full key set)
    cap at ``max_bucket`` members — ids beyond the cap in one bucket pair
    only with the kept head (exact-equal names are better handled by
    ``exact_dedup``; the cap is the same policy as minhash_lsh_pairs)."""
    from .rank import _ed_le1

    N_PARTS = 64

    def keys(b: pa.Table) -> pa.Table:
        names = pd.Series(
            b[name_col].to_numpy(zero_copy_only=False), dtype=object
        )
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ln = names.str.len().to_numpy()
        out_k, out_i, out_n = [names.to_numpy()], [ids], [names.to_numpy()]
        for d in range(int(ln.max()) if len(ln) else 0):
            has = ln > d
            if not has.any():
                break
            sub = names[has]
            out_k.append((sub.str.slice(0, d) + sub.str.slice(d + 1)).to_numpy())
            out_i.append(ids[has])
            out_n.append(sub.to_numpy())
        k = np.concatenate(out_k)
        # vectorized deterministic 64-bit key hash; hash collisions merely
        # merge buckets — the exact verify kills any false pair they add
        kh = pd.util.hash_array(k.astype(object), categorize=False).astype(
            np.int64
        )
        return pa.table(
            {
                "kh": pa.array(kh.astype(np.int64)),
                "id": pa.array(np.concatenate(out_i)),
                "name": pa.array(np.concatenate(out_n), pa.string()),
                "part": pa.array(
                    (kh % N_PARTS).astype(np.int32)
                ),
            }
        )

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["kh", "id"], kind="stable")
        rows_a, rows_b, names_a, names_b = [], [], [], []
        for _, sub in g.groupby("kh", sort=False):
            sub = sub.drop_duplicates("id")
            if len(sub) < 2:
                continue
            sub = sub.head(max_bucket)
            ids = sub["id"].to_numpy()
            nms = sub["name"].to_numpy()
            iu, ju = np.triu_indices(len(ids), k=1)
            rows_a.append(ids[iu]); rows_b.append(ids[ju])
            names_a.append(nms[iu]); names_b.append(nms[ju])
        if not rows_a:
            return pd.DataFrame(
                {"id_a": pd.Series([], dtype=np.int64),
                 "id_b": pd.Series([], dtype=np.int64),
                 "ed": pd.Series([], dtype=np.int64)}
            )
        a = np.concatenate(rows_a); bb = np.concatenate(rows_b)
        na = np.concatenate(names_a); nb = np.concatenate(names_b)
        # exact verify on the bounded candidates (kills ed-2 key-sharers)
        keep = np.fromiter(
            (_ed_le1(x, y) for x, y in zip(na, nb)), bool, len(na)
        )
        ed = np.fromiter(
            (0 if x == y else 1 for x, y in zip(na[keep], nb[keep])),
            np.int64,
            int(keep.sum()),
        )
        return pd.DataFrame({"id_a": a[keep], "id_b": bb[keep], "ed": ed})

    cands = (
        ds.map_batches(keys, batch_format="pyarrow")
        .groupby("part")
        .map_groups(bucket_pairs, batch_format="pandas")
    )

    # pairs found under multiple shared keys: distinct, co-located by pair
    def pair_part(b: pa.Table) -> pa.Table:
        a = b["id_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        bb = b["id_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        return b.append_column(
            "part2",
            pa.array(((a * 1_000_003 + bb) % N_PARTS).astype(np.int32)),
        )

    def pair_dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["id_a", "id_b"])[["id_a", "id_b", "ed"]]

    return (
        cands.map_batches(pair_part, batch_format="pyarrow")
        .groupby("part2")
        .map_groups(pair_dedup, batch_format="pandas")
    )


def corpus_diff(
    old_ds,
    new_ds,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """(doc_id, status in {added, removed, changed, unchanged}): snapshot
    diff between two corpus versions — the change-data-capture primitive
    behind incremental recrawl/reindex decisions ("which docs does the
    next index build actually need to touch?").

    Scale shape: each side collapses to (id, md5-prefix int64, side-flag)
    per block — text never shuffles; the tagged union co-locates by
    hash(id) % 64 and one vectorized pandas pivot per partition assigns
    the status. Only fixed-width rows move."""
    N_PARTS = 64

    def digest(side: int):
        def f(b: pa.Table) -> pa.Table:
            ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            sig = np.fromiter(
                (
                    int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
                    for t in pc.fill_null(b[text_col], "").to_pylist()
                ),
                np.int64,
                len(ids),
            )
            return pa.table(
                {
                    "id": pa.array(ids),
                    "sig": pa.array(sig),
                    "side": pa.array(np.full(len(ids), side, np.int8)),
                    "part": pa.array(
                        (ids * 2654435761 % N_PARTS).astype(np.int32)
                    ),
                }
            )

        return f

    both = old_ds.map_batches(digest(0), batch_format="pyarrow").union(
        new_ds.map_batches(digest(1), batch_format="pyarrow")
    )

    def classify(g: pd.DataFrame) -> pd.DataFrame:
        p = g.pivot_table(
            index="id", columns="side", values="sig", aggfunc="first"
        )
        old_sig = p[0] if 0 in p.columns else pd.Series(index=p.index, dtype="float64")
        new_sig = p[1] if 1 in p.columns else pd.Series(index=p.index, dtype="float64")
        status = np.where(
            old_sig.isna(),
            "added",
            np.where(
                new_sig.isna(),
                "removed",
                np.where(old_sig == new_sig, "unchanged", "changed"),
            ),
        )
        return pd.DataFrame(
            {"doc_id": p.index.to_numpy().astype(np.int64), "status": status}
        )

    return both.groupby("part").map_groups(classify, batch_format="pandas")


def _ngram_mark_rows(
    docs,
    k: int,
    min_docs: int,
    id_col: str,
    text_col: str,
    carry_text: bool,
):
    """Shared mark topology for the exact-substring family: block-local
    vectorized shingle build, ONE hash-partitioned gram exchange, distinct-
    doc count per partition. ``carry_text=True`` ships the gram TEXT
    through the exchange and returns (doc_id, pos, gram) — the public
    `repeated_ngram_spans` contract. ``carry_text=False`` ships only the
    64-bit gram hash (pd.util.hash_array — the same cross-process-stable
    siphash the persisted index buckets rely on): 8 B/row instead of
    ~k words/row through the shuffle, the 100-TB shape for cut-only
    pipelines that never need the gram text back. A 64-bit collision can
    merge two distinct grams and over-mark (~n_grams^2 / 2^65 expected
    false marks — vanishing at any real corpus size; equality on the test
    corpora is pytest-asserted against the text path)."""
    N_PARTS = 64

    def explode_grams(b: pa.Table) -> pa.Table:
        txt = pc.utf8_lower(pc.fill_null(b[text_col], ""))
        toks = pc.split_pattern_regex(txt, r"\s+")
        la = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        counts = np.asarray(
            pc.fill_null(pc.list_value_length(la), 0).to_numpy(
                zero_copy_only=False
            ),
            dtype=np.int64,
        )
        flat = np.asarray(
            la.flatten().to_numpy(zero_copy_only=False), dtype=object
        )
        out_schema = pa.schema(
            [
                ("gram", pa.string()) if carry_text else ("gram_h", pa.int64()),
                (id_col, pa.int64()),
                ("pos", pa.int64()),
                ("part", pa.int32()),
            ]
        )
        # drop empty tokens (split of "" yields [""]); renumber per doc
        parent = np.repeat(np.arange(len(counts)), counts)
        keep = flat != ""
        flat, parent = flat[keep], parent[keep]
        if len(flat) < k:
            return out_schema.empty_table()
        n_docs_b = len(counts)
        kept_counts = np.bincount(parent, minlength=n_docs_b)
        starts = np.cumsum(kept_counts) - kept_counts
        pos = np.arange(len(flat)) - starts[parent]
        # k-gram at j spans [j, j+k-1]; valid iff same doc at both ends
        n = len(flat) - k + 1
        valid = parent[:n] == parent[k - 1 :]
        gram = flat[:n].astype(str)
        for off in range(1, k):
            gram = np.char.add(
                np.char.add(gram, " "), flat[off : off + n].astype(str)
            )
        gram = gram[valid]
        ids = (
            b[id_col]
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)[parent[:n][valid]]
        )
        gpos = pos[:n][valid]
        h = pd.util.hash_array(gram.astype(object), categorize=False)
        part = (h % N_PARTS).astype(np.int32)
        gram_col = (
            pa.array(gram, pa.string())
            if carry_text
            else pa.array(h.view(np.int64))
        )
        return pa.table(
            {
                "gram" if carry_text else "gram_h": gram_col,
                id_col: pa.array(ids),
                "pos": pa.array(gpos.astype(np.int64)),
                "part": pa.array(part),
            }
        )

    key = "gram" if carry_text else "gram_h"

    def survivors(g: pd.DataFrame) -> pd.DataFrame:
        nd = g.groupby(key)[id_col].nunique()
        dup = nd[nd >= min_docs].index
        out = g[g[key].isin(dup)]
        cols = [id_col, "pos"] + (["gram"] if carry_text else [])
        return out[cols]

    return (
        docs.map_batches(explode_grams, batch_format="pyarrow")
        .groupby("part")
        .map_groups(survivors, batch_format="pandas")
    )


def repeated_ngram_spans(
    docs,
    k: int = 8,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """(doc_id, pos, gram): every occurrence of a k-token shingle that
    appears in >= ``min_docs`` DISTINCT documents — exact-substring
    duplicate MARKING, the span-level pass train-data curation runs after
    document-level dedup (boilerplate, licenses, templated passages repeat
    across pages that are NOT near-dups as whole documents). Downstream
    either cuts the marked spans or drops docs whose marked fraction is
    high. Tokens are lowercased whitespace runs (the phrase_search /
    positional_postings stream), pos is the shingle's 0-based first-token
    position.

    Shape: see `_ngram_mark_rows` — this public contract includes the gram
    text, so the exchange carries it; `cut_repeated_spans` uses the
    hash-carried variant (8 B/row through the shuffle) because cutting
    only needs (doc_id, pos)."""
    return _ngram_mark_rows(docs, k, min_docs, id_col, text_col, carry_text=True)


def cut_repeated_spans(
    docs,
    k: int = 8,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_marks: bool = True,
):
    """(doc_id, clean_text, n_tokens_cut): apply the exact-substring dedup —
    remove every token covered by ANY duplicated k-shingle window (the
    union of [pos, pos+k-1] over ``repeated_ngram_spans`` marks) and
    rebuild the text from the surviving tokens. Output text is lowercased
    and single-space-joined (the marking pass's token stream is the
    canonical form; byte-level reconstruction would need original offsets,
    which the whitespace tokenizer deliberately normalizes away). A doc
    whose every token is covered emits clean_text='' — curation drops or
    re-gates those rows.

    Topology: the (doc_id, pos) marks from the gram exchange re-shuffle
    ONCE by hash(doc_id) to co-locate with the doc's exploded tokens; the
    cover mask is a vectorized +1/-1 diff + prefix-sum per partition (no
    per-mark loop), and text reassembly is one pandas groupby-join per
    partition (the per-group-tax rule). Only (doc_id, pos) marks and
    (doc_id, tpos, term) tokens enter the exchange — never whole texts.
    The mark pass itself runs hash-carried by default (``hash_marks``):
    the gram exchange ships the 64-bit gram hash, 8 B/row, instead of the
    ~k-word gram text the public marking contract carries —
    `_ngram_mark_rows`. ``hash_marks=False`` routes through the
    text-carrying pass instead (equality of the two is pytest-asserted)."""
    N_PARTS = 64

    spans = _ngram_mark_rows(
        docs, k, min_docs, id_col, text_col, carry_text=not hash_marks
    )

    def mark_rows(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        part = (
            pd.util.hash_array(ids, categorize=False) % N_PARTS
        ).astype(np.int32)
        return pa.table(
            {
                id_col: pa.array(ids),
                "tpos": b["pos"],
                "term": pa.nulls(len(b), pa.string()),
                "kind": pa.array(np.ones(len(b), np.int8)),
                "part": pa.array(part),
            }
        )

    def token_rows(b: pa.Table) -> pa.Table:
        txt = pc.utf8_lower(pc.fill_null(b[text_col], ""))
        toks = pc.split_pattern_regex(txt, r"\s+")
        la = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        counts = np.asarray(
            pc.fill_null(pc.list_value_length(la), 0).to_numpy(
                zero_copy_only=False
            ),
            dtype=np.int64,
        )
        flat = np.asarray(
            la.flatten().to_numpy(zero_copy_only=False), dtype=object
        )
        parent = np.repeat(np.arange(len(counts)), counts)
        keep = flat != ""
        flat, parent = flat[keep], parent[keep]
        kept_counts = np.bincount(parent, minlength=len(counts))
        starts = np.cumsum(kept_counts) - kept_counts
        pos = np.arange(len(flat)) - starts[parent]
        ids = (
            b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)[parent]
        )
        part = (
            pd.util.hash_array(ids, categorize=False) % N_PARTS
        ).astype(np.int32)
        return pa.table(
            {
                id_col: pa.array(ids),
                "tpos": pa.array(pos.astype(np.int64)),
                "term": pa.array(flat, pa.string()),
                "kind": pa.array(np.zeros(len(flat), np.int8)),
                "part": pa.array(part),
            }
        )

    both = docs.map_batches(token_rows, batch_format="pyarrow").union(
        spans.map_batches(mark_rows, batch_format="pyarrow")
    )

    def rebuild(g: pd.DataFrame) -> pd.DataFrame:
        toks = g[g["kind"] == 0]
        marks = g[g["kind"] == 1]
        # per-doc token counts -> contiguous global offsets so the cover
        # diff/prefix-sum runs vectorized across every doc in the partition
        n_per_doc = toks.groupby(id_col)["tpos"].max().add(1)
        docs_idx = {d: i for i, d in enumerate(n_per_doc.index)}
        bases = np.concatenate(([0], np.cumsum(n_per_doc.to_numpy())))
        total = int(bases[-1])
        diff = np.zeros(total + 1, np.int64)
        if len(marks):
            m_doc = marks[id_col].map(docs_idx).to_numpy()
            valid = ~pd.isna(m_doc)
            m_doc = m_doc[valid].astype(np.int64)
            m_pos = marks["tpos"].to_numpy()[valid]
            starts_g = bases[m_doc] + m_pos
            ends_g = np.minimum(m_pos + k, n_per_doc.to_numpy()[m_doc]) + bases[m_doc]
            np.add.at(diff, starts_g, 1)
            np.add.at(diff, ends_g, -1)
        covered = np.cumsum(diff[:-1]) > 0
        t_doc = toks[id_col].map(docs_idx).to_numpy().astype(np.int64)
        t_glob = bases[t_doc] + toks["tpos"].to_numpy()
        keep_mask = ~covered[t_glob]
        kept = toks[keep_mask].sort_values([id_col, "tpos"], kind="stable")
        joined = kept.groupby(id_col)["term"].agg(" ".join)
        out = pd.DataFrame({id_col: n_per_doc.index.to_numpy()})
        out["clean_text"] = out[id_col].map(joined).fillna("")
        n_cut = (
            toks[~keep_mask].groupby(id_col)["tpos"].count()
            if (~keep_mask).any()
            else pd.Series(dtype="int64")
        )
        out["n_tokens_cut"] = (
            out[id_col].map(n_cut).fillna(0).astype(np.int64)
        )
        return out

    return both.groupby("part").map_groups(rebuild, batch_format="pandas")
