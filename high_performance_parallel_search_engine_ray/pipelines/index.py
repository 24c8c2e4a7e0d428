"""Inverted-index pipelines over a (doc_id, text) Dataset.

Reference: `build_index`/`add_token` accumulate a global mutable array
(`Serial Version/src/index.c:15-114`); the MPI version hash-partitions terms
with explicit sends (`MPI Version/src/dist_index.c:71-145`). Here the same
result is a Ray Data dataflow:

  tokenize (vectorized Arrow kernels, per batch)
    -> (term, doc_id, tf, dl) rows        [no shuffle: a document's text
                                           lives in one row, so per-batch
                                           counts are globally correct]
    -> groupby('term')                    [THE shuffle, = dist_index's
                                           hash-partition by term owner]
    -> postings lists / df

Tokenization semantics = the serial tokenizer (`Serial Version/src/parser.c:
51-76` + add_token's 62-char term cut, `src/index.c:103`): split on the
serial delimiter set, lowercase, drop the 5 stopwords.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..functions.tokenize import MAX_TERM_LEN, STOPWORDS

# Arrow re2 character class for the serial delimiter set.
SERIAL_TOKEN_SPLIT_RE = "[ \t\n\r.,;:!?\"()\\[\\]{}<>]+"
_STOP_ARR = pa.array(list(STOPWORDS))


def _split_and_mask(batch: pa.Table, text_col: str):
    """(flat tokens, parent row indices, kept mask) — THE kept-token
    definition (lowercase split + length gate + stopword drop), shared by
    tokenize_batch and encode_with_vocab so the two can never drift."""
    lower = pc.utf8_lower(batch[text_col])
    toks = pc.split_pattern_regex(lower, SERIAL_TOKEN_SPLIT_RE)
    flat = pc.list_flatten(toks)
    parents = pc.list_parent_indices(toks)
    ln = pc.utf8_length(flat)
    mask = pc.and_(
        pc.and_(pc.greater(ln, 0), pc.less_equal(ln, MAX_TERM_LEN)),
        pc.invert(pc.is_in(flat, value_set=_STOP_ARR)),
    )
    return flat, parents, mask


def tokenize_batch(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """Vectorized: docs batch -> (doc_id, term) exploded rows (serial
    tokenizer semantics, zero Python loops)."""
    flat, parents, mask = _split_and_mask(batch, text_col)
    ids = pc.take(batch[id_col], parents)
    return pa.table({"doc_id": pc.filter(ids, mask), "term": pc.filter(flat, mask)})


def tf_dl_batch(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """Docs batch -> (term, doc_id, tf, dl) rows. tf and dl are complete (not
    partial) because each document is wholly inside its batch — the engine's
    'pre-aggregate inside map_batches' rule with zero merge step needed."""
    tok = tokenize_batch(batch, id_col, text_col)
    tf = tok.group_by(["term", "doc_id"]).aggregate([([], "count_all")])
    tf = tf.rename_columns(["term", "doc_id", "tf"])
    dl = tok.group_by(["doc_id"]).aggregate([([], "count_all")]).rename_columns(["doc_id", "dl"])
    return tf.join(dl, keys="doc_id", join_type="inner").select(
        ["term", "doc_id", "tf", "dl"]
    )


def tokens_dataset(docs, id_col: str = "doc_id", text_col: str = "text"):
    return docs.map_batches(
        lambda b: tokenize_batch(b, id_col, text_col), batch_format="pyarrow"
    )


def term_doc_tf(docs, id_col: str = "doc_id", text_col: str = "text"):
    """Dataset of (term, doc_id, tf, dl)."""
    return docs.map_batches(
        lambda b: tf_dl_batch(b, id_col, text_col), batch_format="pyarrow"
    )


def doc_lengths(docs, id_col: str = "doc_id", text_col: str = "text"):
    """Dataset of (doc_id, dl) — `doc_lengths[]` (`Serial Version/src/index.c:12`)."""

    def dl_batch(batch: pa.Table) -> pa.Table:
        tok = tokenize_batch(batch, id_col, text_col)
        dl = tok.group_by(["doc_id"]).aggregate([([], "count_all")])
        return dl.rename_columns(["doc_id", "dl"])

    return docs.map_batches(dl_batch, batch_format="pyarrow")


def term_df(docs, id_col: str = "doc_id", text_col: str = "text"):
    """Dataset of (term, df) — posting_count per term. One groupby shuffle
    over already-unique (term, doc) rows."""
    from ray.data.aggregate import Count

    tf = term_doc_tf(docs, id_col, text_col)
    return tf.groupby("term").aggregate(Count(alias_name="df"))


def build_inverted_index(docs, id_col: str = "doc_id", text_col: str = "text"):
    """Dataset of (term, df, postings list<struct<doc_id, tf>>) — the full
    index table (`InvertedIndex`, `Serial Version/include/index.h:19-32`),
    built by the hash-partitioned term shuffle. Postings are doc_id-sorted
    (the reference's are in first-encounter order — an array-layout artifact,
    not a semantic; sorted is deterministic under parallelism).

    Partition-grouped: the shuffle key is hash(term) % 64, NOT the raw term
    — Ray's map_groups pays ~1-2ms of pandas setup per group, and a
    vocabulary-scale group count would swamp the actual assembly work. All
    terms of a partition are assembled in one pass via np.unique run
    boundaries over the (term, doc_id)-sorted rows."""
    import numpy as np
    import pandas as pd

    tf = term_doc_tf(docs, id_col, text_col)
    N_PARTS = 64

    def add_part(b: pa.Table) -> pa.Table:
        part = (
            pd.util.hash_array(
                b["term"].to_numpy(zero_copy_only=False), categorize=False
            )
            % N_PARTS
        ).astype(np.int32)
        return b.append_column("part", pa.array(part))

    def collect_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["term", "doc_id"], kind="stable")
        terms = g["term"].to_numpy()
        dids = g["doc_id"].to_numpy()
        tfs = g["tf"].to_numpy()
        uniq, starts, counts = np.unique(
            terms, return_index=True, return_counts=True
        )
        postings = [
            [
                {"doc_id": int(d), "tf": int(t)}
                for d, t in zip(dids[s : s + c], tfs[s : s + c])
            ]
            for s, c in zip(starts, counts)
        ]
        return pd.DataFrame(
            {"term": uniq, "df": counts.astype(np.int64), "postings": postings}
        )

    return (
        tf.map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(collect_part, batch_format="pandas")
    )


# -- persisted, servable index layout -----------------------------------------

def _bucket_gen_stamp(n_buckets: int, gen: int):
    """Batch fn appending the term-hash bucket (the on-disk partition key)
    and the generation stamp (which update wrote the row — what tombstones
    compare against) to a (term, doc_id, tf, dl) postings batch."""
    import numpy as np
    import pandas as pd

    def f(b: pa.Table) -> pa.Table:
        terms = b["term"].to_numpy(zero_copy_only=False)
        if terms.dtype.kind == "U":
            terms = terms.astype(object)
        bucket = (
            pd.util.hash_array(terms, categorize=False) % n_buckets
        ).astype(np.int64)
        b = b.append_column("gen", pa.array(np.full(len(bucket), gen, np.int64)))
        return b.append_column("bucket", pa.array(bucket))

    return f


def write_term_index(
    docs,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
) -> dict:
    """Persist the inverted index as a SERVABLE on-disk layout — the
    build-once / query-many deployment shape of the reference
    (`Serial Version/src/main.c`: build_index then the query loop):

      out_dir/postings/bucket=K/*.parquet   (term, doc_id, tf, dl) rows,
                                            hash-partitioned by term
      out_dir/manifest.json                 {n_docs, total_tokens,
                                             avgdl, n_buckets}

    Query time (`rank.bm25_from_index`) touches only the query terms'
    bucket directories and pushes a ``term IN (...)`` predicate into the
    parquet scan — at 100 TB the read is postings-of-q, never the corpus.
    Corpus stats ride in the manifest so serving needs zero corpus passes.
    Returns the manifest payload."""
    import shutil

    from ..sources.io import write_manifest

    shutil.rmtree(out_dir, ignore_errors=True)

    tf = term_doc_tf(docs, id_col, text_col).materialize()
    n_docs = docs.count()
    total_tokens = tf.map_batches(
        lambda b: pa.table({"s": [pc.sum(b["tf"]).as_py() or 0]}),
        batch_format="pyarrow",
    ).sum("s") or 0
    tf.map_batches(
        _bucket_gen_stamp(n_buckets, 0), batch_format="pyarrow"
    ).write_parquet(f"{out_dir}/postings", partition_cols=["bucket"])
    payload = {
        "n_docs": int(n_docs),
        "total_tokens": int(total_tokens),
        "avgdl": total_tokens / n_docs if n_docs else 0.0,
        "n_buckets": int(n_buckets),
        "gen": 0,
    }
    write_manifest(out_dir, payload)
    return payload


def append_to_term_index(
    docs_new,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """Incremental index maintenance: fold a batch of NEW documents into an
    existing `write_term_index` layout. New postings land as additional
    parquet files inside the same bucket directories (parquet dirs are
    append-friendly; serving globs every file) and the manifest stats
    update additively — no rebuild, no read of existing postings. The
    caller guarantees the docs are new (re-appending a doc_id would
    double-count its postings, as in any delta-append index). Returns the
    updated manifest."""
    from ..sources.io import read_manifest, write_manifest

    man = read_manifest(out_dir)
    if man is None:
        raise FileNotFoundError(f"no index manifest under {out_dir}")
    n_buckets = int(man["n_buckets"])

    tf = term_doc_tf(docs_new, id_col, text_col).materialize()
    n_new = docs_new.count()
    tok_new = tf.map_batches(
        lambda b: pa.table({"s": [pc.sum(b["tf"]).as_py() or 0]}),
        batch_format="pyarrow",
    ).sum("s") or 0
    tf.map_batches(
        _bucket_gen_stamp(n_buckets, int(man.get("gen", 0))),
        batch_format="pyarrow",
    ).write_parquet(f"{out_dir}/postings", partition_cols=["bucket"])
    n_docs = int(man["n_docs"]) + int(n_new)
    total = int(man["total_tokens"]) + int(tok_new)
    payload = {
        "n_docs": n_docs,
        "total_tokens": total,
        "avgdl": total / n_docs if n_docs else 0.0,
        "n_buckets": n_buckets,
        "gen": int(man.get("gen", 0)),
    }
    write_manifest(out_dir, payload)
    return payload


def read_tombstones(index_dir: str):
    """(sorted ids, before_gen) from every tombstone file under the index,
    folded to the per-doc MAX before_gen (a doc deleted/changed twice kills
    everything older than its LATEST update). None when no tombstones.
    Bounded by cumulative churn since the last compaction, by design."""
    import glob

    import numpy as np
    import pyarrow.parquet as pq

    files = sorted(glob.glob(f"{index_dir}/tombstones/*.parquet"))
    if not files:
        return None
    t = pa.concat_tables([pq.read_table(f) for f in files])
    ids = t["id"].to_numpy(zero_copy_only=False).astype(np.int64)
    before = t["before_gen"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(ids, kind="stable")
    ids, before = ids[order], before[order]
    # per-id max: reverse cumulative max within equal-id runs
    uniq, start = np.unique(ids, return_index=True)
    mx = np.maximum.reduceat(before, start)
    return uniq, mx


def live_postings_mask(batch: pa.Table, tomb, id_col: str = "doc_id"):
    """Boolean keep-mask applying tombstones to a postings batch: a row
    dies iff its doc is tombstoned AND its gen predates the doc's kill
    generation (rows REwritten by the same update that killed the old ones
    carry gen >= before_gen and survive). Rows without a gen column are
    original build output (gen 0)."""
    import numpy as np

    ids_t, before_t = tomb
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    if "gen" in batch.column_names:
        # null-safe: compaction concats bucket files with
        # promote_options='default', so a file that predates gen-stamping
        # yields gen == null here (not a missing column); a raw astype on
        # nulls NaN-casts to garbage gens and tombstoned rows could
        # silently survive. Null gen == original build output == gen 0.
        col = batch["gen"]
        if col.null_count:
            col = pc.fill_null(col, 0)
        gen = col.to_numpy(zero_copy_only=False).astype(np.int64)
    else:
        gen = np.zeros(len(ids), np.int64)
    pos = np.clip(np.searchsorted(ids_t, ids), 0, max(ids_t.size - 1, 0))
    hit = ids_t[pos] == ids if ids_t.size else np.zeros(len(ids), bool)
    return ~hit | (gen >= before_t[pos])


def update_term_index(
    docs_old,
    docs_new,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> dict:
    """Tombstone-aware incremental reindex: fold a corpus SNAPSHOT CHANGE
    (adds + edits + deletes) into an existing `write_term_index` layout so
    that serving equals a fresh rebuild over the new snapshot — the
    Lucene-style delete-then-add lifecycle the reference's build-once index
    (`Serial Version/src/index.c:15-114`) has no answer to.

    Plan (cost is O(churn), never O(corpus) beyond the diff's fixed-width
    digest pass):
      1. `dedup.corpus_diff(old, new)` classifies docs; only the
         non-`unchanged` ids (churn-bounded by assumption — a corpus-scale
         churn means you rebuild instead) reach the driver.
      2. removed+changed ids become a TOMBSTONE file
         (`out_dir/tombstones/tomb-<gen>.parquet`: id, before_gen) — old
         postings are scattered across every term bucket, so killing them
         in place would rewrite the whole index; serving instead drops
         rows with gen < before_gen (`live_postings_mask`), and
         `compact_term_index` applies tombstones physically.
      3. added+changed docs are re-tokenized from the NEW snapshot and
         appended with gen = old gen + 1, so an edited doc's fresh
         postings survive its own tombstone.
      4. manifest stats stay exact: n_docs += added - removed;
         total_tokens += tokens(new added+changed) - tokens(old
         removed+changed), the latter measured on the churn-filtered old
         snapshot only.
    Returns the updated manifest plus the churn counts."""
    import os

    import numpy as np
    import pyarrow.parquet as pq
    import ray

    from ..sources.io import read_manifest, write_manifest
    from .dedup import corpus_diff

    man = read_manifest(out_dir)
    if man is None:
        raise FileNotFoundError(f"no index manifest under {out_dir}")
    n_buckets = int(man["n_buckets"])
    gen = int(man.get("gen", 0)) + 1

    diff = corpus_diff(docs_old, docs_new, id_col=id_col, text_col=text_col)
    churn = diff.map_batches(
        lambda b: b.filter(pc.not_equal(b["status"], "unchanged")),
        batch_format="pyarrow",
    ).take_all()
    dead = np.sort(
        np.array(
            [r["doc_id"] for r in churn if r["status"] in ("removed", "changed")],
            np.int64,
        )
    )
    fresh = np.sort(
        np.array(
            [r["doc_id"] for r in churn if r["status"] in ("added", "changed")],
            np.int64,
        )
    )
    n_added = sum(1 for r in churn if r["status"] == "added")
    n_removed = sum(1 for r in churn if r["status"] == "removed")

    def keep_ids(ref):
        def f(b: pa.Table) -> pa.Table:
            wanted = ray.get(ref)
            ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            pos = np.clip(
                np.searchsorted(wanted, ids), 0, max(wanted.size - 1, 0)
            )
            return b.filter(pa.array(wanted[pos] == ids))

        return f

    tok_dead = 0
    if dead.size:
        old_dead = docs_old.map_batches(
            keep_ids(ray.put(dead)), batch_format="pyarrow"
        )
        tok_dead = doc_lengths(old_dead, id_col, text_col).sum("dl") or 0
        os.makedirs(f"{out_dir}/tombstones", exist_ok=True)
        pq.write_table(
            pa.table(
                {
                    "id": pa.array(dead),
                    "before_gen": pa.array(np.full(dead.size, gen, np.int64)),
                }
            ),
            f"{out_dir}/tombstones/tomb-{gen}.parquet",
        )

    tok_new = 0
    if fresh.size:
        new_docs = docs_new.map_batches(
            keep_ids(ray.put(fresh)), batch_format="pyarrow"
        )
        tf = term_doc_tf(new_docs, id_col, text_col).materialize()
        tok_new = tf.map_batches(
            lambda b: pa.table({"s": [pc.sum(b["tf"]).as_py() or 0]}),
            batch_format="pyarrow",
        ).sum("s") or 0
        tf.map_batches(
            _bucket_gen_stamp(n_buckets, gen), batch_format="pyarrow"
        ).write_parquet(f"{out_dir}/postings", partition_cols=["bucket"])

    n_docs = int(man["n_docs"]) + n_added - n_removed
    total = int(man["total_tokens"]) + int(tok_new) - int(tok_dead)
    payload = {
        "n_docs": n_docs,
        "total_tokens": total,
        "avgdl": total / n_docs if n_docs else 0.0,
        "n_buckets": n_buckets,
        "gen": gen,
        "n_added": n_added,
        "n_changed": int(len(churn)) - n_added - n_removed,
        "n_removed": n_removed,
    }
    write_manifest(out_dir, payload)
    return payload


def compact_term_index(out_dir: str) -> "pd.DataFrame":
    """Index maintenance closing the build/append lifecycle: merge each
    bucket's accumulated delta files (one lands per `append_to_term_index`
    call and per writer block) back into a single (term, doc_id)-sorted
    parquet file, so serving reads one file per queried bucket instead of
    one per append. Buckets are independent — compaction runs as a Ray
    task pool over bucket directories (each bucket is vocab/n_buckets
    postings, far below worker heap by construction), and a bucket already
    at one file is skipped, which is what makes a killed compaction
    resumable: re-running finishes only the remaining buckets. Within a
    bucket the new file is written tmp-then-rename and the delta files are
    removed after the rename — a crash between the two leaves duplicate
    rows visible, the standard LSM-compaction seam; re-running the
    compaction is NOT the fix for that (re-run skips 1-file dirs), the
    marker is the leftover ``compact-tmp`` file. Tombstones left by
    `update_term_index` are applied PHYSICALLY here (dead rows dropped
    bucket-by-bucket via `live_postings_mask`) and the tombstone files are
    removed only after every bucket is rewritten — a crash in between
    leaves the tombstones in place, serving stays correct, and re-running
    reapplies them idempotently (dropping already-absent rows is a no-op;
    note the 1-file skip is disabled while tombstones exist, so the re-run
    does rewrite every bucket once more). Manifest stats don't change:
    `update_term_index` already adjusted them at tombstone-write time.
    Returns per-bucket (bucket_dir, n_files_before, compacted)
    accounting."""
    import glob
    import os

    import pyarrow.parquet as pq
    import ray
    import ray.data as rd

    from ..sources.io import read_manifest

    if read_manifest(out_dir) is None:
        raise FileNotFoundError(f"no index manifest under {out_dir}")
    buckets = sorted(glob.glob(f"{out_dir}/postings/bucket=*"))
    tomb = read_tombstones(out_dir)
    tomb_ref = ray.put(tomb)  # churn-bounded; shipped once, read per task

    def compact_one(b: pa.Table) -> pa.Table:
        tmb = ray.get(tomb_ref)
        dirs, before, did = [], [], []
        for d in b["bucket_dir"].to_pylist():
            files = sorted(glob.glob(f"{d}/*.parquet"))
            dirs.append(d)
            before.append(len(files))
            if len(files) <= 1 and tmb is None:
                did.append(False)
                continue
            merged = pa.concat_tables(
                [pq.read_table(f) for f in files], promote_options="default"
            )
            if tmb is not None:
                merged = merged.filter(pa.array(live_postings_mask(merged, tmb)))
            merged = merged.sort_by([("term", "ascending"), ("doc_id", "ascending")])
            tmp = os.path.join(d, "compact-tmp")
            pq.write_table(merged, tmp)
            os.replace(tmp, os.path.join(d, "compacted-0.parquet"))
            for f in files:
                if os.path.basename(f) != "compacted-0.parquet":
                    os.remove(f)
            did.append(True)
        return pa.table(
            {
                "bucket_dir": pa.array(dirs, pa.string()),
                "n_files_before": pa.array(before, pa.int64()),
                "compacted": pa.array(did, pa.bool_()),
            }
        )

    out = (
        rd.from_items([{"bucket_dir": d} for d in buckets])
        .map_batches(compact_one, batch_format="pyarrow")
        .to_pandas()
    )
    if tomb is not None:  # all buckets rewritten — tombstones now physical
        for f in sorted(glob.glob(f"{out_dir}/tombstones/*.parquet")):
            os.remove(f)
    return out


# -- heavy hitters (frequent terms) -------------------------------------------

def frequent_terms(
    docs,
    threshold_frac: float = 0.001,
    k_capacity: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """(term, cnt): every term whose corpus frequency EXCEEDS
    ``threshold_frac`` of all kept tokens, with its exact count — the
    two-pass heavy-hitters pattern:

      1. sketch pass: per-block exact term counts (vectorized Arrow
         group_by — block-bounded) stream to the driver through a
         weighted Misra-Gries summary of capacity ``k_capacity``; MG
         guarantees every term with true count > n/k_capacity survives,
         so with ``threshold_frac >= 1/k_capacity`` the candidate set
         provably contains every answer. Driver state is k_capacity
         entries — never the vocabulary, never a shuffle.
      2. verify pass: exact counts for the candidates only (broadcast
         ``is_in`` filter + per-block partials, candidate-bounded merge),
         then the exact threshold filter.

    The SQL mirror is a plain GROUP BY/HAVING — which at 100 TB is a full
    vocabulary shuffle; this is the bounded-memory shape. Returns a
    pyarrow table sorted by (cnt desc, term)."""
    import ray

    if threshold_frac < 1.0 / k_capacity:
        raise ValueError(
            "threshold_frac below 1/k_capacity voids the MG guarantee"
        )

    def block_counts(b: pa.Table) -> pa.Table:
        t = tokenize_batch(b, id_col, text_col)
        g = t.group_by(["term"]).aggregate([([], "count_all")])
        return g.rename_columns(["term", "c"])

    counts = docs.map_batches(block_counts, batch_format="pyarrow")

    # weighted Misra-Gries over the block summaries (driver-side; bounded)
    mg: dict = {}
    total = 0
    for t in counts.iter_batches(batch_format="pyarrow", batch_size=None):
        terms = t["term"].to_pylist()
        cs = t["c"].to_pylist()
        total += sum(cs)
        for term, c in zip(terms, cs):
            if term in mg:
                mg[term] += c
            elif len(mg) < k_capacity:
                mg[term] = c
            else:
                # weighted decrement: subtract the smallest of (c, min
                # counter) from everything including the newcomer
                dec = min(min(mg.values()), c)
                mg = {k: v - dec for k, v in mg.items() if v > dec}
                if c > dec:
                    mg[term] = c - dec
    if not mg:
        return pa.table(
            {"term": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())}
        )

    cand = pa.array(sorted(mg.keys()))
    cand_ref = ray.put(cand)

    def cand_counts(b: pa.Table) -> pa.Table:
        t = tokenize_batch(b, id_col, text_col)
        t = t.filter(pc.is_in(t["term"], value_set=ray.get(cand_ref)))
        g = t.group_by(["term"]).aggregate([([], "count_all")])
        return g.rename_columns(["term", "c"])

    exact: dict = {}
    for t in docs.map_batches(cand_counts, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow", batch_size=None
    ):
        for term, c in zip(t["term"].to_pylist(), t["c"].to_pylist()):
            exact[term] = exact.get(term, 0) + c

    cut = total * threshold_frac
    rows = sorted(
        ((term, c) for term, c in exact.items() if c > cut),
        key=lambda x: (-x[1], x[0]),
    )
    return pa.table(
        {
            "term": pa.array([r[0] for r in rows], pa.string()),
            "cnt": pa.array([r[1] for r in rows], pa.int64()),
        }
    )


def top_terms_per_source(
    docs,
    k: int = 5,
    source_col: str = "source",
    text_col: str = "text",
):
    """(source, term, cnt, rank): the top-k corpus terms of each source —
    the per-tenant keyword profile a corpus dashboard shows next to
    `source_quality`. Tokenization is the shared serial-tokenizer kernel
    keyed by source; the shuffle carries (source, term, partial count)
    rows, and the final top-k is one vectorized call per SOURCE (a bounded
    dimension, so the per-group tax is capped by design). Deterministic
    tiebreak: (cnt desc, term asc)."""
    import numpy as np
    import pandas as pd

    from ray.data.aggregate import Sum

    def counts(b: pa.Table) -> pa.Table:
        t = tokenize_batch(b, id_col=source_col, text_col=text_col)
        g = t.group_by(["doc_id", "term"]).aggregate([([], "count_all")])
        return g.rename_columns([source_col, "term", "c"])

    agg = (
        docs.map_batches(counts, batch_format="pyarrow")
        .groupby([source_col, "term"])
        .aggregate(Sum("c", alias_name="cnt"))
    )

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        idx = np.lexsort((g["term"].to_numpy(), -g["cnt"].to_numpy()))[:k]
        out = g.iloc[idx][[source_col, "term", "cnt"]].copy()
        out["rank"] = np.arange(1, len(out) + 1, dtype=np.int64)
        return out

    return agg.groupby(source_col).map_groups(topk, batch_format="pandas")


def phrase_pmi(
    docs,
    min_count: int = 3,
    k: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """(w1, w2, n_ab, pmi): word2vec-style phrase mining — the top-k
    adjacent token pairs by pointwise mutual information
    ``pmi = ln(n_ab * N / (n_w1 * n_w2))`` (N = total kept tokens), among
    pairs seen at least ``min_count`` times. Adjacency is over the KEPT
    token sequence (the shared serial-tokenizer kernel: lowercase, split,
    length/stopword filter — order preserved), so both sides of a dropped
    stopword become adjacent, matching the oracle's list_filter semantics.

    Shape: ONE tokenize pass per block emits both the bigram and unigram
    partial counts as a tagged union (unigram rows carry w2 = "" — tokens
    are never empty, so the tag can't collide; this halves the dominant
    text-scan cost vs separate passes, the bm25_topk shared-tokenize
    lesson) -> (w1,w2,n) shuffle -> split -> min_count gate -> unigram
    counts attached via the cost-based broadcast/shuffle join (vocab-scale
    safe) -> vectorized pmi -> global sort + limit(k). At 100 TB the
    min_count gate is the boundedness knob (scale it as a rate, or front
    it with the `frequent_terms` Misra-Gries sketch); nothing here
    materializes the vocabulary on the driver.
    Deterministic tiebreak: (pmi desc, w1 asc, w2 asc); pmi rounded 6dp."""
    import numpy as np

    from ray.data.aggregate import Sum

    from ..functions.rounding import round_half_away
    from .relational import _attach_or_join, _join_partitions

    big_schema = pa.schema(
        [("w1", pa.string()), ("w2", pa.string()), ("n", pa.int64())]
    )

    def gram_partials(b: pa.Table) -> pa.Table:
        """ONE tokenize pass -> tagged union of bigram (w1, w2, n) and
        unigram (w1, "", n) partial counts (tokens are never empty, so the
        "" tag can't collide) — halves the dominant text-scan cost vs
        separate unigram/bigram passes (the bm25_topk shared-tokenize
        lesson)."""
        tok = tokenize_batch(b, id_col, text_col)
        n = tok.num_rows
        terms = tok["term"].combine_chunks()
        uni_t = (
            pa.table({"w1": terms})
            .group_by(["w1"])
            .aggregate([([], "count_all")])
            .rename_columns(["w1", "n"])
        )
        uni_t = uni_t.append_column(
            "w2", pa.array([""] * uni_t.num_rows, pa.string())
        ).select(["w1", "w2", "n"]).cast(big_schema)
        if n < 2:
            return uni_t
        ids = tok["doc_id"].combine_chunks()
        same = pc.equal(ids.slice(0, n - 1), ids.slice(1, n))
        t = pa.table(
            {
                "w1": pc.filter(terms.slice(0, n - 1), same),
                "w2": pc.filter(terms.slice(1, n), same),
            }
        )
        g = (
            t.group_by(["w1", "w2"])
            .aggregate([([], "count_all")])
            .rename_columns(["w1", "w2", "n"])
            .cast(big_schema)
        )
        return pa.concat_tables([uni_t, g])

    grams = (
        docs.map_batches(gram_partials, batch_format="pyarrow")
        .groupby(["w1", "w2"])
        .aggregate(Sum("n", alias_name="n_ab"))
        .materialize()
    )
    uni = grams.map_batches(
        lambda b: pa.table(
            {
                "term": b.filter(pc.equal(b["w2"], ""))["w1"],
                "n_term": b.filter(pc.equal(b["w2"], ""))["n_ab"],
            }
        ),
        batch_format="pyarrow",
    ).materialize()
    total = float(uni.aggregate(Sum("n_term"))["sum(n_term)"])

    big = grams.map_batches(
        lambda b: b.filter(
            pc.and_(
                pc.invert(pc.equal(b["w2"], "")),
                pc.greater_equal(b["n_ab"], min_count),
            )
        ),
        batch_format="pyarrow",
    )

    npart = _join_partitions(n_joins=2)
    with_a = _attach_or_join(
        big, "w1", uni, "term", ["n_term"], npart, launder_fact=True
    ).map_batches(
        lambda b: b.rename_columns(
            ["n_a" if c == "n_term" else c for c in b.column_names]
        ),
        batch_format="pyarrow",
    )
    with_b = _attach_or_join(
        with_a, "w2", uni, "term", ["n_term"], npart, launder_fact=True
    )

    def score(b: pa.Table) -> pa.Table:
        n_ab = b["n_ab"].to_numpy(zero_copy_only=False).astype(np.float64)
        n_a = b["n_a"].to_numpy(zero_copy_only=False).astype(np.float64)
        n_b = b["n_term"].to_numpy(zero_copy_only=False).astype(np.float64)
        pmi = round_half_away(np.log(n_ab * total / (n_a * n_b)), 6)
        return pa.table(
            {
                "w1": b["w1"],
                "w2": b["w2"],
                "n_ab": b["n_ab"],
                "pmi": pa.array(pmi, pa.float64()),
            }
        )

    return (
        with_b.map_batches(score, batch_format="pyarrow")
        .sort(["pmi", "w1", "w2"], descending=[True, False, False])
        .limit(k)
    )


def build_vocab(
    docs,
    size: int = 1000,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """(term, n_term, vocab_id): tokenizer-prep vocabulary — the top
    ``size`` kept terms by corpus count with contiguous rank ids
    (deterministic tiebreak: count desc, term asc; vocab_id 0-based in
    that order). Distributed shape: per-block term-count partials ->
    (term, n) groupby -> distributed sort + limit(size); only the
    size-bounded result is pulled to assign ids (the vocabulary OUTPUT is
    driver-bounded by contract, the corpus vocabulary never is).
    Returns a pandas DataFrame of at most ``size`` rows."""
    import numpy as np
    import pandas as pd

    from ray.data.aggregate import Sum

    def partials(b: pa.Table) -> pa.Table:
        g = (
            tokenize_batch(b, id_col, text_col)
            .group_by(["term"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["term", "n"])

    top = (
        docs.map_batches(partials, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("n", alias_name="n_term"))
        .sort(["n_term", "term"], descending=[True, False])
        .limit(size)
        .to_pandas()
    )
    # re-sort driver-side (block order after limit is already sorted; this
    # is belt-and-braces for id assignment determinism)
    top = top.sort_values(
        ["n_term", "term"], ascending=[False, True], kind="stable"
    ).reset_index(drop=True)
    top["vocab_id"] = np.arange(len(top), dtype=np.int64)
    return top[["term", "n_term", "vocab_id"]]


def encode_with_vocab(
    docs,
    size: int = 1000,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """(doc_id, token_ids: list<int64>): the tokenizer deployment op —
    encode every document's kept-token sequence into vocab ids from
    ``build_vocab(docs, size)``; out-of-vocabulary tokens encode as -1.
    Every doc emits a row (zero-kept-token docs get an empty list).

    Scale shape: the vocabulary is size-bounded by contract, broadcast
    once via ray.put as sorted arrays; encoding is an embarrassingly
    parallel per-batch pass (split -> flatten -> searchsorted -> list
    reassembly from bincount offsets), no shuffle."""
    import numpy as np
    import ray

    vocab = build_vocab(docs, size=size, id_col=id_col, text_col=text_col)
    terms = vocab["term"].to_numpy()
    vids = vocab["vocab_id"].to_numpy().astype(np.int64)
    order = np.argsort(terms)
    vref = ray.put((terms[order], vids[order]))

    def enc(b: pa.Table) -> pa.Table:
        n = b.num_rows
        flat, parents_arr, mask = _split_and_mask(b, text_col)
        parents = parents_arr.to_numpy(zero_copy_only=False)
        mask_np = mask.to_numpy(zero_copy_only=False)
        toks = pc.filter(flat, mask).to_numpy(zero_copy_only=False)
        parents = parents[mask_np]
        terms_s, ids_s = ray.get(vref)
        if len(terms_s):
            pos = np.clip(
                np.searchsorted(terms_s, toks), 0, len(terms_s) - 1
            )
            tok_ids = np.where(terms_s[pos] == toks, ids_s[pos], -1)
        else:
            tok_ids = np.full(len(toks), -1, np.int64)
        counts = np.bincount(parents, minlength=n)
        offsets = np.append(0, np.cumsum(counts)).astype(np.int32)
        lst = pa.ListArray.from_arrays(
            pa.array(offsets, pa.int32()),
            pa.array(tok_ids.astype(np.int64), pa.int64()),
        )
        return pa.table({id_col: b[id_col], "token_ids": lst})

    return docs.map_batches(enc, batch_format="pyarrow")


def encode_tokens_exploded(
    docs, size: int = 1000, id_col: str = "doc_id", text_col: str = "text"
):
    """(doc_id, pos, token_id): the exploded row form of
    ``encode_with_vocab`` (pos = 0-based position in the kept-token
    sequence) — the SQL-comparable contract view; zero-token docs emit no
    rows. Block-local explode, no shuffle."""
    import numpy as np

    enc = encode_with_vocab(docs, size=size, id_col=id_col, text_col=text_col)

    def explode(b: pa.Table) -> pa.Table:
        lst = b["token_ids"].combine_chunks()
        flat = pc.list_flatten(lst).to_numpy(zero_copy_only=False)
        counts = pc.list_value_length(lst).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        parent = np.repeat(np.arange(len(counts)), counts)
        starts = np.cumsum(counts) - counts
        pos = np.arange(len(flat)) - starts[parent]
        return pa.table(
            {
                id_col: b[id_col].combine_chunks().take(
                    pa.array(parent, pa.int64())
                ),
                "pos": pa.array(pos.astype(np.int64), pa.int64()),
                "token_id": pa.array(flat.astype(np.int64), pa.int64()),
            }
        )

    return enc.map_batches(explode, batch_format="pyarrow")


def train_bpe(
    docs,
    n_merges: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Train a byte-pair-encoding merge list over the corpus's kept-token
    stream. Returns ``(merges, word_counts)`` where ``merges`` is an
    ordered list of (left, right) symbol pairs and ``word_counts`` the
    {word: count} table it was trained on.

    Like real BPE trainers (GPT-2, HuggingFace), training runs on the
    WORD-FREQUENCY table, not the corpus: the distributed work is the
    (term, n) partial-count shuffle (the same vocab-bounded pull as
    ``unigram_logprob``'s model fit); the merge loop is driver-side over
    that bounded dict. Deterministic: the most frequent symbol pair wins,
    ties broken by the lexicographically smallest (left, right)."""

    from ray.data.aggregate import Sum

    def partials(b: pa.Table) -> pa.Table:
        g = (
            tokenize_batch(b, id_col, text_col)
            .group_by(["term"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["term", "n"])

    rows = (
        docs.map_batches(partials, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("n", alias_name="cnt"))
        .take_all()  # vocab-bounded pull (see docstring)
    )
    word_counts = {r["term"]: int(r["cnt"]) for r in rows}
    symbols = {w: tuple(w) for w in word_counts}

    merges: list[tuple[str, str]] = []
    for _ in range(int(n_merges)):
        pair_counts: dict[tuple[str, str], int] = {}
        for w, syms in symbols.items():
            c = word_counts[w]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + c
        if not pair_counts:
            break
        # deterministic argmax: max count, then lexicographically smallest
        top = max(pair_counts.values())
        best = min(p for p, c in pair_counts.items() if c == top)
        merges.append(best)
        joined = best[0] + best[1]
        new_symbols = {}
        for w, syms in symbols.items():
            out = []
            i = 0
            while i < len(syms):
                if (
                    i < len(syms) - 1
                    and syms[i] == best[0]
                    and syms[i + 1] == best[1]
                ):
                    out.append(joined)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_symbols[w] = tuple(out)
        symbols = new_symbols
    return merges, word_counts


def bpe_encode(
    docs,
    merges: list,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """(doc_id, n_kept_tokens, n_bpe_symbols): apply an ordered BPE merge
    list to every document's kept-token stream and report the resulting
    symbol count — the real token-budget accounting a trained tokenizer
    gives (whitespace counts overestimate; chars underestimate). The merge
    list is broadcast once via ray.put; each batch encodes only its
    block-unique words (cached dict per batch), then distributes counts
    back through the inverse index — no shuffle."""
    import numpy as np
    import ray

    merges_ref = ray.put(list(merges))

    def apply_merges(word: str, mlist) -> int:
        syms = list(word)
        for left, right in mlist:
            i = 0
            out = []
            while i < len(syms):
                if (
                    i < len(syms) - 1
                    and syms[i] == left
                    and syms[i + 1] == right
                ):
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
            if len(syms) == 1:
                break
        return len(syms)

    def enc(b: pa.Table) -> pa.Table:
        t = tokenize_batch(b, id_col, text_col)
        terms = t["term"].to_numpy(zero_copy_only=False)
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        mlist = ray.get(merges_ref)
        uniq, inv = np.unique(terms, return_inverse=True)
        n_syms = np.array(
            [apply_merges(w, mlist) for w in uniq], np.int64
        )
        per_tok = n_syms[inv] if len(uniq) else np.empty(0, np.int64)
        uids, dinv = np.unique(ids, return_inverse=True)
        return pa.table(
            {
                id_col: pa.array(uids, b[id_col].type),
                "n_kept_tokens": pa.array(
                    np.bincount(dinv).astype(np.int64), pa.int64()
                ),
                "n_bpe_symbols": pa.array(
                    np.bincount(dinv, weights=per_tok).astype(np.int64),
                    pa.int64(),
                ),
            }
        )

    return docs.map_batches(enc, batch_format="pyarrow")


def source_vocab_diversity(
    docs,
    source_col: str = "source",
    text_col: str = "text",
):
    """Per-source vocabulary diversity: total kept tokens, distinct terms,
    and type-token ratio — the corpus-health signal that flags template
    spam (TTR near 0) and OCR/mojibake noise (TTR near 1) per feed before
    it pollutes a training mix.

    Same shuffle shape as `top_terms_per_source`: per-block tokenize
    partials collapse to (source, term, count) before the groupby, and the
    second aggregate runs over the vocabulary-bounded (source, term)
    table — document text never moves."""
    import numpy as np

    from ray.data.aggregate import Count, Sum

    from ..functions.rounding import round_half_away

    def counts(b: pa.Table) -> pa.Table:
        t = tokenize_batch(b, id_col=source_col, text_col=text_col)
        g = t.group_by(["doc_id", "term"]).aggregate([([], "count_all")])
        return g.rename_columns([source_col, "term", "c"])

    per_term = (
        docs.map_batches(counts, batch_format="pyarrow")
        .groupby([source_col, "term"])
        .aggregate(Sum("c", alias_name="cnt"))
    )
    agg = per_term.groupby(source_col).aggregate(
        Sum("cnt", alias_name="n_tokens"),
        Count(alias_name="n_terms"),
    )

    def finalize(b: pa.Table) -> pa.Table:
        tok = b["n_tokens"].to_numpy().astype(np.float64)
        ter = b["n_terms"].to_numpy().astype(np.float64)
        ttr = round_half_away(ter / np.maximum(tok, 1.0), 6)
        return pa.table(
            {
                source_col: b[source_col],
                "n_tokens": b["n_tokens"],
                "n_terms": b["n_terms"],
                "ttr": pa.array(ttr, pa.float64()),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


def source_entropy(
    docs,
    source_col: str = "source",
    text_col: str = "text",
):
    """Per-source Shannon entropy (nats) of the kept-term distribution —
    the information-density companion of `source_vocab_diversity`'s TTR:
    near-zero entropy flags template/boilerplate feeds, abnormally high
    entropy flags mojibake/random-token noise; both are standard corpus-mix
    health gates before training.

    Shuffle shape: per-block tokenize partials collapse to
    (source, term, count); the vocabulary-bounded per-term table collapses
    again to the COUNT HISTOGRAM (source, cnt, m = #terms with that count)
    — hundreds of rows — and entropy folds the histogram per source in one
    tiny map_groups: H = ln N − Σ m·cnt·ln(cnt) / N. Document text never
    moves; the only fact-scale pass is the shared tokenize kernel."""
    import numpy as np
    import pandas as pd

    from ray.data.aggregate import Sum

    from ..functions.rounding import round_half_away

    def counts(b: pa.Table) -> pa.Table:
        t = tokenize_batch(b, id_col=source_col, text_col=text_col)
        g = t.group_by(["doc_id", "term"]).aggregate([([], "count_all")])
        return g.rename_columns([source_col, "term", "c"])

    per_term = (
        docs.map_batches(counts, batch_format="pyarrow")
        .groupby([source_col, "term"])
        .aggregate(Sum("c", alias_name="cnt"))
    )

    def hist_partial(b: pa.Table) -> pa.Table:
        t = pa.table(
            {
                source_col: b[source_col],
                "cnt": pc.cast(b["cnt"], pa.int64()),
                "m": pa.array(np.ones(b.num_rows, np.int64)),
            }
        )
        g = t.group_by([source_col, "cnt"]).aggregate([("m", "sum")])
        return g.rename_columns([source_col, "cnt", "m"])

    hist = (
        per_term.map_batches(hist_partial, batch_format="pyarrow")
        .groupby([source_col, "cnt"])
        .aggregate(Sum("m", alias_name="m"))
    )

    def entropy(g: pd.DataFrame) -> pd.DataFrame:
        c = g["cnt"].to_numpy().astype(np.int64)
        m = g["m"].to_numpy().astype(np.int64)
        n = int((m * c).sum())
        s = float(((m * c).astype(np.float64) * np.log(c.astype(np.float64))).sum())
        h = round_half_away(
            np.array([np.log(float(n)) - s / float(n) if n > 0 else 0.0]), 6
        )
        return pd.DataFrame(
            {
                source_col: [g[source_col].iloc[0]],
                "n_tokens": np.array([n], np.int64),
                "entropy_nats": h,
            }
        )

    return hist.groupby(source_col).map_groups(entropy, batch_format="pandas")


def positional_postings(docs, id_col: str = "doc_id", text_col: str = "text"):
    """(term, doc_id, positions list<int64>): the POSITIONAL inverted index
    — the structure that answers phrase and proximity queries without
    rescanning text (reference analog: the postings lists of
    `Serial Version/src/index.c`, which store tf only; positions are the
    classic extension). Tokens are lowercased WHITESPACE runs (the same
    stream `rank.phrase_search` scans, pinned by a cross-operator test).

    Block-local explode with vectorized position renumber (the
    encode_tokens_exploded idiom), then ONE hash shuffle co-locates each
    (term, doc) group — positions assemble vectorized per partition, never
    one pandas call per term."""
    import numpy as np
    import pandas as pd

    N_PARTS = 64

    def explode(b: pa.Table) -> pa.Table:
        txt = pc.utf8_lower(pc.fill_null(b[text_col], ""))
        toks = pc.split_pattern_regex(txt, r"\s+")
        la = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
        counts = np.asarray(
            pc.fill_null(pc.list_value_length(la), 0).to_numpy(zero_copy_only=False),
            dtype=np.int64,
        )
        flat = np.asarray(la.flatten().to_numpy(zero_copy_only=False), dtype=object)
        parent = np.repeat(np.arange(len(counts)), counts)
        starts = np.cumsum(counts) - counts
        pos = np.arange(len(flat)) - starts[parent]
        keep = flat != ""
        ids = (
            b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)[parent[keep]]
        )
        terms = flat[keep]
        part = (
            pd.util.hash_array(terms, categorize=False) % N_PARTS
        ).astype(np.int32)
        return pa.table(
            {
                "term": pa.array(terms, pa.string()),
                id_col: pa.array(ids),
                "pos": pa.array(pos[keep].astype(np.int64)),
                "part": pa.array(part),
            }
        )

    def assemble(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["term", id_col, "pos"], kind="stable")
        out = (
            g.groupby(["term", id_col], sort=False)["pos"]
            .agg(list)
            .reset_index()
            .rename(columns={"pos": "positions"})
        )
        return out

    return (
        docs.map_batches(explode, batch_format="pyarrow")
        .groupby("part")
        .map_groups(assemble, batch_format="pandas")
    )


# -- postings compression (delta + varint) -------------------------------------

def _varint_encode_flat(vals):
    """LEB128-encode a flat uint64 array in fully vectorized numpy: per-value
    byte counts via 9 range compares (exact — no float log), bytes written
    with one masked scatter per byte position (≤10 passes total, each a
    whole-array numpy op). Returns (flat uint8 bytes, int64 value->byte
    offset prefix including the total) so callers can slice per-group
    payloads zero-copy."""
    import numpy as np

    v = vals.astype(np.uint64)
    nb = np.ones(len(v), np.int64)
    for k in range(1, 10):
        nb += (v >= np.uint64(1) << np.uint64(7 * k)).astype(np.int64)
    ends = np.cumsum(nb)
    off = np.concatenate([[0], ends]).astype(np.int64)
    out = np.zeros(int(ends[-1]) if len(ends) else 0, np.uint8)
    for j in range(10):
        m = nb > j
        if not m.any():
            break
        byte = (v[m] >> np.uint64(7 * j)) & np.uint64(0x7F)
        cont = (nb[m] - 1 > j).astype(np.uint8) << 7
        out[off[:-1][m] + j] = byte.astype(np.uint8) | cont
    return out, off


def _varint_decode_flat(buf):
    """Inverse of `_varint_encode_flat` on one flat byte stream, fully
    vectorized: terminator bytes (high bit clear) mark value ends; each
    byte's 7-bit payload shifts by its offset within its value and a
    reduceat per value sums the parts."""
    import numpy as np

    b = np.frombuffer(buf, np.uint8)
    if not len(b):
        return np.empty(0, np.uint64)
    is_end = (b & 0x80) == 0
    val_id = np.concatenate([[0], np.cumsum(is_end[:-1])])
    starts = np.concatenate([[0], np.nonzero(is_end)[0][:-1] + 1])
    within = np.arange(len(b)) - starts[val_id]
    parts = (b & 0x7F).astype(np.uint64) << (7 * within.astype(np.uint64))
    return np.add.reduceat(parts, starts)


def encode_postings_varint(tf_ds, id_col: str = "doc_id"):
    """Compress (term, doc_id, tf, dl) postings into per-term delta+varint
    payloads — the storage format every production inverted index uses
    (doc ids are sorted per term, so gaps are small and varint bytes beat
    raw int64 ~5-8x; the reference's in-memory array-of-structs index,
    `Serial Version/include/index.h:20-32`, pays 16 bytes/posting).

    Output: one row per term — (term, n, doc_bytes, tf_bytes, dl_bytes)
    with binary payloads. Scale shape: ONE hash(term)%64 co-location;
    inside each partition the sort, delta, and all three varint streams
    are whole-partition numpy ops, and the per-term payload slicing is a
    zero-copy Arrow BinaryArray build from (offsets, flat buffer) — no
    per-term Python. `decode_postings_varint` restores the exact rows."""
    import numpy as np
    import pandas as pd

    N_PARTS = 64

    def with_part(b: pa.Table) -> pa.Table:
        terms = b["term"].to_numpy(zero_copy_only=False)
        if terms.dtype.kind == "U":
            terms = terms.astype(object)
        part = (
            pd.util.hash_array(terms, categorize=False) % N_PARTS
        ).astype(np.int32)
        return b.append_column("part", pa.array(part))

    def binary_from_offsets(flat: "np.ndarray", off: "np.ndarray", starts):
        # group g's payload = flat[off[starts[g]] : off[starts[g+1]]]
        group_off = off[starts].astype(np.int64)
        return pa.LargeBinaryArray.from_buffers(
            pa.large_binary(),
            len(group_off) - 1,
            [None, pa.py_buffer(group_off.tobytes()),
             pa.py_buffer(flat.tobytes())],
        )

    def encode_part(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["term", id_col], kind="stable")
        terms = g["term"].to_numpy()
        ids = g[id_col].to_numpy().astype(np.int64)
        new_term = np.concatenate(
            [[True], terms[1:] != terms[:-1]]
        ) if len(g) else np.empty(0, bool)
        starts = np.nonzero(new_term)[0]
        # delta within term runs; run heads keep their absolute id
        deltas = np.diff(ids, prepend=0)
        deltas[starts] = ids[starts]
        all_starts = np.concatenate([starts, [len(g)]]).astype(np.int64)
        enc = {}
        for name, vals in (
            ("doc_bytes", deltas),
            ("tf_bytes", g["tf"].to_numpy().astype(np.int64)),
            ("dl_bytes", g["dl"].to_numpy().astype(np.int64)),
        ):
            flat, off = _varint_encode_flat(vals)
            enc[name] = binary_from_offsets(flat, off, all_starts)
        n = np.diff(all_starts)
        return pd.DataFrame(
            {
                "term": terms[starts],
                "n": n.astype(np.int64),
                "doc_bytes": enc["doc_bytes"].to_pandas(),
                "tf_bytes": enc["tf_bytes"].to_pandas(),
                "dl_bytes": enc["dl_bytes"].to_pandas(),
            }
        )

    return (
        tf_ds.map_batches(with_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(encode_part, batch_format="pandas")
    )


def decode_postings_varint(enc_ds, id_col: str = "doc_id"):
    """Exact inverse of `encode_postings_varint`: each batch decodes ALL
    its payloads in three flat vectorized passes (payload bytes concat →
    one `_varint_decode_flat` per stream → per-term cumsum undoes the
    delta), restoring (term, doc_id, tf, dl) bit-exactly — the roundtrip
    is oracle-checked against the plain term_doc_tf SQL."""
    import numpy as np

    def decode(b: pa.Table) -> pa.Table:
        n = b["n"].to_numpy(zero_copy_only=False).astype(np.int64)
        total = int(n.sum())
        term = np.repeat(b["term"].to_numpy(zero_copy_only=False), n)
        streams = {}
        for name in ("doc_bytes", "tf_bytes", "dl_bytes"):
            flat = b"".join(
                m or b"" for m in b[name].to_pylist()
            )
            streams[name] = _varint_decode_flat(flat).astype(np.int64)
        ids = streams["doc_bytes"]
        if total:
            starts = np.concatenate([[0], np.cumsum(n)[:-1]])
            grp = np.repeat(np.arange(len(n)), n)
            csum = np.cumsum(ids)
            base = np.concatenate([[0], csum[starts[1:] - 1]]) if len(n) > 1 else np.array([0])
            ids = csum - base[grp]
        return pa.table(
            {
                "term": pa.array(term, pa.string()),
                id_col: pa.array(ids, pa.int64()),
                "tf": pa.array(streams["tf_bytes"]),
                "dl": pa.array(streams["dl_bytes"]),
            }
        )

    return enc_ds.map_batches(decode, batch_format="pyarrow")


# -- atomic index publish (blue/green swap) ------------------------------------

def publish_index(root_dir: str, staging_dir: str) -> str:
    """Zero-downtime index publish: move a fully-built staging index (any
    `write_term_index` layout, post-update/compact) into a versioned slot
    under ``root_dir`` and atomically repoint ``CURRENT`` at it — the
    blue/green swap that lets a 100-TB reindex build for hours while
    serving continues on the previous version, then cut over in one
    rename. Readers resolve through `current_index_dir`; a crash anywhere
    leaves either the old pointer (staging slot ignorable) or the new one
    (old version garbage-collectable) — never a half-visible index.
    Returns the published version directory."""
    import os

    from ..sources.io import read_manifest

    if read_manifest(staging_dir) is None:
        raise FileNotFoundError(f"no index manifest under {staging_dir}")
    os.makedirs(root_dir, exist_ok=True)
    existing = [
        int(d.split("=", 1)[1])
        for d in os.listdir(root_dir)
        if d.startswith("version=") and d.split("=", 1)[1].isdigit()
    ]
    ver = max(existing, default=0) + 1
    dst = os.path.join(root_dir, f"version={ver}")
    os.rename(staging_dir, dst)  # same-filesystem move: atomic, no copy
    tmp = os.path.join(root_dir, f".CURRENT.tmp.{ver}")
    with open(tmp, "w") as f:
        f.write(f"version={ver}\n")
    os.replace(tmp, os.path.join(root_dir, "CURRENT"))
    return dst


def current_index_dir(root_dir: str) -> str | None:
    """Resolve the live index version under a `publish_index` root (None
    when nothing is published yet)."""
    import os

    p = os.path.join(root_dir, "CURRENT")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        slot = f.read().strip()
    d = os.path.join(root_dir, slot)
    return d if os.path.isdir(d) else None


def gc_index_versions(root_dir: str, keep: int = 2) -> list[str]:
    """Drop all but the newest ``keep`` published versions (never the
    CURRENT one) — the cleanup half of the blue/green cycle. Returns the
    removed directories."""
    import os
    import shutil

    cur = current_index_dir(root_dir)
    vers = sorted(
        (
            d
            for d in os.listdir(root_dir)
            if d.startswith("version=") and d.split("=", 1)[1].isdigit()
        ),
        key=lambda d: int(d.split("=", 1)[1]),
    )
    removed = []
    for d in vers[:-keep] if keep else vers:
        full = os.path.join(root_dir, d)
        if cur and os.path.samefile(full, cur):
            continue
        shutil.rmtree(full)
        removed.append(full)
    return removed


# -- trigram substring index (grep-style LIKE '%needle%' serving) -------------

def _doc_trigrams(b: pa.Table, id_col: str, text_col: str):
    """DISTINCT (gram, doc_id) pairs for every 3-byte window of every doc —
    fully vectorized: one concatenated byte buffer, stride-tricked 3-gram
    view, cross-document windows masked by offset arithmetic. ASCII corpus
    ⇒ byte windows == char windows (the same assumption dup_substrings
    documents)."""
    import numpy as np
    import pandas as pd

    texts = pc.fill_null(b[text_col], "").to_pylist()
    ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    joined = "".join(texts).encode("utf-8", "surrogatepass")
    lens = np.fromiter((len(t.encode("utf-8", "surrogatepass")) for t in texts),
                       np.int64, len(texts))
    buf = np.frombuffer(joined, np.uint8)
    if buf.size < 3:
        return pd.DataFrame({"gram": [], id_col: []})
    # 3-gram windows as one int32 code per position: b0<<16 | b1<<8 | b2
    codes = (
        buf[:-2].astype(np.int64) << 16
    ) | (buf[1:-1].astype(np.int64) << 8) | buf[2:].astype(np.int64)
    starts = np.concatenate([[0], np.cumsum(lens)[:-1]])
    owner = np.repeat(np.arange(len(texts)), lens)[: len(codes)]
    # a window starting < 2 bytes before its doc's end stays in-doc
    ends = (starts + lens)[owner]
    pos = np.arange(len(codes))
    keep = pos + 3 <= ends
    d = pd.DataFrame({"gram": codes[keep], id_col: ids[owner[keep]]})
    return d.drop_duplicates()


def _needle_grams(needle: str):
    import numpy as np

    nb = np.frombuffer(needle.encode("utf-8", "surrogatepass"), np.uint8)
    codes = (
        nb[:-2].astype(np.int64) << 16
    ) | (nb[1:-1].astype(np.int64) << 8) | nb[2:].astype(np.int64)
    return np.unique(codes)


def write_trigram_index(
    docs,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
) -> dict:
    """Persist a TRIGRAM SUBSTRING index — the grep/code-search structure
    (Google Code Search's design): distinct (3-gram, doc_id) postings
    hash-partitioned by gram, so an arbitrary `LIKE '%needle%'` query
    reads only the needle's ≤ len-2 grams' buckets, intersects doc-id
    lists, and exact-verifies the bounded candidate set — never a corpus
    scan. Build cost is one vectorized pass (stride-tricked windows, no
    per-doc Python); postings are fixed-width (int32-coded gram, int64
    doc). Returns the manifest."""
    import shutil

    import numpy as np
    import pandas as pd

    from ..sources.io import write_manifest

    shutil.rmtree(out_dir, ignore_errors=True)

    def explode(b: pa.Table) -> pa.Table:
        d = _doc_trigrams(b, id_col, text_col)
        gram = d["gram"].to_numpy().astype(np.int64)
        bucket = (gram * np.int64(2654435761) % n_buckets).astype(np.int64)
        return pa.table(
            {
                "gram": pa.array(gram),
                id_col: pa.array(d[id_col].to_numpy().astype(np.int64)),
                "bucket": pa.array(bucket),
            }
        )

    ds = docs.map_batches(explode, batch_format="pyarrow")
    ds.write_parquet(f"{out_dir}/postings", partition_cols=["bucket"])
    payload = {"n_docs": int(docs.count()), "n_buckets": int(n_buckets)}
    write_manifest(out_dir, payload)
    return payload


def trigram_substring_search(
    docs,
    index_dir: str,
    needle: str,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Serve `text LIKE '%needle%'` from a `write_trigram_index` layout:
    read ONLY the needle grams' bucket files (gram IN (...) pushed into
    the parquet scan), intersect via one groupby (a doc qualifies iff it
    holds ALL K distinct needle grams — postings are distinct pairs, so
    count == K is the intersection), then exact-verify just the candidate
    docs with one vectorized match_substring pass — false candidates
    (grams present but scattered) die there. Returns (doc_id) rows equal
    to the full-scan LIKE. Needles shorter than 3 bytes fall back to the
    vectorized scan."""
    import glob

    import numpy as np
    import pyarrow.dataset as pads
    import ray
    import ray.data as rd

    from ..sources.io import read_manifest

    def scan_fallback():
        def f(b: pa.Table) -> pa.Table:
            m = pc.match_substring(pc.fill_null(b[text_col], ""), needle)
            return pa.table({id_col: b[id_col].filter(m)})

        return docs.map_batches(f, batch_format="pyarrow")

    grams = _needle_grams(needle)
    if grams.size == 0:
        return scan_fallback()
    man = read_manifest(index_dir)
    if man is None:
        raise FileNotFoundError(f"no index manifest under {index_dir}")
    n_buckets = int(man["n_buckets"])
    buckets = sorted(set((grams * np.int64(2654435761) % n_buckets).tolist()))
    paths = [
        f
        for b in buckets
        for f in sorted(glob.glob(f"{index_dir}/postings/bucket={b}/*.parquet"))
    ]
    if not paths:
        return pa.table({id_col: pa.array([], pa.int64())})
    K = int(grams.size)
    hits = rd.read_parquet(
        paths,
        columns=["gram", id_col],
        filter=pads.field("gram").isin(grams.tolist()),
    )
    cand = (
        hits.groupby(id_col)
        .count()
        .map_batches(
            lambda b: pa.table(
                {id_col: b[id_col].filter(pc.equal(b["count()"], K))}
            ),
            batch_format="pyarrow",
        )
        .take_all()
    )  # bounded: docs holding every needle gram
    if not cand:
        return pa.table({id_col: pa.array([], pa.int64())})
    ids = np.sort(np.array([r[id_col] for r in cand], np.int64))
    ids_ref = ray.put(ids)

    def verify(b: pa.Table) -> pa.Table:
        wanted = ray.get(ids_ref)
        got = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.clip(np.searchsorted(wanted, got), 0, wanted.size - 1)
        pre = b.filter(pa.array(wanted[pos] == got))
        m = pc.match_substring(pc.fill_null(pre[text_col], ""), needle)
        return pa.table({id_col: pre[id_col].filter(m)})

    return docs.map_batches(verify, batch_format="pyarrow")


# -- incremental materialized-view maintenance ---------------------------------

def incremental_source_stats(
    docs_old,
    docs_new,
    base_stats=None,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str = "source",
):
    """Materialized-view DELTA maintenance: keep a per-``group_col``
    (n_docs, total kept tokens) rollup current under a corpus snapshot
    change WITHOUT re-aggregating the new snapshot — the aggregate
    counterpart of `update_term_index` (index) and `merge_upsert` (rows).
    `corpus_diff` classifies the churn; only removed/changed OLD rows
    (negative partials) and added/changed NEW rows (positive partials)
    are ever tokenized, so maintenance cost is O(churn) while the result
    equals the full v2 re-aggregation exactly (integer partials — no
    float drift). ``base_stats`` is the existing rollup (computed here
    from v1 when not supplied)."""
    import numpy as np
    import ray
    from ray.data.aggregate import Sum

    from .dedup import corpus_diff

    def stats_of(ds, sign: int):
        def partial(b: pa.Table) -> pa.Table:
            tok = tokenize_batch(b, id_col, text_col)
            # per-doc kept-token counts, then re-attach the group
            dl = tok.group_by("doc_id").aggregate([([], "count_all")])
            dl_ids = dl["doc_id"].to_numpy(zero_copy_only=False)
            ids = b[id_col].to_numpy(zero_copy_only=False)
            order = np.argsort(ids)
            pos = order[np.searchsorted(ids[order], dl_ids)]
            toks = np.zeros(len(ids), np.int64)
            toks[pos] = dl["count_all"].to_numpy(zero_copy_only=False)
            t = pa.table(
                {
                    group_col: b[group_col],
                    "n_docs": pa.array(np.full(len(ids), sign, np.int64)),
                    "total_tokens": pa.array(sign * toks),
                }
            )
            agg = t.group_by(group_col).aggregate(
                [("n_docs", "sum"), ("total_tokens", "sum")]
            )
            # select by name: Arrow group_by emits aggregates before keys
            return pa.table(
                {
                    group_col: agg[group_col],
                    "n_docs": agg["n_docs_sum"],
                    "total_tokens": agg["total_tokens_sum"],
                }
            )

        return ds.map_batches(partial, batch_format="pyarrow")

    if base_stats is None:
        base_stats = stats_of(docs_old, +1)

    diff = corpus_diff(docs_old, docs_new, id_col=id_col, text_col=text_col)
    churn = diff.map_batches(
        lambda b: b.filter(pc.not_equal(b["status"], "unchanged")),
        batch_format="pyarrow",
    ).take_all()  # churn-bounded by assumption (see update_term_index)
    dead = np.sort(np.array(
        [r["doc_id"] for r in churn if r["status"] in ("removed", "changed")],
        np.int64))
    fresh = np.sort(np.array(
        [r["doc_id"] for r in churn if r["status"] in ("added", "changed")],
        np.int64))

    def keep_ids(arr):
        ref = ray.put(arr)

        def f(b: pa.Table) -> pa.Table:
            wanted = ray.get(ref)
            ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            pos = np.clip(np.searchsorted(wanted, ids), 0, max(wanted.size - 1, 0))
            return b.filter(pa.array(wanted[pos] == ids))

        return f

    parts = [base_stats]
    if dead.size:
        parts.append(stats_of(
            docs_old.map_batches(keep_ids(dead), batch_format="pyarrow"), -1))
    if fresh.size:
        parts.append(stats_of(
            docs_new.map_batches(keep_ids(fresh), batch_format="pyarrow"), +1))
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.union(p)
    out = merged.groupby(group_col).aggregate(
        Sum("n_docs", alias_name="n_docs"),
        Sum("total_tokens", alias_name="total_tokens"),
    )
    # groups whose docs all left the corpus cancel to zero — drop them
    return out.map_batches(
        lambda b: b.filter(pc.greater(b["n_docs"], 0)),
        batch_format="pyarrow",
    )
