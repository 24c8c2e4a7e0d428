"""Interleaved-document (spans) operators — the input-table shape of the
north rule: ``(doc_id: string, spans: list<struct<kind: string, text: string,
media_ref: string, offset: int32>>)``.

The crawl engine EMITS this shape (`pipelines/refcrawler.py:224-228`,
`functions/htmltext.html_to_spans`); this module provides the operators that
CONSUME it: explode to a flat span table, per-document kind statistics, the
media work-list (manifest of media_refs to fetch next), and linear-text
reconstruction so every text operator in `pipelines/text.py` can run over an
interleaved corpus.

``docs_to_interleaved`` is the deterministic small-scale synthesiser the
brief mandates ("synthesise it deterministically at small scale"): it turns
the flat ``documents`` test table into the interleaved shape with a closed
form a SQL oracle can mirror exactly (fixed-width word chunks + a media span
for every ``doc_id % 3 == 0`` doc), so the whole family is value-checked
against DuckDB, not just rows-only.

Scale shape: every operator here is a single block-local ``map_batches``
over zero-copy Arrow — no shuffle — except ``media_manifest``, which does a
partial per-block count and then a groupby over the (small) distinct-ref
space. Span structs are never converted to Python objects; the nested
column is processed via ``list_flatten`` / ``list_parent_indices`` plus
numpy offset arithmetic.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Span kinds that carry no document text. Everything else ("text" in the
# synthetic corpus; "title"/"h1"/"h2"/"p" in crawl output) is text-bearing,
# so these operators work unchanged on crawl-emitted interleaved docs.
NON_TEXT_KINDS = ("media", "link")

SPAN_TYPE = pa.list_(
    pa.struct(
        [
            ("kind", pa.string()),
            ("text", pa.string()),
            ("media_ref", pa.string()),
            ("offset", pa.int32()),
        ]
    )
)

# Synthesis constants — mirrored literally in the oracle SQL
# (__ray_entry__.oracle_sql: span_explode / span_kind_stats / media_manifest).
WORDS_PER_SPAN = 8
MEDIA_EVERY = 3  # docs with doc_id % MEDIA_EVERY == 0 get one media span
MEDIA_MOD = 97  # media_ref = "media/img{doc_id % MEDIA_MOD}.jpg"

# Fixed per-media-span placeholder budget for token accounting — the "one
# image costs K sequence positions" convention of multimodal training
# recipes. Mirrored literally by the interleaved_token_counts oracle.
MEDIA_TOKEN_BUDGET = 64


def docs_to_interleaved(docs, words_per_span: int = WORDS_PER_SPAN):
    """(doc_id:int64, text) -> the north-rule interleaved shape.

    Deterministic: text spans are consecutive ``words_per_span``-word chunks
    (split on single space, order preserved), each with ``media_ref=""`` and
    ``offset`` = span ordinal; docs with ``doc_id % 3 == 0`` get one media
    span appended (``text=""``, ``media_ref="media/img{doc_id%97}.jpg"``).
    Pure per-batch Arrow+numpy; chunks exactly tile the word sequence, so
    the chunk list-array offsets are just every W-th word boundary.
    """
    W = int(words_per_span)

    def build(b: pa.Table) -> pa.Table:
        did_raw = b["doc_id"].combine_chunks()
        did = pc.cast(did_raw, pa.string())
        txt = pc.fill_null(b["text"].combine_chunks(), "")
        words = pc.split_pattern(txt, " ")
        flat_words = pc.list_flatten(words)
        if isinstance(flat_words, pa.ChunkedArray):
            flat_words = flat_words.combine_chunks()
        wcounts = pc.list_value_length(words).to_numpy().astype(np.int64)
        n = len(wcounts)
        word_starts = np.zeros(n + 1, np.int64)
        np.cumsum(wcounts, out=word_starts[1:])

        n_chunks = (wcounts + W - 1) // W  # >=1: split("") yields [""]
        total_chunks = int(n_chunks.sum())
        first_chunk = np.cumsum(n_chunks) - n_chunks
        doc_of_chunk = np.repeat(np.arange(n), n_chunks)
        chunk_rank = np.arange(total_chunks) - first_chunk[doc_of_chunk]
        chunk_start = word_starts[doc_of_chunk] + chunk_rank * W
        # chunks tile the words exactly, so starts + final total are valid
        # monotone list offsets
        chunk_offsets = np.append(chunk_start, word_starts[n]).astype(np.int32)
        chunk_list = pa.ListArray.from_arrays(
            pa.array(chunk_offsets, pa.int32()), flat_words
        )
        chunk_text = pc.binary_join(chunk_list, " ")

        ids_np = did_raw.to_numpy(zero_copy_only=False).astype(np.int64)
        has_media = ids_np % MEDIA_EVERY == 0
        spans_per_doc = n_chunks + has_media.astype(np.int64)
        total_spans = int(spans_per_doc.sum())
        first_span = np.cumsum(spans_per_doc) - spans_per_doc
        doc_of_span = np.repeat(np.arange(n), spans_per_doc)
        span_rank = np.arange(total_spans) - first_span[doc_of_span]
        is_media = span_rank == n_chunks[doc_of_span]  # only where has_media

        kind = pa.array(np.where(is_media, "media", "text"))
        # text column: take from chunk_text, media rows point at a sentinel ""
        text_ext = pa.concat_arrays(
            [chunk_text, pa.array([""], type=chunk_text.type)]
        )
        tidx = np.empty(total_spans, np.int64)
        tidx[~is_media] = np.arange(total_chunks)
        tidx[is_media] = total_chunks
        span_text = text_ext.take(pa.array(tidx))

        media_ids = (ids_np[has_media] % MEDIA_MOD).astype("U")
        refs_np = np.char.add(np.char.add("media/img", media_ids), ".jpg")
        ref_ext = pa.concat_arrays(
            [pa.array(refs_np, pa.string()), pa.array([""], pa.string())]
        )
        ridx = np.full(total_spans, len(media_ids), np.int64)
        # one media span per doc, emitted in doc order == is_media order
        ridx[is_media] = np.arange(len(media_ids))
        span_ref = ref_ext.take(pa.array(ridx))

        struct = pa.StructArray.from_arrays(
            [
                kind.cast(pa.string()),
                span_text.cast(pa.string()),
                span_ref,
                pa.array(span_rank.astype(np.int32), pa.int32()),
            ],
            ["kind", "text", "media_ref", "offset"],
        )
        list_offsets = np.append(first_span, total_spans).astype(np.int32)
        spans_col = pa.ListArray.from_arrays(
            pa.array(list_offsets, pa.int32()), struct
        )
        return pa.table({"doc_id": did, "spans": spans_col})

    return docs.map_batches(build, batch_format="pyarrow")


def _flat(b: pa.Table):
    """(parent_indices ndarray, flattened struct array) for a spans batch."""
    lst = b["spans"].combine_chunks()
    parent = pc.list_parent_indices(lst).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(lst)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    return parent, flat


def explode_spans(inter):
    """Interleaved -> flat (doc_id, kind, text, media_ref, offset) span
    table. Zero-copy flatten per block; offset cast to int64 for oracle
    comparability (DuckDB arithmetic yields BIGINT)."""

    def ex(b: pa.Table) -> pa.Table:
        parent, flat = _flat(b)
        return pa.table(
            {
                "doc_id": b["doc_id"].combine_chunks().take(pa.array(parent)),
                "kind": flat.field("kind"),
                "text": flat.field("text"),
                "media_ref": flat.field("media_ref"),
                "offset": flat.field("offset").cast(pa.int64()),
            }
        )

    return inter.map_batches(ex, batch_format="pyarrow")


def span_kind_stats(inter):
    """Per-doc (doc_id, n_text_spans, n_media_spans, n_chars) where n_chars
    is the reconstructed linear text length (chunk chars + single-space
    separators) — equal to the original document length by construction.
    Block-local bincounts; no shuffle."""

    def stats(b: pa.Table) -> pa.Table:
        parent, flat = _flat(b)
        n = len(b)
        is_text = ~pc.is_in(
            flat.field("kind"), value_set=pa.array(NON_TEXT_KINDS)
        ).to_numpy(zero_copy_only=False)
        is_media = pc.equal(flat.field("kind"), "media").to_numpy(
            zero_copy_only=False
        )
        tl = pc.utf8_length(flat.field("text")).to_numpy(zero_copy_only=False)
        n_text = np.bincount(parent[is_text], minlength=n).astype(np.int64)
        n_media = np.bincount(parent[is_media], minlength=n).astype(np.int64)
        chars = np.bincount(
            parent, weights=tl * is_text, minlength=n
        ).astype(np.int64)
        n_chars = chars + np.maximum(n_text - 1, 0)
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "n_text_spans": pa.array(n_text, pa.int64()),
                "n_media_spans": pa.array(n_media, pa.int64()),
                "n_chars": pa.array(n_chars, pa.int64()),
            }
        )

    return inter.map_batches(stats, batch_format="pyarrow")


def reconstruct_text(inter):
    """Interleaved -> (doc_id, text): join text-bearing span chunks per doc
    with a single space, in span order. Round-trips ``docs_to_interleaved``
    exactly (oracle: SELECT doc_id, text FROM documents). Block-local —
    a doc's spans live in one row, so no shuffle is ever needed."""

    def recon(b: pa.Table) -> pa.Table:
        parent, flat = _flat(b)
        mask = pc.invert(
            pc.is_in(flat.field("kind"), value_set=pa.array(NON_TEXT_KINDS))
        )
        mask_np = mask.to_numpy(zero_copy_only=False)
        texts = flat.field("text").filter(mask)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        tparent = parent[mask_np]
        n_text = np.bincount(tparent, minlength=len(b))
        offsets = np.append(np.cumsum(n_text) - n_text, len(texts)).astype(
            np.int32
        )
        lst = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), texts)
        return pa.table(
            {"doc_id": b["doc_id"], "text": pc.binary_join(lst, " ")}
        )

    return inter.map_batches(recon, batch_format="pyarrow")


def interleaved_token_counts(inter, media_budget: int = MEDIA_TOKEN_BUDGET):
    """Per-doc multimodal training-cost accounting over the interleaved
    shape: ``(doc_id, n_text_tokens, n_media_spans, n_tokens_total)`` where
    text tokens are whitespace tokens summed over text spans and every
    media span charges a fixed ``media_budget`` placeholder positions —
    the sequence-budget arithmetic a packing/sharding stage consumes.
    Block-local bincounts over zero-copy Arrow; no shuffle."""

    def acct(b: pa.Table) -> pa.Table:
        parent, flat = _flat(b)
        n = len(b)
        is_text = ~pc.is_in(
            flat.field("kind"), value_set=pa.array(NON_TEXT_KINDS)
        ).to_numpy(zero_copy_only=False)
        is_media = pc.equal(flat.field("kind"), "media").to_numpy(
            zero_copy_only=False
        )
        tok = pc.count_substring_regex(flat.field("text"), r"\S+").to_numpy(
            zero_copy_only=False
        )
        n_tok = np.bincount(
            parent, weights=tok * is_text, minlength=n
        ).astype(np.int64)
        n_media = np.bincount(parent[is_media], minlength=n).astype(np.int64)
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "n_text_tokens": pa.array(n_tok, pa.int64()),
                "n_media_spans": pa.array(n_media, pa.int64()),
                "n_tokens_total": pa.array(
                    n_tok + media_budget * n_media, pa.int64()
                ),
            }
        )

    return inter.map_batches(acct, batch_format="pyarrow")


def _span_drops(inter, n_parts: int = 64):
    """Materialized (doc_id, offset) DROP list for span-level exact dedup:
    every text-span occurrence that is NOT the globally first occurrence
    of its exact text (ordered by (doc_id, offset)). Only
    (md5, doc_id, offset) rows shuffle, grouped by a bounded partition key
    — shared by ``span_dedup`` and ``span_dedup_structured``."""
    import hashlib

    import pandas as pd

    def occurrences(b: pa.Table) -> pa.Table:
        parent, flat = _flat(b)
        is_text = pc.invert(
            pc.is_in(flat.field("kind"), value_set=pa.array(NON_TEXT_KINDS))
        )
        mask = is_text.to_numpy(zero_copy_only=False)
        texts = flat.field("text").filter(is_text).to_pylist()
        hs = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]
        dids = b["doc_id"].combine_chunks().take(pa.array(parent[mask]))
        offs = flat.field("offset").filter(is_text).cast(pa.int64())
        part = (
            pd.util.hash_array(np.asarray(hs, dtype=object)) % n_parts
        ).astype(np.int32)
        return pa.table(
            {
                "h": pa.array(hs, pa.string()),
                "doc_id": dids,
                "offset": offs,
                "part": pa.array(part),
            }
        )

    def drops_part(g: pd.DataFrame) -> pd.DataFrame:
        # all md5 runs of one partition, first-(doc_id, offset) kept,
        # vectorized
        g = g.sort_values(["h", "doc_id", "offset"], kind="stable")
        h = g["h"].to_numpy()
        first = np.ones(len(g), dtype=bool)
        first[1:] = h[1:] != h[:-1]
        return g.loc[~first, ["doc_id", "offset"]]

    return (
        inter.map_batches(occurrences, batch_format="pyarrow")
        .groupby("part")
        .map_groups(drops_part, batch_format="pandas")
        .materialize()
    )


def span_dedup(
    inter,
    n_parts: int = 64,
    drop_broadcast_spans: int = 2_000_000,
):
    """CCNet-style span-level exact dedup over the interleaved corpus.

    A text span SURVIVES iff it is the globally FIRST occurrence of its
    exact text, occurrences ordered by ``(doc_id, offset)`` (doc_id
    lexicographic — the interleaved contract's id type is string). Media
    spans carry no text and never participate. Returns one row per doc:
    ``(doc_id, kept_text, n_kept, n_dropped)`` where ``kept_text`` is the
    surviving text spans joined by a single space in span order and the
    counts cover text spans only. This is the paragraph-level dedup pass of
    a CCNet-style curation pipeline (drop boilerplate lines repeated across
    pages) re-expressed over the north-rule interleaved shape.

    Scale shape — span text never enters the duplicate-detection shuffle:
      1. occurrence rows ``(md5(text), doc_id, offset)`` exchange grouped by
         a BOUNDED partition key (``hash(md5) % n_parts``; all hash runs of
         a partition resolved vectorized — the measured per-group-tax
         rationale of ``dedup.minhash_lsh_pairs``);
      2. the resulting DROP list holds only duplicate occurrences. At or
         below ``drop_broadcast_spans`` rows it broadcasts once via
         ``ray.put`` and both the span filter and the per-doc
         reconstruction are block-local (a doc's spans live in one row);
      3. above the threshold the fully-distributed path applies: exploded
         text spans left-join the drop list on ``(doc_id, offset)``
         (hash-shuffle ``Dataset.join``), then a partition-grouped per-doc
         reassembly — the same cost policy as ``dedup.dedup_keep_first``.
    Both paths return identical rows; a test forces the join path.
    """
    import pandas as pd
    import ray

    drops = _span_drops(inter, n_parts)

    if drops.count() <= drop_broadcast_spans:
        key_chunks = [
            pc.binary_join_element_wise(
                t["doc_id"].combine_chunks().cast(pa.string()),
                t["offset"].combine_chunks().cast(pa.string()),
                "\x1f",
            )
            for t in drops.iter_batches(batch_format="pyarrow", batch_size=None)
            if t.num_rows
        ]
        drop_ref = ray.put(
            pa.concat_arrays(key_chunks)
            if key_chunks
            else pa.array([], pa.string())
        )

        def apply_drops(b: pa.Table) -> pa.Table:
            parent, flat = _flat(b)
            n = len(b)
            is_text = pc.invert(
                pc.is_in(flat.field("kind"), value_set=pa.array(NON_TEXT_KINDS))
            )
            did_span = b["doc_id"].combine_chunks().take(pa.array(parent))
            keys = pc.binary_join_element_wise(
                pc.cast(did_span, pa.string()),
                pc.cast(flat.field("offset").cast(pa.int64()), pa.string()),
                "\x1f",
            )
            dup = pc.and_(
                is_text, pc.is_in(keys, value_set=ray.get(drop_ref))
            ).to_numpy(zero_copy_only=False)
            text_np = is_text.to_numpy(zero_copy_only=False)
            n_text = np.bincount(parent[text_np], minlength=n).astype(np.int64)
            n_dropped = np.bincount(parent[dup], minlength=n).astype(np.int64)
            keep = text_np & ~dup
            texts = flat.field("text").filter(pa.array(keep))
            if isinstance(texts, pa.ChunkedArray):
                texts = texts.combine_chunks()
            kept_per_doc = np.bincount(parent[keep], minlength=n)
            offsets = np.append(
                np.cumsum(kept_per_doc) - kept_per_doc, len(texts)
            ).astype(np.int32)
            lst = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), texts)
            return pa.table(
                {
                    "doc_id": b["doc_id"],
                    "kept_text": pc.binary_join(lst, " "),
                    "n_kept": pa.array(n_text - n_dropped, pa.int64()),
                    "n_dropped": pa.array(n_dropped, pa.int64()),
                }
            )

        return inter.map_batches(apply_drops, batch_format="pyarrow")

    # distributed path: exploded text spans left-join the drop list, then a
    # partition-grouped per-doc reassembly (only text spans + drop markers
    # shuffle; media spans are excluded by construction here)
    def explode_text(b: pa.Table) -> pa.Table:
        parent, flat = _flat(b)
        is_text = pc.invert(
            pc.is_in(flat.field("kind"), value_set=pa.array(NON_TEXT_KINDS))
        )
        mask = is_text.to_numpy(zero_copy_only=False)
        dids = b["doc_id"].combine_chunks().take(pa.array(parent[mask]))
        return pa.table(
            {
                "doc_id": dids,
                "offset": flat.field("offset").filter(is_text).cast(pa.int64()),
                "text": flat.field("text").filter(is_text),
            }
        )

    marked_drops = drops.map_batches(
        lambda b: b.append_column(
            "__dup", pa.array(np.ones(b.num_rows, np.int8))
        ),
        batch_format="pyarrow",
    )
    cpus = (
        int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    )
    npart = max(2, cpus // 2)
    joined = inter.map_batches(explode_text, batch_format="pyarrow").join(
        marked_drops.repartition(npart),
        join_type="left_outer",
        num_partitions=npart,
        on=("doc_id", "offset"),
    )

    def with_doc_part(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        if ids.dtype.kind == "U":
            ids = ids.astype(object)
        part = (pd.util.hash_array(ids, categorize=False) % n_parts).astype(
            np.int32
        )
        return b.append_column("dpart", pa.array(part))

    def rebuild_part(g: pd.DataFrame) -> pd.DataFrame:
        if not len(g):
            return pd.DataFrame(
                {
                    "doc_id": pd.Series([], dtype=object),
                    "kept_text": pd.Series([], dtype=object),
                    "n_kept": pd.Series([], dtype=np.int64),
                    "n_dropped": pd.Series([], dtype=np.int64),
                }
            )
        idx = np.lexsort((g["offset"].to_numpy(), g["doc_id"].to_numpy()))
        dids = g["doc_id"].to_numpy()[idx]
        dup = g["__dup"].notna().to_numpy()[idx]
        texts = g["text"].to_numpy()[idx]
        uniq, starts = np.unique(dids, return_index=True)
        counts = np.diff(np.append(starts, len(dids)))
        n_kept = np.add.reduceat((~dup).astype(np.int64), starts)
        keep = ~dup
        k_texts = pa.array(texts[keep].astype(object), pa.string())
        offsets = np.append(np.cumsum(n_kept) - n_kept, int(keep.sum())).astype(
            np.int32
        )
        lst = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), k_texts)
        return pd.DataFrame(
            {
                "doc_id": uniq,
                "kept_text": pc.binary_join(lst, " ").to_pandas().to_numpy(),
                "n_kept": n_kept,
                "n_dropped": counts - n_kept,
            }
        )

    return (
        joined.map_batches(with_doc_part, batch_format="pyarrow")
        .groupby("dpart")
        .map_groups(rebuild_part, batch_format="pandas")
    )


def media_context_pairs(inter, window: int = 1):
    """(doc_id, media_ref, context): one row per media span with the text
    of its neighboring spans (span offsets within ``window``) joined in
    span order — the image-text pair extraction a CLIP-style multimodal
    training pipeline runs over interleaved documents (the adjacent text
    stands in for caption/alt-text). Media spans with no text neighbor get
    ``context=""``.

    Block-local: spans of a doc live in one row, so pairing is a per-batch
    searchsorted over (doc, offset) keys — 2*window+1 vectorized probes,
    no shuffle at any scale.

    Context quality depends on media spans carrying INLINE offsets (the
    synthesiser does; an HTML emitter that records <img> positions would).
    Crawl output appends link-derived media spans after the text spans, so
    those get ``context=""`` — correct, just not caption-bearing."""
    W = int(window)

    def pairs(b: pa.Table) -> pa.Table:
        parent, flat = _flat(b)
        offs = flat.field("offset").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        is_media = pc.equal(flat.field("kind"), "media").to_numpy(
            zero_copy_only=False
        )
        is_text = ~pc.is_in(
            flat.field("kind"), value_set=pa.array(NON_TEXT_KINDS)
        ).to_numpy(zero_copy_only=False)
        # composite sort keys over (doc ordinal, offset); offsets are
        # int32-bounded so doc<<32 | off is collision-free
        key = parent.astype(np.int64) * (1 << 32) + offs
        tkey = key[is_text]
        torder = np.argsort(tkey, kind="stable")
        tkey_s = tkey[torder]
        texts = flat.field("text").filter(pa.array(is_text))
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        texts_s = texts.take(pa.array(torder))

        mkey = key[is_media]
        n_m = len(mkey)
        # for each media span, probe offsets moff-W..moff+W
        hit_idx = []  # indices into texts_s, grouped per media in delta order
        for d in range(-W, W + 1):
            probe = mkey + d
            pos = np.searchsorted(tkey_s, probe)
            ok = (pos < len(tkey_s)) & (tkey_s[np.minimum(pos, len(tkey_s) - 1)] == probe)
            hit_idx.append(np.where(ok, pos, -1))
        # assemble per-media hit lists ordered by delta (== offset order)
        idx_mat = np.stack(hit_idx, axis=1) if n_m else np.zeros((0, 2 * W + 1), np.int64)
        valid = idx_mat >= 0
        counts = valid.sum(axis=1).astype(np.int64)
        flat_idx = idx_mat[valid]
        ctx_offsets = np.append(np.cumsum(counts) - counts, int(counts.sum())).astype(np.int32)
        lst = pa.ListArray.from_arrays(
            pa.array(ctx_offsets, pa.int32()),
            texts_s.take(pa.array(flat_idx)) if len(flat_idx) else pa.array([], texts_s.type),
        )
        return pa.table(
            {
                "doc_id": b["doc_id"].combine_chunks().take(pa.array(parent[is_media])),
                "media_ref": flat.field("media_ref").filter(pa.array(is_media)),
                "context": pc.binary_join(lst, " "),
            }
        )

    return inter.map_batches(pairs, batch_format="pyarrow")


def span_dedup_structured(
    inter,
    n_parts: int = 64,
    drop_broadcast_spans: int = 2_000_000,
):
    """``span_dedup`` that PRESERVES the interleaved shape: returns
    ``(doc_id, spans)`` with duplicate text spans removed (same
    keep-globally-first rule) and ``offset`` renumbered densely per doc, so
    every downstream interleaved operator — ``pack_interleaved``,
    ``media_context_pairs``, ``interleaved_token_counts`` — composes AFTER
    dedup. Media spans always survive and keep their relative position.

    Same two drop paths as ``span_dedup`` (shared ``_span_drops``
    exchange): broadcast keys + block-local list rebuild at or below
    ``drop_broadcast_spans``; above it, explode -> hash left-join ->
    partition-grouped per-doc list reassembly (text moves once)."""
    import pandas as pd
    import ray

    drops = _span_drops(inter, n_parts)

    def _rebuilt_table(doc_ids, kind, text, ref, parent_kept, n_docs, total):
        counts = np.bincount(parent_kept, minlength=n_docs).astype(np.int64)
        starts = np.cumsum(counts) - counts
        new_off = (
            np.arange(total, dtype=np.int64) - starts[parent_kept]
        ).astype(np.int32)
        struct = pa.StructArray.from_arrays(
            [
                kind.cast(pa.string()),
                text.cast(pa.string()),
                ref.cast(pa.string()),
                pa.array(new_off, pa.int32()),
            ],
            ["kind", "text", "media_ref", "offset"],
        )
        offsets = np.append(starts, total).astype(np.int32)
        return pa.table(
            {
                "doc_id": doc_ids,
                "spans": pa.ListArray.from_arrays(
                    pa.array(offsets, pa.int32()), struct
                ),
            }
        )

    if drops.count() <= drop_broadcast_spans:
        key_chunks = [
            pc.binary_join_element_wise(
                t["doc_id"].combine_chunks().cast(pa.string()),
                t["offset"].combine_chunks().cast(pa.string()),
                "\x1f",
            )
            for t in drops.iter_batches(batch_format="pyarrow", batch_size=None)
            if t.num_rows
        ]
        drop_ref = ray.put(
            pa.concat_arrays(key_chunks)
            if key_chunks
            else pa.array([], pa.string())
        )

        def rebuild_block(b: pa.Table) -> pa.Table:
            parent, flat = _flat(b)
            did_span = b["doc_id"].combine_chunks().take(pa.array(parent))
            keys = pc.binary_join_element_wise(
                pc.cast(did_span, pa.string()),
                pc.cast(flat.field("offset").cast(pa.int64()), pa.string()),
                "\x1f",
            )
            # drop keys come from text spans only; offsets are unique per
            # doc, so media keys can never false-match
            keep = pc.invert(
                pc.is_in(keys, value_set=ray.get(drop_ref))
            )
            keep_np = keep.to_numpy(zero_copy_only=False)
            return _rebuilt_table(
                b["doc_id"],
                flat.field("kind").filter(keep),
                flat.field("text").filter(keep),
                flat.field("media_ref").filter(keep),
                parent[keep_np],
                len(b),
                int(keep_np.sum()),
            )

        return inter.map_batches(rebuild_block, batch_format="pyarrow")

    # distributed path: explode ALL spans, mark drops via hash left-join,
    # partition-grouped per-doc reassembly
    def explode_all(b: pa.Table) -> pa.Table:
        parent, flat = _flat(b)
        return pa.table(
            {
                "doc_id": b["doc_id"].combine_chunks().take(pa.array(parent)),
                "offset": flat.field("offset").cast(pa.int64()),
                "kind": flat.field("kind"),
                "text": flat.field("text"),
                "media_ref": flat.field("media_ref"),
            }
        )

    marked_drops = drops.map_batches(
        lambda b: b.append_column(
            "__dup", pa.array(np.ones(b.num_rows, np.int8))
        ),
        batch_format="pyarrow",
    )
    cpus = (
        int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    )
    npart = max(2, cpus // 2)
    joined = inter.map_batches(explode_all, batch_format="pyarrow").join(
        marked_drops.repartition(npart),
        join_type="left_outer",
        num_partitions=npart,
        on=("doc_id", "offset"),
    )

    def with_doc_part(b: pa.Table) -> pa.Table:
        ids = b["doc_id"].combine_chunks().to_numpy(zero_copy_only=False)
        if ids.dtype.kind == "U":
            ids = ids.astype(object)
        part = (pd.util.hash_array(ids, categorize=False) % n_parts).astype(
            np.int32
        )
        return b.append_column("dpart", pa.array(part))

    def rebuild_part(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.string()),
                    "spans": pa.array([], SPAN_TYPE),
                }
            )
        ids = g["doc_id"].combine_chunks()
        offs = g["offset"].combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((offs, ids.to_numpy(zero_copy_only=False)))
        take = pa.array(order)
        ids_s = ids.take(take)
        dup = pc.is_valid(g["__dup"].combine_chunks().take(take)).to_numpy(
            zero_copy_only=False
        )
        # doc ordinals over the sorted rows (all of a doc's rows contiguous)
        uniq, parent_all = np.unique(
            ids_s.to_numpy(zero_copy_only=False), return_inverse=True
        )
        keep = ~dup
        keep_pa = pa.array(keep)
        return _rebuilt_table(
            pa.array(uniq.astype(object), ids.type),
            g["kind"].combine_chunks().take(take).filter(keep_pa),
            g["text"].combine_chunks().take(take).filter(keep_pa),
            g["media_ref"].combine_chunks().take(take).filter(keep_pa),
            parent_all[keep],
            len(uniq),
            int(keep.sum()),
        )

    return (
        joined.map_batches(with_doc_part, batch_format="pyarrow")
        .groupby("dpart")
        .map_groups(rebuild_part, batch_format="pyarrow")
    )


def media_manifest(inter):
    """The fetch-media work list: distinct media_ref + number of referencing
    docs. Partial per-block counts (Arrow group_by) then a groupby-sum over
    the already-distinct-per-block refs — the shuffle carries (ref, n)
    pairs, never spans."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        _, flat = _flat(b)
        refs = flat.field("media_ref").filter(
            pc.equal(flat.field("kind"), "media")
        )
        g = (
            pa.table({"media_ref": refs})
            .group_by(["media_ref"])
            .aggregate([([], "count_all")])
        )
        return g.rename_columns(["media_ref", "n"])

    partials = inter.map_batches(partial, batch_format="pyarrow")
    return partials.groupby("media_ref").aggregate(Sum("n", alias_name="n_docs"))


def render_for_training(inter, media_token: str = "<image>"):
    """Interleaved -> (doc_id, rendered): the MMC4/OBELICS-style training
    serialization — spans in offset order, text spans verbatim, media
    spans replaced by the ``media_token`` placeholder (it marks where the
    vision embedding sequence splices in), link spans DROPPED (anchors
    aren't training text), all joined by single spaces. Block-local (a
    doc's spans live in one row), fully vectorized: one if_else + one
    filtered list reassembly + one binary_join per batch."""
    import numpy as np

    def render(b: pa.Table) -> pa.Table:
        lst = b["spans"].combine_chunks()
        flat = pc.list_flatten(lst)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        if pa.types.is_null(flat.type):
            # degenerate block: every row has zero spans (the list item
            # type degrades to null) -> all docs render empty
            return pa.table(
                {
                    "doc_id": b["doc_id"],
                    "rendered": pa.array([""] * b.num_rows, pa.string()),
                }
            )
        parent = pc.list_parent_indices(lst).to_numpy(zero_copy_only=False)
        kind = flat.field("kind")
        piece = pc.if_else(
            pc.equal(kind, "media"),
            pa.scalar(media_token, pa.string()),
            flat.field("text").cast(pa.string()),
        )
        keep = pc.invert(pc.equal(kind, "link"))
        keep_np = keep.to_numpy(zero_copy_only=False)
        piece = pc.filter(piece, keep)
        if isinstance(piece, pa.ChunkedArray):
            piece = piece.combine_chunks()
        kparent = parent[keep_np]
        counts = np.bincount(kparent, minlength=b.num_rows)
        offsets = np.append(
            np.cumsum(counts) - counts, len(piece)
        ).astype(np.int32)
        out = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), piece)
        return pa.table(
            {"doc_id": b["doc_id"], "rendered": pc.binary_join(out, " ")}
        )

    return inter.map_batches(render, batch_format="pyarrow")
