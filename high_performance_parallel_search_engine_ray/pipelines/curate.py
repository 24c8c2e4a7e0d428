"""End-to-end training-data curation pipeline (the flagship composition).

What a 100 TB pretraining-data job actually runs, expressed as one Ray Data
flow over the engine's operators:

  docs
    -> exact dedup           (dedup.dedup_keep_first — hash-only shuffle)
    -> near-dup removal      (dedup.minhash_lsh_pairs -> drop the HIGHER id
                              of each verified pair: deterministic and
                              order-free on pair output)
    -> quality gate          (row-local vectorized kernels INLINE on the
                              docs batches — no extra pass, no shuffle)
    -> language gate         (actor-pool stage filtering in place)
    -> token accounting      (row-local, appended inline)
    -> optional partitioned parquet sink (resumable layout)

Scale notes: the only non-row-local stages are the two dedups, which are
the already-scale-shaped operators they compose. The near-dup drop-id set
is pair-scale; it is broadcast via ray.put by default and switches to a
hash-shuffle anti-join (`drop_via_join=True`) when pair counts outgrow a
broadcast — the same cost-based trade as relational._attach_or_join.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.distinct import distinct_values
from .dedup import dedup_keep_first, minhash_lsh_pairs
from .text import _BPEISH_PATTERN, LangIdStage

# Drop-id sets at or below this count broadcast (bounded driver pull +
# ray.put once); above it the drop flips to the hash-shuffle anti-join —
# the same cost-based trade as relational.BROADCAST_THRESHOLD. Tests set
# this to 0 to force the join path.
DROP_BROADCAST_THRESHOLD = 2_000_000


class QualityLangGate(LangIdStage):
    """Actor-pool stage: drops rows failing the quality thresholds or the
    language allowlist, in place (no separate metrics pass, no driver-side
    id sets). Language profiles are per-actor state (LangIdStage);
    quality metrics are pc kernels."""

    def __init__(
        self,
        min_chars: int,
        max_digit_ratio: float,
        min_alpha_ratio: float,
        keep_langs: tuple[str, ...],
        min_lang_score: float,
    ):
        super().__init__()
        self.min_chars = min_chars
        self.max_digit_ratio = max_digit_ratio
        self.min_alpha_ratio = min_alpha_ratio
        self.keep_langs = pa.array(list(keep_langs))
        self.min_lang_score = min_lang_score

    def __call__(self, b: pa.Table) -> pa.Table:
        txt = b["text"]
        n = pc.utf8_length(txt).to_numpy(zero_copy_only=False).astype(np.float64)
        digit = pc.count_substring_regex(txt, "[0-9]").to_numpy(
            zero_copy_only=False
        )
        alpha = pc.count_substring_regex(txt, "[A-Za-z]").to_numpy(
            zero_copy_only=False
        )
        safe_n = np.maximum(n, 1.0)
        ok = (
            (n >= self.min_chars)
            & (digit / safe_n <= self.max_digit_ratio)
            & (alpha / safe_n >= self.min_alpha_ratio)
        )
        kept = b.filter(pa.array(ok))
        if kept.num_rows == 0:
            return kept
        lang = super().__call__(kept)  # (doc_id, lang_pred, lang_score)
        lmask = pc.and_(
            pc.is_in(lang["lang_pred"], value_set=self.keep_langs),
            pc.greater_equal(lang["lang_score"], self.min_lang_score),
        )
        return kept.filter(lmask)


def curate_corpus(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    jaccard_threshold: float = 0.5,
    min_chars: int = 32,
    max_digit_ratio: float = 0.3,
    min_alpha_ratio: float = 0.5,
    keep_langs: tuple[str, ...] = ("en",),
    min_lang_score: float = 0.05,
    out_dir: str | None = None,
    drop_via_join: bool | None = None,
    gate_concurrency: int = 2,
):
    """Returns (curated_docs_with_token_counts, stats_table).

    curated docs columns: (doc_id, text, n_ws_tokens, n_bpeish_tokens).
    stats: one row per stage with rows_out — the per-stage yield accounting
    every curation run reports.
    """
    import ray

    n0 = docs.count()

    # 1. exact dedup (keep min-id copy)
    docs = dedup_keep_first(docs, id_col, text_col).materialize()
    n1 = docs.count()

    # 2. near-dup removal: drop the higher id of each verified pair
    pairs = minhash_lsh_pairs(
        docs, id_col, text_col, jaccard_threshold=jaccard_threshold
    )
    # pair-scale; materialized so both drop paths (unique pull / shuffle
    # anti-join) read pinned blocks instead of re-running the LSH pipeline
    drop_ids = pairs.map_batches(
        lambda b: b.select(["doc_b"]).rename_columns(["__drop"]),
        batch_format="pyarrow",
    ).materialize()
    if drop_via_join is None:
        # cost-based flip: pair-scale drop sets broadcast; past the
        # threshold the drop becomes a shuffle anti-join (never an
        # unbounded driver pull)
        drop_via_join = drop_ids.count() > DROP_BROADCAST_THRESHOLD
    if drop_via_join:
        # hash-shuffle ANTI-join (Ray 2.49's Dataset.join has no anti type
        # and its left_outer emits schema-inconsistent blocks): docs rows
        # and drop-id marker rows co-locate by bounded id-hash partition;
        # inside each partition a vectorized isin drops the marked ids.
        import pandas as pd

        def doc_mark(b: pa.Table) -> pa.Table:
            part = (
                pd.util.hash_array(
                    b[id_col].to_numpy(zero_copy_only=False), categorize=False
                )
                % 64
            ).astype("int32")
            return (
                b.append_column("__is_drop", pa.array([0] * b.num_rows, pa.int8()))
                .append_column("__part", pa.array(part))
            )

        # marker rows must carry the docs dataset's ACTUAL column types
        # (parquet-read corpora use large_string; a hard-coded pa.string()
        # would union schema-inconsistent blocks)
        text_type = docs.schema().base_schema.field(text_col).type

        def drop_mark(b: pa.Table) -> pa.Table:
            ids_ = b["__drop"]
            part = (
                pd.util.hash_array(
                    ids_.to_numpy(zero_copy_only=False), categorize=False
                )
                % 64
            ).astype("int32")
            return pa.table(
                {
                    id_col: ids_,
                    text_col: pa.array([""] * b.num_rows, text_type),
                    "__is_drop": pa.array([1] * b.num_rows, pa.int8()),
                    "__part": pa.array(part),
                }
            )

        def anti(g: "pd.DataFrame") -> "pd.DataFrame":
            dropset = g.loc[g["__is_drop"] == 1, id_col].to_numpy()
            keep = g[(g["__is_drop"] == 0) & ~g[id_col].isin(dropset)]
            return keep[[id_col, text_col]]

        docs = (
            docs.map_batches(doc_mark, batch_format="pyarrow")
            .union(drop_ids.map_batches(drop_mark, batch_format="pyarrow"))
            .groupby("__part")
            .map_groups(anti, batch_format="pandas")
        )
    else:
        # distinct_values, NOT Dataset.unique(): the pair output of
        # minhash_lsh_pairs is a 64-partition map_groups result whose empty
        # partitions crash Ray 2.49's Unique aggregate (round-2 driver bug)
        ids = distinct_values(drop_ids, "__drop")
        ref = ray.put(pa.array(ids) if ids else None)

        def drop(b: pa.Table) -> pa.Table:
            ds_ = ray.get(ref)
            if ds_ is None:
                return b
            return b.filter(pc.invert(pc.is_in(b[id_col], value_set=ds_)))

        docs = docs.map_batches(drop, batch_format="pyarrow")
    docs = docs.materialize()
    n2 = docs.count()

    # 3+4. quality + language gates, in place (actor pool)
    docs = docs.map_batches(
        QualityLangGate,
        fn_constructor_kwargs=dict(
            min_chars=min_chars,
            max_digit_ratio=max_digit_ratio,
            min_alpha_ratio=min_alpha_ratio,
            keep_langs=keep_langs,
            min_lang_score=min_lang_score,
        ),
        batch_format="pyarrow",
        concurrency=gate_concurrency,
        num_cpus=1,
    ).materialize()
    n3 = docs.count()

    # 5. token accounting (row-local, appended inline)
    def with_tokens(b: pa.Table) -> pa.Table:
        return b.append_column(
            "n_ws_tokens",
            pc.count_substring_regex(b[text_col], r"\S+").cast(pa.int64()),
        ).append_column(
            "n_bpeish_tokens",
            pc.count_substring_regex(b[text_col], _BPEISH_PATTERN).cast(pa.int64()),
        )

    curated = docs.map_batches(with_tokens, batch_format="pyarrow")

    if out_dir is not None:
        curated.write_parquet(out_dir)

    stats = pa.table(
        {
            "stage": pa.array(
                ["input", "exact_dedup", "near_dedup", "quality_lang_gate"]
            ),
            "rows_out": pa.array([n0, n1, n2, n3], pa.int64()),
        }
    )
    return curated, stats


def training_pipeline(
    docs,
    sources,
    epochs: dict | None = None,
    budget: int = 2048,
    n_shards: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    **curate_kwargs,
):
    """The complete pretraining-data story, one dataflow:

        curate_corpus (dedup -> near-dup -> quality/lang gates -> tokens)
          -> source mixing   (per-source epoch replication; instance id =
                              doc_id * 8 + epoch keeps ids integer+unique)
          -> sequence packing (text._pack_counts distributed prefix sum
                              over (instance, n_ws_tokens) — text never
                              re-shuffles after curation)
          -> pseudo-shuffle shard split over PACKS (LCG mix on pack_id,
                              block-local — no all-to-all)

    Returns the per-shard accounting table ``(shard, n_packs,
    n_doc_instances, n_tokens)`` — what a training-launch readiness check
    reads. A pack's straddling tokens are attributed to the shard where
    each member doc STARTS (stats semantics, documented).

    Scale shape: everything after curation moves only (id, n_tokens)-sized
    rows; the source attach is the engine's cost-based broadcast/shuffle
    join; epoch replication happens on the COUNT table, never on text."""
    import ray

    from .relational import _attach_or_join
    from .text import _pack_counts

    cpus = (
        int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    )
    npart = max(2, cpus // 2)
    eps = epochs or {}
    MAX_E = 8  # epoch headroom in the composite instance id

    curated, _stats = curate_corpus(docs, id_col, text_col, **curate_kwargs)
    counts = curated.map_batches(
        lambda b: pa.table({id_col: b[id_col], "n_tokens": b["n_ws_tokens"]}),
        batch_format="pyarrow",
    )
    with_src = _attach_or_join(
        counts, id_col, sources, id_col, [source_col], npart
    )

    def explode(b: pa.Table) -> pa.Table:
        import pandas as pd

        src = b[source_col].to_numpy(zero_copy_only=False)
        reps = pd.Series(src).map(eps).fillna(1).to_numpy(np.int64)
        if reps.max(initial=0) > MAX_E:
            raise ValueError(f"epoch factor > {MAX_E} breaks instance ids")
        ids = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        nt = b["n_tokens"].to_numpy(zero_copy_only=False)
        idx = np.repeat(np.arange(len(ids)), reps)
        offs = np.cumsum(reps) - reps
        epoch = np.arange(int(reps.sum()), dtype=np.int64) - offs[idx]
        return pa.table(
            {
                "inst_id": pa.array(ids[idx] * MAX_E + epoch, pa.int64()),
                "n_tokens": pa.array(nt[idx], pa.int64()),
            }
        )

    inst = with_src.map_batches(explode, batch_format="pyarrow").materialize()
    packed = _pack_counts(inst, budget, "inst_id", n_parts=64)

    from ray.data.aggregate import Count, Sum

    packs = packed.groupby("pack_id").aggregate(
        Count(alias_name="n_doc_instances"),
        Sum("n_tokens", alias_name="n_tokens"),
    )

    S = int(n_shards)

    def assign(b: pa.Table) -> pa.Table:
        pid = b["pack_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        mix = (pid * 2654435761 + 1013904223) % (2**32)
        return pa.table(
            {
                "shard": pa.array(mix % S, pa.int64()),
                "n_doc_instances": b["n_doc_instances"],
                "n_tokens": b["n_tokens"],
            }
        )

    return (
        packs.map_batches(assign, batch_format="pyarrow")
        .groupby("shard")
        .aggregate(
            Count(alias_name="n_packs"),
            Sum("n_doc_instances", alias_name="n_doc_instances"),
            Sum("n_tokens", alias_name="n_tokens"),
        )
        .sort("shard")
    )
