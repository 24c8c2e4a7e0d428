"""Driver-style correctness gate, run locally at sf0.001: every queries()
entry with an oracle_sql() runs through Ray AND DuckDB; row count, column
names, and order-insensitive values must match."""

import math

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entry_mod

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con.execute(sql).fetchdf()


def _to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(result, ray.data.Dataset):
        return result.to_pandas()
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _values_equal(a, b) -> bool:
    # EXACT equality (the driver hashes values; rounding on both sides must
    # make them bit-identical)
    if isinstance(a, float) or isinstance(b, float):
        fa, fb = float(a), float(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return fa == fb
    return a == b


ORACLE_KEYS = sorted(entry_mod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(ray_session, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    got = _canon(_to_pandas(q(SF)))
    want = _canon(_duck(sql))
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    for col in got.columns:
        ga, wa = got[col].tolist(), want[col].tolist()
        bad = [
            (i, x, y) for i, (x, y) in enumerate(zip(ga, wa)) if not _values_equal(x, y)
        ]
        assert not bad, f"{name}.{col}: first mismatches {bad[:5]}"


NON_SQL = sorted(set(entry_mod.queries().keys()) - set(ORACLE_KEYS))


@pytest.mark.parametrize("name", [n for n in NON_SQL if not n.startswith("crawl")])
def test_non_sql_queries_run(ray_session, name):
    q = entry_mod.queries()[name]
    df = _to_pandas(q(SF))
    assert len(df) >= 0
    assert len(df.columns) > 0


def test_entry_smoke(ray_session):
    df = _to_pandas(entry_mod.entry())
    assert len(df) >= 0
    assert "score" in df.columns


JOIN_QUERIES = [
    "top_revenue_orders",
    "region_nation_revenue",
    "top_customers",
    "orders_above_cust_avg",
]


@pytest.mark.parametrize("name", JOIN_QUERIES)
def test_shuffle_join_path_matches_oracle(ray_session, name, monkeypatch):
    """Force the hash-shuffle join path (broadcast threshold 0) and re-check
    the oracle: the scale path must be value-identical to the (default)
    bounded-broadcast path."""
    from high_performance_parallel_search_engine_ray.pipelines import relational

    monkeypatch.setattr(relational, "BROADCAST_THRESHOLD", 0)
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    got = _canon(_to_pandas(q(SF)))
    want = _canon(_duck(sql))
    assert len(got) == len(want)
    assert list(got.columns) == list(want.columns)
    for col in got.columns:
        for x, y in zip(got[col].tolist(), want[col].tolist()):
            assert _values_equal(x, y), (name, col, x, y)


def test_registry_ordering_contract():
    """The correctness driver checks only the FIRST 50 queries() entries:
    every oracle-checked query and every flagship entry (crawl engine,
    curation, media, ann_lsh) must sit inside that horizon."""
    keys = list(entry_mod.queries())
    first50 = set(keys[:50])
    # round-3+ additions live past the cap by design (the r2 contract rows
    # must stay comparable); they are oracle-checked by THIS file instead
    overflow_ok = {
        "pii_scrub", "sequence_packing", "repetition_scores",
        "quantity_quantiles", "stratified_sample",
        "unigram_logprob", "decontaminate", "dup_clusters",
        "tfidf_topk", "dup_substrings",
        "span_explode", "span_kind_stats", "media_manifest",
        "interleave_roundtrip", "interleaved_quality", "train_shards",
        "span_dedup", "interleaved_token_counts",
        "quality_buckets", "source_mix_epochs", "pack_interleaved",
        "media_context_pairs", "span_dedup_structured", "bm25_served",
        "search_snippets", "co_citation", "link_in_degree", "crawl_diff",
        "source_quality", "frequent_terms", "top_terms_per_source",
        "temperature_rates", "temperature_mix", "anchor_terms",
        "recrawl_schedule", "train_val_test_split", "decontaminate_bloom",
        "chunk_windows", "phrase_pmi", "price_histogram", "vocab_build",
        "dsir_weights", "gopher_gates", "encode_vocab", "split_sentences",
        "render_training", "boolean_and", "rag_search",
        "dedup_keep_richest", "cross_source_dups", "bigram_logprob",
        "token_budget_select",
        # wave-4 analytics additions (same rationale)
        "cohort_retention", "funnel_counts", "source_vocab_diversity",
        "event_transitions", "rolling_dau", "qty_discount_corr",
        "paragraph_dedup", "revenue_rollup", "events_pivot",
        "weighted_sample", "order_interarrival", "segment_priority_chi2",
        "basket_pairs",
        # wave-5 additions (same rationale)
        "containment_pairs", "events_anomalies", "rrf_fused",
        "jsonl_roundtrip", "order_reconcile", "events_mad_outliers",
        "source_cap",
        # wave-6 additions (same rationale)
        "brand_price_trend", "bloom_semi_revenue", "leakage_safe_split",
        "source_entropy",
        # wave-7 additions (same rationale)
        "seed_hops", "profile_events",
        # wave-8 additions (same rationale)
        "part_skyline", "custs_without_urgent",
        # wave-9 additions (same rationale)
        "triangles", "event_type_overlap",
        # wave-10 additions (same rationale)
        "order_percent_rank", "repetition_screen", "spell_suggest",
        # wave-11 additions (same rationale)
        "pii_redact", "csv_roundtrip",
        # wave-12 additions (same rationale)
        "phrase_search", "autocomplete", "events_twap", "mode_quantity",
        # wave-13 additions (same rationale)
        "daily_outer_join",
        # wave-14 additions (same rationale)
        "key_skew",
        # wave-15 additions (same rationale)
        "fuzzy_name_pairs", "user_value_intervals",
        # wave-16 additions (same rationale)
        "corpus_diff",
        # wave-17 additions (same rationale)
        "spend_deciles",
        # wave-18 additions (same rationale)
        "phrase_from_index",
        # wave-19 additions (same rationale)
        "proximity_search",
        # wave-20 additions (same rationale)
        "bm25_after_update", "postings_roundtrip", "prf_expanded",
        # wave-21 additions (same rationale)
        "events_watermark",
        # wave-22 additions (same rationale)
        "more_like_this",
        # wave-23 additions (same rationale)
        "related_terms", "pruned_monthly_revenue",
        # wave-24 additions (same rationale)
        "events_checksum",
        # wave-25 additions (same rationale)
        "user_journeys",
        # wave-26 additions (same rationale)
        "ipc_roundtrip",
        # wave-27 additions (same rationale)
        "trigram_search",
        # wave-28 additions (same rationale)
        "merge_apply",
        # wave-29 additions (same rationale)
        "serp_dedup",
        # wave-30 additions (same rationale)
        "incremental_stats",
        # wave-31 additions (same rationale)
        "source_quota_serp",
        # round-4 exchange (verdict item 7): seven sweep-triple-covered
        # relational rows moved past the horizon to promote the six r1/r2
        # contract keys + the politeness audit into the driver window
        "customer_supplier_nations", "top_events_per_user",
        "events_sliding", "events_asof_signup", "brand_median_price",
        "orders_above_cust_avg", "events_nearby_counts",
        # round-4 appends (registry stays frozen — new keys land past the
        # horizon; the sweep covers them at sf0.01)
        "hooked_doc_stats", "hooked_token_stats", "repeated_ngram_spans",
        "cut_repeated_spans",
    }
    assert set(entry_mod.oracle_sql()) - overflow_ok <= first50
    for critical in (
        "crawl_sharded_smoke", "crawl_exact_trace", "curation_pipeline",
        "crawl_politeness_audit",
        "media_features", "media_resize", "media_frame_samples",
        "ann_lsh_topk", "minhash_lsh_pairs", "simhash_dup_pairs",
        "embedding_dup_pairs_lsh",
        # r1/r2 contract keys promoted back in round 4
        "simhash_signatures", "bm25_reference_queries",
        "kmv_distinct_users", "lang_id", "fingerprints", "ann_ivf_topk",
    ):
        assert critical in first50, critical
