"""Bounded-model mode (max_model_terms) for the vocab-broadcast family.

Contract (VERDICT round 3, item 4): each op accepts a top-V cap on the
model it pulls/broadcasts; with V >= vocabulary size results are IDENTICAL
to the unbounded (oracle) mode, and with a tiny V the op still runs,
degrading gracefully via documented tail defaults (df=1 / count=1 /
bigram-count=0) instead of failing or pulling the full vocabulary.
"""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from high_performance_parallel_search_engine_ray.pipelines import rank as rk
from high_performance_parallel_search_engine_ray.pipelines import text as tx


def _docs():
    rows = [
        {"doc_id": 1, "text": "alpha beta gamma alpha delta common"},
        {"doc_id": 2, "text": "alpha beta common common epsilon"},
        {"doc_id": 3, "text": "gamma delta zeta common alpha"},
        {"doc_id": 4, "text": "rare1 rare2 common beta"},
        {"doc_id": 5, "text": "alpha alpha beta gamma common zeta"},
    ]
    return rd.from_items(rows)


def _sorted_df(df, keys):
    if not isinstance(df, pd.DataFrame):
        df = df.to_pandas()
    return df.sort_values(keys).reset_index(drop=True)


def test_tfidf_topk_bounded_equals_unbounded_at_large_v(ray_session):
    base = _sorted_df(rk.tfidf_topk(_docs(), k=3).to_pandas(), ["doc_id", "rank"])
    big = _sorted_df(
        rk.tfidf_topk(_docs(), k=3, max_model_terms=10_000).to_pandas(),
        ["doc_id", "rank"],
    )
    pd.testing.assert_frame_equal(base, big)


def test_tfidf_topk_small_v_degrades_gracefully(ray_session):
    out = rk.tfidf_topk(_docs(), k=3, max_model_terms=2).to_pandas()
    # still one top-k block per doc, finite scores, no crash
    assert set(out.columns) == {"doc_id", "term", "tfidf", "rank"}
    assert out["doc_id"].nunique() == 5
    assert np.isfinite(out["tfidf"]).all()
    # out-of-model terms score with df=1 => idf = ln(N/1) = ln(5)
    rare = out[out["term"] == "rare1"]
    if len(rare):
        assert rare["tfidf"].iloc[0] == pytest.approx(np.log(5.0), abs=1e-6)


def test_more_like_this_bounded_equals_unbounded(ray_session):
    base = _sorted_df(rk.more_like_this(_docs(), 1, k=10).to_pandas(), ["doc_id"])
    big = _sorted_df(
        rk.more_like_this(_docs(), 1, k=10, max_model_terms=10_000).to_pandas(),
        ["doc_id"],
    )
    pd.testing.assert_frame_equal(base, big)
    small = rk.more_like_this(_docs(), 1, k=10, max_model_terms=2).to_pandas()
    assert set(small.columns) == {"doc_id", "cos_sim"}
    assert (small["cos_sim"] > 0).all()


def test_related_terms_bounded_equals_unbounded(ray_session):
    base = _sorted_df(
        rk.related_terms(_docs(), "alpha", k=10, min_co=1).to_pandas(), ["term"]
    )
    big = _sorted_df(
        rk.related_terms(
            _docs(), "alpha", k=10, min_co=1, max_model_terms=10_000
        ).to_pandas(),
        ["term"],
    )
    pd.testing.assert_frame_equal(base, big)
    small = rk.related_terms(
        _docs(), "alpha", k=10, min_co=1, max_model_terms=1
    ).to_pandas()
    assert set(small.columns) == {"term", "co_df", "lift"}
    assert len(small) > 0


def test_unigram_logprob_bounded_equals_unbounded(ray_session):
    base = _sorted_df(tx.unigram_logprob(_docs()).to_pandas(), ["doc_id"])
    big = _sorted_df(
        tx.unigram_logprob(_docs(), max_model_terms=10_000).to_pandas(),
        ["doc_id"],
    )
    pd.testing.assert_frame_equal(base, big)


def test_unigram_logprob_small_v_tail_default(ray_session):
    # one doc made ONLY of tail tokens: with V=1 (model = {common} or the
    # count-top term) its tokens all take ln(1/total)
    rows = [
        {"doc_id": 1, "text": "common common common common"},
        {"doc_id": 2, "text": "tailword otherword"},
    ]
    ds = rd.from_items(rows)
    out = {
        r["doc_id"]: r
        for r in tx.unigram_logprob(ds, max_model_terms=1).take_all()
    }
    total = 6.0
    assert out[2]["avg_logprob"] == pytest.approx(np.log(1.0 / total), abs=1e-6)
    assert out[1]["avg_logprob"] == pytest.approx(np.log(4.0 / total), abs=1e-6)


def test_bigram_logprob_bounded_equals_unbounded(ray_session):
    base = _sorted_df(tx.bigram_logprob(_docs()).to_pandas(), ["doc_id"])
    big = _sorted_df(
        tx.bigram_logprob(_docs(), max_model_terms=10_000).to_pandas(),
        ["doc_id"],
    )
    pd.testing.assert_frame_equal(base, big)


def test_bigram_logprob_small_v_degrades_gracefully(ray_session):
    out = tx.bigram_logprob(_docs(), max_model_terms=2).to_pandas()
    assert set(out.columns) == {"doc_id", "n_transitions", "avg_logprob"}
    assert len(out) == 5
    assert np.isfinite(out["avg_logprob"]).all()
    # V (smoothing denominator) stays exact, so every logprob is bounded
    # below by ln(1 / (max_c + V)) — sanity that defaults kept sane values
    assert (out["avg_logprob"] < 0).all()
