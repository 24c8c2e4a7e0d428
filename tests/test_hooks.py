"""Registered-callback seam (pipelines/hooks.py) — the ProcessorCallback /
TokenCallback analog (`MPI Version/src/parallel_processor.c:50-142`)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from high_performance_parallel_search_engine_ray.pipelines import hooks as hk


def _docs():
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(
                    ["The Quick Fox", "hash join plans", "A B C d"],
                    pa.string(),
                ),
            }
        )
    )


def test_doc_hooks_batch_and_row_forms_agree(ray_session):
    reg_b, reg_r = hk.HookRegistry(), hk.HookRegistry()
    reg_b.register_processor(
        "textlen",
        batch_fn=lambda ids, texts: {
            "value": pd.Series(texts).astype(str).str.len().to_numpy(np.int64)
        },
    )
    reg_r.register_processor("textlen", fn=lambda i, t: {"value": len(t)})
    got_b = hk.process_documents(_docs(), registry=reg_b).to_pandas()
    got_r = hk.process_documents(_docs(), registry=reg_r).to_pandas()
    assert got_b.sort_values("doc_id").values.tolist() == \
        got_r.sort_values("doc_id").values.tolist()
    assert list(got_b.columns) == ["doc_id", "textlen"]
    assert got_b.sort_values("doc_id")["textlen"].tolist() == [13, 15, 7]


def test_multi_hook_column_naming(ray_session):
    reg = hk.HookRegistry()
    reg.register_processor("textlen", fn=lambda i, t: {"value": len(t)})
    reg.register_processor(
        "caps", fn=lambda i, t: {"n_upper": sum(c.isupper() for c in t)}
    )
    got = hk.process_documents(_docs(), registry=reg).to_pandas()
    # named outputs get hookname_col; 'value' collapses to the hook name
    assert sorted(got.columns) == ["caps_n_upper", "doc_id", "textlen"]
    assert got.sort_values("doc_id")["caps_n_upper"].tolist() == [3, 0, 3]


def test_token_hooks(ray_session):
    reg = hk.HookRegistry()
    reg.register_token_hook(
        "term_len",
        batch_fn=lambda terms: {
            "value": np.char.str_len(terms.astype(str)).astype(np.int64)
        },
    )
    reg.register_token_hook("first_char", fn=lambda t: t[:1])
    got = hk.process_tokens(_docs(), registry=reg).to_pandas()
    assert sorted(got.columns) == ["df", "first_char", "term", "term_len"]
    row = got.set_index("term").loc["quick"]
    assert row["term_len"] == 5 and row["first_char"] == "q" and row["df"] == 1


def test_hook_selection_and_errors(ray_session):
    reg = hk.HookRegistry()
    reg.register_processor("a", fn=lambda i, t: {"value": 1})
    reg.register_processor("b", fn=lambda i, t: {"value": 2})
    got = hk.process_documents(_docs(), hooks=["b"], registry=reg).to_pandas()
    assert sorted(got.columns) == ["b", "doc_id"]
    reg.unregister("b")
    assert reg.doc_hook_names() == ["a"]
    with pytest.raises(KeyError):
        hk.process_documents(_docs(), hooks=["b"], registry=reg)
    with pytest.raises(ValueError):
        reg.register_processor("both", fn=lambda i, t: {}, batch_fn=lambda i, t: {})
    with pytest.raises(ValueError):
        reg.register_processor("neither")


def test_ragged_row_hook_keys_union(ray_session):
    """A per-row hook emitting different keys per row unions the key set
    across the batch; rows missing a key get null (first-row-only key
    capture used to KeyError / silently drop later-only columns)."""
    reg = hk.HookRegistry()
    reg.register_processor(
        "ragged",
        fn=lambda i, t: {"len": len(t), "caps": 1} if i == 1 else {"len": len(t)},
    )
    got = (
        hk.process_documents(_docs().repartition(1), registry=reg)
        .to_pandas()
        .sort_values("doc_id")
    )
    assert sorted(got.columns) == ["doc_id", "ragged_caps", "ragged_len"]
    assert got["ragged_len"].tolist() == [13, 15, 7]
    caps = got["ragged_caps"].tolist()
    assert caps[0] == 1 and pd.isna(caps[1]) and pd.isna(caps[2])


def test_declared_columns_stable_across_batches(ray_session):
    """columns=[...] pins the hook's output schema: a key no row in a
    given BATCH emits still appears (all-null), so blocks agree on schema
    even when the emitted key set varies batch to batch; undeclared keys
    raise."""
    reg = hk.HookRegistry()
    reg.register_processor(
        "r",
        fn=lambda i, t: {"len": len(t), "caps": 1} if i == 1 else {"len": len(t)},
        columns=["len", "caps"],
    )
    # repartition(3): one row per batch -> batches 2 and 3 emit only 'len'
    got = (
        hk.process_documents(_docs().repartition(3), registry=reg)
        .to_pandas()
        .sort_values("doc_id")
    )
    assert sorted(got.columns) == ["doc_id", "r_caps", "r_len"]
    assert got["r_len"].tolist() == [13, 15, 7]
    caps = got["r_caps"].tolist()
    assert caps[0] == 1 and pd.isna(caps[1]) and pd.isna(caps[2])

    bad = hk.HookRegistry()
    bad.register_processor(
        "r", fn=lambda i, t: {"len": len(t), "rogue": 0}, columns=["len"]
    )
    with pytest.raises(Exception, match="undeclared"):
        hk.process_documents(_docs(), registry=bad).materialize()


def test_bad_hook_output_length_fails(ray_session):
    reg = hk.HookRegistry()
    reg.register_processor("bad", batch_fn=lambda ids, texts: {"value": [1]})
    ds = hk.process_documents(_docs(), registry=reg)
    with pytest.raises(Exception, match="1 values"):
        ds.materialize()
