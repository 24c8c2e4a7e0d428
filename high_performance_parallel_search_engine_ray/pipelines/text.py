"""Text-analysis pipelines over a (doc_id, text) Dataset (training-data ops).

All per-batch, no shuffles; quality metrics and token counts use the same
definitions the DuckDB oracle expresses (functions/textstats.py docs)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import rolling_fingerprint
from ..functions.rounding import round_half_away
from ..functions.textstats import lang_id, quality_score, token_counts


def quality_scores(docs, id_col: str = "doc_id", text_col: str = "text"):
    """(doc_id, n_chars, n_ws_tokens, alpha_ratio, digit_ratio, punct_ratio)
    — ratios rounded 6dp, fully vectorizable and SQL-mirrorable."""

    def qbatch(b: pa.Table) -> pa.Table:
        out = {
            id_col: b[id_col],
            "n_chars": [],
            "n_ws_tokens": [],
            "alpha_ratio": [],
            "digit_ratio": [],
            "punct_ratio": [],
        }
        for t in b[text_col].to_pylist():
            q = quality_score(t)
            out["n_chars"].append(int(q["n_chars"]))
            out["n_ws_tokens"].append(int(q["n_ws_tokens"]))
            out["alpha_ratio"].append(round_half_away(q["alpha_ratio"], 6))
            out["digit_ratio"].append(round_half_away(q["digit_ratio"], 6))
            out["punct_ratio"].append(round_half_away(q["punct_ratio"], 6))
        return pa.table(
            {
                id_col: out[id_col],
                "n_chars": pa.array(out["n_chars"], pa.int64()),
                "n_ws_tokens": pa.array(out["n_ws_tokens"], pa.int64()),
                "alpha_ratio": pa.array(out["alpha_ratio"], pa.float64()),
                "digit_ratio": pa.array(out["digit_ratio"], pa.float64()),
                "punct_ratio": pa.array(out["punct_ratio"], pa.float64()),
            }
        )

    return docs.map_batches(qbatch, batch_format="pyarrow")


def token_count_table(docs, id_col: str = "doc_id", text_col: str = "text"):
    """(doc_id, n_ws_tokens, n_bpeish_tokens)."""

    def tbatch(b: pa.Table) -> pa.Table:
        ws, bp = [], []
        for t in b[text_col].to_pylist():
            w, p = token_counts(t)
            ws.append(w)
            bp.append(p)
        return pa.table(
            {
                id_col: b[id_col],
                "n_ws_tokens": pa.array(ws, pa.int64()),
                "n_bpeish_tokens": pa.array(bp, pa.int64()),
            }
        )

    return docs.map_batches(tbatch, batch_format="pyarrow")


class LangIdStage:
    """Actor-pool language ID: profiles built once per actor in __init__
    (the stateful-stage pattern — reference analog: the lazily-loaded
    stopword list, `Serial Version/src/utils.c:9-31`)."""

    def __init__(self):
        from ..functions import textstats

        self._lang_id = textstats.lang_id  # profiles resident per actor

    def __call__(self, b: pa.Table) -> pa.Table:
        langs, scores = [], []
        for t in b["text"].to_pylist():
            lang, s = self._lang_id(t)
            langs.append(lang)
            scores.append(round_half_away(s, 6))
        return pa.table(
            {
                "doc_id": b["doc_id"],
                "lang_pred": pa.array(langs, pa.string()),
                "lang_score": pa.array(scores, pa.float64()),
            }
        )


def lang_id_table(docs, concurrency: int = 2):
    return docs.map_batches(
        LangIdStage, batch_format="pyarrow", concurrency=concurrency, num_cpus=1
    )


def fingerprint_table(docs, id_col: str = "doc_id", text_col: str = "text"):
    """(doc_id, fingerprint list<int64>) — winnowed rolling-hash doc
    fingerprints (functions/hashing.rolling_fingerprint)."""

    def fbatch(b: pa.Table) -> pa.Table:
        fps = [
            [x & 0x7FFFFFFFFFFFFFFF for x in rolling_fingerprint(t)]
            for t in b[text_col].to_pylist()
        ]
        return pa.table(
            {id_col: b[id_col], "fingerprint": pa.array(fps, pa.list_(pa.int64()))}
        )

    return docs.map_batches(fbatch, batch_format="pyarrow")
