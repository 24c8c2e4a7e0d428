"""Text-analysis pipelines over a (doc_id, text) Dataset (training-data ops).

All per-batch, no shuffles; quality metrics and token counts use the same
definitions the DuckDB oracle expresses (functions/textstats.py docs)."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import rolling_fingerprint
from ..functions.rounding import round_half_away


def _ratio(num, den) -> pa.Array:
    """num/den rounded 6dp, 0.0 where den == 0 (matches the scalar kernels
    and the oracle's CASE WHEN)."""
    import numpy as np

    n = np.asarray(num, dtype=np.float64)
    d = np.asarray(den, dtype=np.float64)
    out = np.divide(n, d, out=np.zeros_like(n), where=d != 0)
    return pa.array(round_half_away(out, 6), pa.float64())


def quality_scores(docs, id_col: str = "doc_id", text_col: str = "text"):
    """(doc_id, n_chars, n_ws_tokens, alpha_ratio, digit_ratio, punct_ratio)
    — pure pc kernels per batch (count_substring_regex for char classes and
    \\S+ token runs), no per-row Python. Definitions mirror
    functions/textstats.quality_score and the SQL oracle exactly."""

    def qbatch(b: pa.Table) -> pa.Table:
        txt = b[text_col]
        n_chars = pc.utf8_length(txt).cast(pa.int64())
        n_tok = pc.count_substring_regex(txt, r"\S+").cast(pa.int64())
        alpha = pc.count_substring_regex(txt, "[A-Za-z]")
        digit = pc.count_substring_regex(txt, "[0-9]")
        punct = pc.count_substring_regex(txt, "[.,;:!?]")
        nc = n_chars.to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: b[id_col],
                "n_chars": n_chars,
                "n_ws_tokens": n_tok,
                "alpha_ratio": _ratio(alpha.to_numpy(zero_copy_only=False), nc),
                "digit_ratio": _ratio(digit.to_numpy(zero_copy_only=False), nc),
                "punct_ratio": _ratio(punct.to_numpy(zero_copy_only=False), nc),
            }
        )

    return docs.map_batches(qbatch, batch_format="pyarrow")


# RE2 alternation is leftmost-first like Python re, so this counts the same
# matches as functions/textstats._BPEISH_RE.findall (verified by the
# token_counts oracle + the vectorized/scalar differential test).
_BPEISH_PATTERN = r"[a-z]+|[A-Z][a-z]*|[0-9]{1,3}|[^\sa-zA-Z0-9]"


def token_count_table(docs, id_col: str = "doc_id", text_col: str = "text"):
    """(doc_id, n_ws_tokens, n_bpeish_tokens) — vectorized
    count_substring_regex over the batch (no per-row Python)."""

    def tbatch(b: pa.Table) -> pa.Table:
        txt = b[text_col]
        return pa.table(
            {
                id_col: b[id_col],
                "n_ws_tokens": pc.count_substring_regex(txt, r"\S+").cast(pa.int64()),
                "n_bpeish_tokens": pc.count_substring_regex(
                    txt, _BPEISH_PATTERN
                ).cast(pa.int64()),
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
