"""Text-analysis kernels for the training-data pipeline operators.

Engine additions beyond the reference (which only tokenizes + BM25-ranks):
language ID, quality scoring, token counting, fingerprinting. All are pure
and vectorization-friendly; the Ray stages in pipelines/text.py apply them
per batch. Quality-score component definitions intentionally line up with
what ANSI SQL can express so the DuckDB oracle can verify them exactly.
"""

from __future__ import annotations

import re

import numpy as np

# Tiny per-language stopword profiles for the n-gram/stopword language-ID
# heuristic. Deliberately small + deterministic (no external models).
_LANG_PROFILES: dict[str, frozenset[str]] = {
    "en": frozenset(
        "the of and to in is you that it he was for on are as with his they at be this have from".split()
    ),
    "de": frozenset(
        "der die das und ist du ich nicht sie es ein zu mit sich auf für als auch an werden".split()
    ),
    "fr": frozenset(
        "le la les des et est vous que il était pour sur sont avec ses ils à être cette ont de".split()
    ),
    "es": frozenset(
        "el la los de y es usted que él era para en son con sus ellos ser esta tienen las un".split()
    ),
}

_WORD_RE = re.compile(r"[a-zA-ZÀ-ÿ]+")


def lang_id(text: str) -> tuple[str, float]:
    """Stopword-profile language ID. Returns (lang, score) where score is the
    fraction of words hitting the winning profile; ('und', 0.0) when nothing
    matches or the text has no words."""
    words = [w.lower() for w in _WORD_RE.findall(text[:4000])]
    if not words:
        return ("und", 0.0)
    best_lang, best_hits = "und", 0
    for lang, prof in _LANG_PROFILES.items():
        hits = sum(1 for w in words if w in prof)
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    if best_hits == 0:
        return ("und", 0.0)
    return (best_lang, best_hits / len(words))


# Quality-score components — SQL-expressible definitions (see oracle_sql):
#   n_chars        = length(text)
#   n_ws_tokens    = number of whitespace-separated tokens
#   mean_token_len = (chars in tokens) / n_ws_tokens
#   alpha_ratio    = count([A-Za-z]) / n_chars
#   digit_ratio    = count([0-9]) / n_chars
#   punct_ratio    = count(.,;:!?) / n_chars
#   stopword_ratio = tokens (lowercased, stripped) in the 5 reference
#                    stopwords / n_ws_tokens

_ALPHA_RE = re.compile(r"[A-Za-z]")
_DIGIT_RE = re.compile(r"[0-9]")
_PUNCT_RE = re.compile(r"[.,;:!?]")
_REF_STOPWORDS = frozenset(("the", "a", "an", "in", "of"))


def quality_score(text: str) -> dict[str, float]:
    n = len(text)
    toks = text.split()
    n_tok = len(toks)
    alpha = len(_ALPHA_RE.findall(text))
    digit = len(_DIGIT_RE.findall(text))
    punct = len(_PUNCT_RE.findall(text))
    stop = sum(1 for t in toks if t.lower().strip(".,;:!?\"'()") in _REF_STOPWORDS)
    return {
        "n_chars": float(n),
        "n_ws_tokens": float(n_tok),
        "alpha_ratio": alpha / n if n else 0.0,
        "digit_ratio": digit / n if n else 0.0,
        "punct_ratio": punct / n if n else 0.0,
        "stopword_ratio": stop / n_tok if n_tok else 0.0,
    }


_BPEISH_RE = re.compile(r"[a-z]+|[A-Z][a-z]*|[0-9]{1,3}|[^\sa-zA-Z0-9]")


def token_counts(text: str) -> tuple[int, int]:
    """(whitespace token count, BPE-ish subword count). The BPE-ish regex
    splits lowercase runs, TitleCase pieces, short digit groups, and single
    symbols — a deterministic stand-in for a real BPE vocabulary."""
    return (len(text.split()), len(_BPEISH_RE.findall(text)))


def char_ngrams(text: str, n: int = 3) -> list[str]:
    t = " " + re.sub(r"\s+", " ", text.strip().lower()) + " "
    if len(t) < n:
        return [t]
    return [t[i : i + n] for i in range(len(t) - n + 1)]


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


def cosine_topk(queries: np.ndarray, corpus: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Brute-force cosine top-k: (Q,d) x (N,d) -> indices (Q,k), scores (Q,k).
    Rows are L2-normalized here; zero vectors stay zero."""

    def _norm(m):
        nrm = np.linalg.norm(m, axis=1, keepdims=True)
        nrm[nrm == 0] = 1.0
        return m / nrm

    qn, cn = _norm(queries.astype(np.float64)), _norm(corpus.astype(np.float64))
    sims = qn @ cn.T  # (Q, N)
    k = min(k, sims.shape[1])
    idx = np.argpartition(-sims, k - 1, axis=1)[:, :k]
    part = np.take_along_axis(sims, idx, axis=1)
    order = np.argsort(-part, axis=1, kind="stable")
    idx_sorted = np.take_along_axis(idx, order, axis=1)
    scores_sorted = np.take_along_axis(part, order, axis=1)
    return idx_sorted, scores_sorted
