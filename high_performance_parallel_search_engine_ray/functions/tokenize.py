"""Tokenizers.

- ``tokenize_serial``: canonical semantics, `Serial Version/src/parser.c:51-76`
  (strtok on the serial delimiter set, lowercase, stopword drop, no-op stem
  `Serial Version/src/utils.c:34-37`). Stopword list = the reference's
  `Serial Version/data/stopwords.txt` (the, a, an, in, of) loaded lazily once
  per process (`Serial Version/src/utils.c:9-31`).
- ``tokenize_openmp``: the OpenMP variant (extra delimiters, length 3..50;
  `OpenMP Version/src/parser.c:58-66`) behind a flag — see SURVEY.md §2.9.
- ``TokenizerConfig`` + ``tokenize_configured``: the CUDA version's
  configurable preprocessor (`CUDA-OpenMP Hybrid Version/src/parser.c:99-184,
  230-273,480-507`): lowercase, punctuation strip, whitespace collapse,
  min/max token length, must-contain-letter.

``add_token`` length semantics (`Serial Version/src/index.c:69-114`): tokens
longer than 62 chars never enter the index (the 64-char term buffer check) and
do not contribute to doc length; ``kept_terms`` reproduces that cut.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

SERIAL_DELIMS = " \t\n\r.,;:!?\"()[]{}<>"
OPENMP_DELIMS = SERIAL_DELIMS + "/-_=+@"
STOPWORDS = ("the", "a", "an", "in", "of")
MAX_TERM_LEN = 62  # term[64] buffer, `Serial Version/src/index.c:103-104`

_SERIAL_SPLIT = re.compile("[" + re.escape(SERIAL_DELIMS) + "]+")
_OPENMP_SPLIT = re.compile("[" + re.escape(OPENMP_DELIMS) + "]+")
_STOPSET = frozenset(STOPWORDS)


def tokenize_serial(text: str) -> list[str]:
    """All tokens the serial tokenizer would pass to add_token (lowercased,
    stopwords dropped). Length filtering happens in `kept_terms`."""
    return [
        t for t in (tok.lower() for tok in _SERIAL_SPLIT.split(text)) if t and t not in _STOPSET
    ]


def kept_terms(tokens: list[str]) -> list[str]:
    """Apply add_token's term-length cut (`Serial Version/src/index.c:72,103`):
    tokens >100 chars skipped outright, new terms need len<63. Net: len<=62."""
    return [t for t in tokens if len(t) <= MAX_TERM_LEN]


def tokenize_openmp(text: str) -> list[str]:
    """`OpenMP Version/src/parser.c:51-76`: wider delimiter set, keep only
    length 3..50, lowercase, stopword drop."""
    out = []
    for tok in _OPENMP_SPLIT.split(text):
        t = tok.lower()
        if 3 <= len(t) <= 50 and t not in _STOPSET:
            out.append(t)
    return out


@dataclass(frozen=True)
class TokenizerConfig:
    """CUDA-version parser options (`CUDA-OpenMP .../src/parser.c:480-507`)."""

    lowercase: bool = True
    strip_punctuation: bool = True
    collapse_whitespace: bool = True
    min_token_len: int = 1
    max_token_len: int = 100
    require_letter: bool = True
    drop_stopwords: bool = True


_PUNCT_RE = re.compile(r"[^\w\s]")
_WS_RE = re.compile(r"\s+")
_LETTER_RE = re.compile(r"[a-zA-Z]")


def tokenize_configured(text: str, cfg: TokenizerConfig) -> list[str]:
    if cfg.lowercase:
        text = text.lower()
    if cfg.strip_punctuation:
        text = _PUNCT_RE.sub(" ", text)
    if cfg.collapse_whitespace:
        text = _WS_RE.sub(" ", text)
    out = []
    for tok in text.split():
        if not (cfg.min_token_len <= len(tok) <= cfg.max_token_len):
            continue
        if cfg.require_letter and not _LETTER_RE.search(tok):
            continue
        if cfg.drop_stopwords and tok in _STOPSET:
            continue
        out.append(tok)
    return out


def tokenize_query(query: str) -> list[str]:
    """Query tokenization, `Serial Version/src/ranking.c:36-45`: whitespace
    split ONLY (" \\t\\n\\r"), lowercase, stopword drop, no-op stem."""
    out = []
    for tok in re.split(r"[ \t\n\r]+", query):
        t = tok.lower()
        if t and t not in _STOPSET:
            out.append(t)
    return out
