"""Deterministic hashing kernels (no Python ``hash``; stable across runs).

- ``djb2``: the reference's term-partitioning hash
  (`MPI Version/src/dist_index.c:9-17`, owner = djb2(term) % size) — the same
  role our shard key plays for the frontier.
- ``hash31``: the reference's URL filename hash (`Serial Version/src/crawler.c:84-88`).
- ``stable_hash64`` / vectorized helpers: engine-standard 64-bit hashes
  (FNV-1a) used for URL-seen keys, shard routing and dedup keys.
- MinHash / SimHash primitives for the near-dup pipelines.
"""

from __future__ import annotations

import numpy as np

_FNV_OFFSET = 0xCBF29CE484222325
_FNV_PRIME = 0x100000001B3
_MASK64 = 0xFFFFFFFFFFFFFFFF


def djb2(s: str) -> int:
    h = 5381
    for ch in s.encode("utf-8", "surrogateescape"):
        h = ((h * 33) + ch) & _MASK64
    return h


def hash31(s: str) -> int:
    """u32 31-hash, `Serial Version/src/crawler.c:84-88`."""
    h = 0
    for ch in s:
        h = (31 * h + ord(ch)) & 0xFFFFFFFF
    return h


def stable_hash64(s: str) -> int:
    """FNV-1a 64-bit over UTF-8 bytes."""
    h = _FNV_OFFSET
    for b in s.encode("utf-8", "surrogateescape"):
        h = ((h ^ b) * _FNV_PRIME) & _MASK64
    return h


def stable_hash64_bytes(data: bytes) -> int:
    h = _FNV_OFFSET
    for b in data:
        h = ((h ^ b) * _FNV_PRIME) & _MASK64
    return h


def fold_bucket(tok: str, n_buckets: int) -> int:
    """Char-fold bucket hash — THE cross-operator contract hash shared by
    dsir_weights, the hashed-BoW featurizers (quality classifier, RAG
    chunk embeddings) and their DuckDB oracle mirrors, which inline the
    identical fold as
    ``list_reduce(list_transform(string_split(t,''), c -> ascii(c)),
    (a,b) -> (a*31+b) % M) % M``. acc seeds with the first codepoint,
    folds (acc*31 + codepoint) % n_buckets, final mod for 1-char tokens.
    Do NOT change without changing every SQL mirror."""
    acc = ord(tok[0])
    for ch in tok[1:]:
        acc = (acc * 31 + ord(ch)) % n_buckets
    return acc % n_buckets


def shard_of(url: str, num_shards: int) -> int:
    """Frontier shard routing key. Hash of the full canonical URL (not just
    host) so one hot host spreads over shards; politeness for a host is
    coordinated by its home shard (see state/frontier.py salt notes)."""
    return stable_hash64(url) % num_shards


def host_shard(host: str, num_shards: int) -> int:
    """Home shard of a host (politeness owner)."""
    return stable_hash64(host) % num_shards


# ---------------------------------------------------------------------------
# MinHash (for LSH near-dup): vectorized over a shingle-hash array.
# Universal hashing h_i(x) = (a_i * x + b_i) mod p, p = 2^61 - 1.
_MERSENNE61 = (1 << 61) - 1


def minhash_params(num_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE61, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE61, size=num_perm, dtype=np.uint64)
    return a, b


def minhash_signature(shingle_hashes: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Signature of one document: min over shingles of (a*x+b) mod p.
    Empty shingle set -> all-max sentinel signature."""
    if shingle_hashes.size == 0:
        return np.full(a.shape[0], np.iinfo(np.uint64).max, dtype=np.uint64)
    x = shingle_hashes.astype(np.uint64)[:, None]  # (n, 1)
    # Python-int modmul to dodge uint64 overflow: do it in object space only
    # for tiny arrays; vector path uses float-safe splitting.
    prod = (x * a[None, :]) + b[None, :]  # wraps mod 2^64 — fine as a hash
    vals = prod % np.uint64(_MERSENNE61)
    return vals.min(axis=0)


from functools import lru_cache


@lru_cache(maxsize=1 << 18)
def _token_hash_cached(tok: str) -> int:
    return stable_hash64(tok)


def token_hashes(tokens: list[str]) -> np.ndarray:
    """Per-token 64-bit hashes with an LRU memo (web text repeats tokens
    heavily; the cache turns the Python FNV loop into a dict hit)."""
    return np.fromiter(
        (_token_hash_cached(t) for t in tokens), dtype=np.uint64, count=len(tokens)
    )


_SH_C1 = np.uint64(0x9E3779B97F4A7C15)
_SH_C2 = np.uint64(0xC2B2AE3D27D4EB4F)
_SH_C3 = np.uint64(0x165667B19E3779F9)


def shingle_hashes_vec(th: np.ndarray, k: int = 3) -> np.ndarray:
    """Vectorized k-shingle hashes from a token-hash array: position-salted
    multiply-xor combine over a sliding window (wraps mod 2^64 — a
    deterministic seeded family, not meant to match the string-join
    variant)."""
    n = th.shape[0]
    if n == 0:
        return np.array([], dtype=np.uint64)
    if n < k:
        out = th[0] * _SH_C1
        for i in range(1, n):
            out = out ^ (th[i] * (_SH_C2 if i % 2 else _SH_C3))
        return np.array([out], dtype=np.uint64)
    acc = th[: n - k + 1] * _SH_C1
    for j in range(1, k):
        salt = _SH_C2 if j % 2 else _SH_C3
        acc = acc ^ (th[j : n - k + 1 + j] * salt)
    return acc


def shingle_hashes(tokens: list[str], k: int = 3) -> np.ndarray:
    """k-gram (word-level) shingle hashes of a token list."""
    if len(tokens) < k:
        joined = " ".join(tokens)
        return np.array([stable_hash64(joined)], dtype=np.uint64) if tokens else np.array([], dtype=np.uint64)
    return np.fromiter(
        (stable_hash64(" ".join(tokens[i : i + k])) for i in range(len(tokens) - k + 1)),
        dtype=np.uint64,
        count=len(tokens) - k + 1,
    )


def simhash64(tokens: list[str]) -> int:
    """Charikar SimHash over token 64-bit hashes (unweighted)."""
    if not tokens:
        return 0
    hashes = np.fromiter((stable_hash64(t) for t in tokens), dtype=np.uint64, count=len(tokens))
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int64
    )
    counts = bits.sum(axis=0)
    sign = counts * 2 > len(tokens)
    out = 0
    for bit_idx in np.nonzero(sign)[0]:
        out |= 1 << int(bit_idx)
    return out


def hamming64(x: int, y: int) -> int:
    return bin(x ^ y).count("1")


def rolling_fingerprint(text: str, window: int = 64, keep: int = 8) -> list[int]:
    """Document fingerprinting via winnowed rolling (Rabin-Karp style) hashes:
    polynomial rolling hash over a sliding char window; keep the ``keep``
    smallest distinct window hashes as the fingerprint (deterministic)."""
    n = len(text)
    if n == 0:
        return []
    if n <= window:
        return [stable_hash64(text)]
    base = 257
    mod = _MERSENNE61
    pow_w = pow(base, window - 1, mod)
    h = 0
    for i in range(window):
        h = (h * base + ord(text[i])) % mod
    out = {h}
    for i in range(window, n):
        h = ((h - ord(text[i - window]) * pow_w) * base + ord(text[i])) % mod
        out.add(h)
    return sorted(out)[:keep]
