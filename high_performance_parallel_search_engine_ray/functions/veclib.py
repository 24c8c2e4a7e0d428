"""Vectorized Arrow list<float> column -> numpy matrix conversion.

The embedding tables carry vectors as ``list<float>`` columns. The naive
``np.stack([np.asarray(v) for v in col.to_pylist()])`` pays a Python-object
round trip per ROW — the exact per-row tax the engine bans from hot stages.
For the (overwhelmingly common) fixed-dimension case the values buffer of
the flattened ListArray IS the matrix: one ``flatten()`` + ``reshape``.

Reference parity note: the reference engine's vector path loads embeddings
as contiguous C float arrays (one memcpy per file); this helper is the
Arrow-native equivalent of that layout assumption.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def list_column_to_matrix(col, dtype=np.float64) -> np.ndarray:
    """Convert an Arrow list<numeric> array/chunked-array (or a plain
    Python sequence of sequences) to a 2-D numpy matrix.

    Fixed-dimension lists (every embedding table in practice) take the
    zero-Python path: flatten() -> one contiguous values buffer ->
    reshape. Ragged input falls back to the per-row stack with a clear
    error if rows disagree in length (np.stack raises).
    """
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if isinstance(col, pa.Array):
        n = len(col)
        if n == 0:
            return np.empty((0, 0), dtype=dtype)
        lengths = pc.list_value_length(col)
        if pc.count_distinct(lengths).as_py() == 1 and lengths[0].as_py() is not None:
            d = lengths[0].as_py()
            flat = col.flatten().to_numpy(zero_copy_only=False)
            return np.ascontiguousarray(flat.reshape(n, d), dtype=dtype)
        col = col.to_pylist()
    return np.stack([np.asarray(v, dtype=dtype) for v in col])
