"""DuckDB-compatible rounding (half away from zero).

Python's round() and numpy/pyarrow round are banker's (half-to-even);
DuckDB's round() is half-away-from-zero (std::round). The driver's
correctness gate hashes exact values, so every float column the oracle SQL
rounds must be rounded the same way on the Ray side — e.g. 105/128 =
0.8203125 must round to 0.820313, not 0.820312.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def round_half_away(x, ndigits: int):
    """Vectorized half-away-from-zero round. Accepts float, ndarray, or
    pyarrow array; returns the same family (arrays as float64)."""
    if isinstance(x, pa.ChunkedArray):
        x = x.combine_chunks()
    if isinstance(x, pa.Array):
        out = round_half_away(x.to_numpy(zero_copy_only=False), ndigits)
        return pa.array(out, pa.float64())
    p = 10.0 ** ndigits
    arr = np.asarray(x, dtype=np.float64)
    out = np.copysign(np.floor(np.abs(arr) * p + 0.5), arr) / p
    out = np.where(out == 0.0, 0.0, out)  # normalize -0.0
    if np.isscalar(x) or getattr(x, "ndim", 1) == 0:
        return float(out)
    return out
