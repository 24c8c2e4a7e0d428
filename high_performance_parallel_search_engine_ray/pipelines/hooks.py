"""Registered processing hooks — the engine's extension seam.

The reference exposes a callback surface a NON-AUTHOR wires custom logic
into: ``process_documents_parallel(..., ProcessorCallback)`` hands every
document file to a user callback distributed master/worker-style, and
``process_tokens_parallel(..., TokenCallback)`` does the same per token
(`MPI Version/src/parallel_processor.c:50-142` and `:144+`). This module is
that seam re-expressed Ray-Data-first: users REGISTER named hooks once
(driver side), and the engine compiles every registered hook into ONE
``map_batches`` pass — the distribution, batching and fault tolerance come
from Ray Data instead of hand-rolled MPI tag loops.

Two hook grains, mirroring the reference's two callback types:

- **document hooks** (``register_processor``): run once per document, emit
  one or more named scalar columns. Register either a vectorized
  ``batch_fn(ids, texts) -> dict[col, array-like]`` (preferred — stays on
  the Arrow/numpy fast path) or a per-row ``fn(doc_id, text) -> dict``
  convenience form (documented cost: a Python loop over the batch, exactly
  what the reference's per-file callback costs; fine for I/O-ish hooks,
  wrong for per-byte compute at 100 TB).
- **token hooks** (``register_token_hook``): run once per DISTINCT term,
  emit scalar columns. Same two forms (``batch_fn(terms_np) -> dict`` or
  ``fn(term) -> value``).

Hooks must be importable at the worker (top-level functions or lambdas
captured by cloudpickle — same contract as any ``map_batches`` fn). The
registry itself ships to workers inside the map closure; registration
after a pipeline is built does not retroactively change it (build-time
snapshot, deterministic).

Scale shape: one streaming pass for doc hooks (no shuffle); token hooks
cost exactly one (term)-groupby to reach distinct terms — the same
exchange ``term_df`` already pays — then a per-batch map.
"""

from __future__ import annotations

from typing import Any, Callable

import numpy as np
import pyarrow as pa


class HookRegistry:
    """Named doc/token hooks. A module-level DEFAULT_REGISTRY serves the
    common case; pipelines accept an explicit registry for isolation."""

    def __init__(self) -> None:
        self._doc_hooks: dict[str, tuple[Callable | None, Callable | None]] = {}
        self._token_hooks: dict[str, tuple[Callable | None, Callable | None]] = {}

    # -- registration ------------------------------------------------------
    def register_processor(
        self,
        name: str,
        fn: Callable[[Any, str], dict] | None = None,
        *,
        batch_fn: Callable[[np.ndarray, np.ndarray], dict] | None = None,
        columns: list[str] | None = None,
    ) -> None:
        """Register a document hook. Exactly one of ``fn`` (per-row) /
        ``batch_fn`` (vectorized) must be given. ``columns`` optionally
        declares the hook's output keys up front: rows/batches missing a
        declared key emit null and undeclared keys raise — without it, a
        per-row hook whose key set varies across BATCHES produces blocks
        with different schemas (per-batch key union only sees its own
        batch), which downstream operators reject."""
        if (fn is None) == (batch_fn is None):
            raise ValueError("register exactly one of fn= or batch_fn=")
        self._doc_hooks[name] = (fn, batch_fn, tuple(columns) if columns else None)

    def register_token_hook(
        self,
        name: str,
        fn: Callable[[str], Any] | None = None,
        *,
        batch_fn: Callable[[np.ndarray], dict] | None = None,
    ) -> None:
        """Register a token hook (per distinct term)."""
        if (fn is None) == (batch_fn is None):
            raise ValueError("register exactly one of fn= or batch_fn=")
        self._token_hooks[name] = (fn, batch_fn)

    def unregister(self, name: str) -> None:
        self._doc_hooks.pop(name, None)
        self._token_hooks.pop(name, None)

    def doc_hook_names(self) -> list[str]:
        return sorted(self._doc_hooks)

    def token_hook_names(self) -> list[str]:
        return sorted(self._token_hooks)


DEFAULT_REGISTRY = HookRegistry()

register_processor = DEFAULT_REGISTRY.register_processor
register_token_hook = DEFAULT_REGISTRY.register_token_hook


def _columns_from(outputs: dict[str, list | np.ndarray], n: int) -> dict:
    for col, vals in outputs.items():
        if len(vals) != n:
            raise ValueError(
                f"hook column {col!r} returned {len(vals)} values for a "
                f"{n}-row batch"
            )
    return outputs


def process_documents(
    docs,
    hooks: list[str] | None = None,
    registry: HookRegistry | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """(doc_id, <one column per hook output>) — every selected document
    hook applied in ONE streaming map_batches pass (no shuffle, nothing
    materialized). ``hooks=None`` runs every registered doc hook.

    The Ray analog of ``process_documents_parallel``: the reference
    distributes FILES to ranks and calls the callback per file; here Ray
    Data distributes row batches to tasks and the hook runs per row (or
    per batch in the vectorized form)."""
    reg = registry or DEFAULT_REGISTRY
    names = sorted(hooks) if hooks is not None else reg.doc_hook_names()
    chosen = [(n, *reg._doc_hooks[n]) for n in names]  # KeyError = fail fast

    def apply(b: pa.Table) -> pa.Table:
        ids = b[id_col].to_numpy(zero_copy_only=False)
        texts = b[text_col].to_numpy(zero_copy_only=False)
        cols: dict[str, Any] = {id_col: b[id_col]}
        for name, fn, batch_fn, declared in chosen:
            if batch_fn is not None:
                out = batch_fn(ids, texts)
            else:
                rows = [fn(i, t) for i, t in zip(ids, texts)]
                # union keys across ALL rows (a hook may emit different
                # keys per row; first-row-only would KeyError or silently
                # drop later-only columns) — missing values become nulls
                keys = sorted({k for r in rows for k in r})
                out = {k: [r.get(k) for r in rows] for k in keys}
            if declared is not None:
                # declared schema: stable across batches regardless of
                # which keys this batch's rows happened to emit
                extra = set(out) - set(declared)
                if extra:
                    raise ValueError(
                        f"hook {name!r} emitted undeclared columns {sorted(extra)}"
                    )
                out = {k: out.get(k, [None] * len(b)) for k in declared}
            for col, vals in _columns_from(out, len(b)).items():
                cols[name if col == "value" else f"{name}_{col}"] = vals
        return pa.table(cols)

    return docs.map_batches(apply, batch_format="pyarrow")


def process_tokens(
    docs,
    hooks: list[str] | None = None,
    registry: HookRegistry | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """(term, df, <one column per hook output>) over the corpus's DISTINCT
    terms — the Ray analog of ``process_tokens_parallel``: the reference
    scatters a token array across ranks and applies the callback per
    token; here distinct terms come from the same (term)-groupby exchange
    ``term_df`` pays, then hooks map per batch."""
    from .index import term_df

    reg = registry or DEFAULT_REGISTRY
    names = sorted(hooks) if hooks is not None else reg.token_hook_names()
    chosen = [(n, *reg._token_hooks[n]) for n in names]

    tdf = term_df(docs, id_col, text_col)

    def apply(b: pa.Table) -> pa.Table:
        terms = b["term"].to_numpy(zero_copy_only=False)
        cols: dict[str, Any] = {"term": b["term"], "df": b["df"]}
        for name, fn, batch_fn in chosen:
            if batch_fn is not None:
                out = batch_fn(terms)
            else:
                vals = [fn(t) for t in terms]
                out = {"value": vals}
            for col, vals in _columns_from(out, len(b)).items():
                cols[name if col == "value" else f"{name}_{col}"] = vals
        return pa.table(cols)

    return tdf.map_batches(apply, batch_format="pyarrow")
