"""Safe distinct-values primitive for bounded key domains.

Ray 2.49's ``Dataset.unique()`` crashes whenever the dataset mixes EMPTY and
non-empty blocks: the ``Unique`` aggregate's combine does
``_to_set(accumulator)`` which falls through to ``{ndarray}`` ->
``TypeError: unhashable type: 'numpy.ndarray'``.  ``groupby(part).map_groups``
output routinely contains empty partitions at scale (hash partitions with no
resident keys), so every ``.unique()`` over a shuffle output is a latent
crash — it took down the round-2 flagship curation pipeline.

``distinct_values`` is the engine's replacement: a per-block ``pc.unique``
inside ``map_batches`` (distributed, empty-block-proof — an empty block just
yields zero rows), then a bounded driver-side set union over the already-
deduplicated per-block survivors.  Intended for BOUNDED domains that are
about to be broadcast anyway (dimension keys, candidate-id sets, drop-id
sets, query-term probes); for unbounded domains use a groupby aggregation
instead of pulling values to the driver.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def distinct_values(ds, col: str) -> list:
    """Sorted list of distinct non-null values of ``ds[col]``.

    Per-block dedup runs distributed; only per-block distinct values reach
    the driver. Degenerate zero-column blocks (Acero empty-partition
    artifacts) are tolerated.
    """
    try:
        col_type = ds.schema().base_schema.field(col).type
    except (KeyError, AttributeError):
        col_type = None

    def _block_unique(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or col not in b.column_names:
            return pa.table(
                {col: pa.array([], col_type if col_type is not None else pa.null())}
            )
        u = pc.unique(b[col].combine_chunks())
        return pa.table({col: pc.drop_null(u)})

    out: set = set()
    per_block = ds.map_batches(_block_unique, batch_format="pyarrow")
    for batch in per_block.iter_batches(batch_format="pyarrow", batch_size=65536):
        out.update(v for v in batch[col].to_pylist() if v is not None)
    return sorted(out)
