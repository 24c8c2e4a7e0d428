"""Table IO: Lance when available, Parquet otherwise.

The north rule specifies Lance tables of interleaved documents. The ``lance``
package is not installed in this container (no network / no pip), so IO goes
through this gate: identical schemas and layouts, Parquet on disk, and the
Lance path activates automatically when ``import lance`` succeeds. Layout is
resumable per the checkpoint contract: one directory per logical table, one
file per partition, plus an atomically-renamed JSON manifest marking a
partition set complete (ray_guide: write temp, rename).
"""

from __future__ import annotations

import json
import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq

try:  # pragma: no cover - not installed in this sandbox
    import lance  # type: ignore

    HAVE_LANCE = True
except ImportError:
    lance = None
    HAVE_LANCE = False


def write_table(table: pa.Table, path: str) -> str:
    """Write one partition file. ``path`` excludes extension."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    if HAVE_LANCE:
        uri = path + ".lance"
        lance.write_dataset(table, uri, mode="overwrite")
        return uri
    uri = path + ".parquet"
    tmp = uri + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, uri)
    return uri


def read_table(path_no_ext: str) -> pa.Table:
    if HAVE_LANCE and os.path.exists(path_no_ext + ".lance"):
        return lance.dataset(path_no_ext + ".lance").to_table()
    return pq.read_table(path_no_ext + ".parquet")


def table_uri(path_no_ext: str) -> str:
    if HAVE_LANCE and os.path.exists(path_no_ext + ".lance"):
        return path_no_ext + ".lance"
    return path_no_ext + ".parquet"


def read_ray(path_no_ext: str, **kwargs):
    """ray.data reader over a table written by write_table."""
    import ray.data as rd

    if HAVE_LANCE and os.path.exists(path_no_ext + ".lance"):
        return rd.read_lance(path_no_ext + ".lance", **kwargs)
    return rd.read_parquet(path_no_ext + ".parquet", **kwargs)


def write_manifest(dir_path: str, payload: dict) -> None:
    """Atomic manifest write: the presence of MANIFEST.json marks the
    directory's partition set complete (crash between data files and the
    rename leaves a resumable, ignorable partial)."""
    os.makedirs(dir_path, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=dir_path, suffix=".manifest.tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(payload, f, indent=2, sort_keys=True)
    os.replace(tmp, os.path.join(dir_path, "MANIFEST.json"))


def read_manifest(dir_path: str) -> dict | None:
    p = os.path.join(dir_path, "MANIFEST.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def write_jsonl_docs(docs_ds, dir_path: str) -> str:
    """JSONL sink — the LLM-corpus interchange format (one JSON object per
    line, one file per block; resumable directory layout like every sink
    here). Returns ``dir_path``."""
    docs_ds.write_json(dir_path)
    return dir_path


def read_jsonl_docs(dir_path: str, **kwargs):
    """ray.data JSONL reader over a corpus written by ``write_jsonl_docs``
    (or any newline-delimited-JSON corpus dump)."""
    import ray.data as rd

    return rd.read_json(dir_path, **kwargs)


def write_csv_docs(docs_ds, dir_path: str) -> str:
    """CSV sink (one file per block) — the lowest-common-denominator
    interchange the reference's metrics files use (benchmark.c writes
    CSV); resumable directory layout like every sink here."""
    docs_ds.write_csv(dir_path)
    return dir_path


def read_csv_docs(dir_path: str, **kwargs):
    """ray.data CSV reader over a corpus written by ``write_csv_docs``."""
    import ray.data as rd

    return rd.read_csv(dir_path, **kwargs)


class _IpcDatasink:
    """Proper Ray Data Datasink for Arrow IPC: filenames derive from the
    write task's stable ``ctx.task_idx`` + per-task block ordinal, so a
    RETRIED write task overwrites its own files instead of adding a second
    copy (the round-3 advice: a uuid4-per-execution name plus tmp-then-
    rename guards partial files but NOT re-execution — under task retry or
    lineage reconstruction the first rename persists and the retry used to
    add a duplicate part file)."""

    def __init__(self, dir_path: str):
        self.dir_path = dir_path

    def on_write_start(self) -> None:
        os.makedirs(self.dir_path, exist_ok=True)

    def write(self, blocks, ctx) -> int:
        import pyarrow.ipc as ipc
        from ray.data.block import BlockAccessor

        n = 0
        for i, block in enumerate(blocks):
            b = BlockAccessor.for_block(block).to_arrow()
            name = f"part-{ctx.task_idx:06d}-{i:04d}.arrow"
            tmp = os.path.join(self.dir_path, "." + name + ".tmp")
            with ipc.RecordBatchFileWriter(tmp, b.schema) as w:
                w.write_table(b)
            os.replace(tmp, os.path.join(self.dir_path, name))
            n += b.num_rows
        return n

    def on_write_complete(self, write_result) -> None:
        pass

    def on_write_failed(self, error: Exception) -> None:
        pass

    @property
    def supports_distributed_writes(self) -> bool:
        return True

    @property
    def min_rows_per_write(self):
        return None

    def get_name(self) -> str:
        return "IpcDocs"


def write_ipc_docs(docs_ds, dir_path: str) -> str:
    """Arrow IPC (Feather v2) sink — the zero-parse interchange format for
    engine-to-engine handoff (schema + types travel intact, no JSON/CSV
    stringification). Ray Data has no built-in IPC sink, so this is a
    custom Datasink: one file per block under ``dir_path`` (the same
    resumable directory layout as every sink here), tmp-then-rename so a
    killed write never leaves a readable partial, and deterministic
    task-indexed filenames so a retried task overwrites rather than
    duplicates (idempotent under Ray task retry). Returns ``dir_path``."""
    from ray.data import Datasink

    # subclass inside the function so importing this module never needs ray;
    # our mixin comes FIRST so its __init__/write win the MRO
    class _IpcSink(_IpcDatasink, Datasink):
        pass

    docs_ds.write_datasink(_IpcSink(dir_path))
    return dir_path


def read_ipc_docs(dir_path: str):
    """Source for `write_ipc_docs` output: one read task per .arrow file
    (parallel, streaming — files never concentrate on the driver)."""
    import glob

    import ray.data as rd

    paths = sorted(glob.glob(f"{dir_path}/*.arrow"))

    def load(b):
        import pyarrow as pa
        import pyarrow.ipc as ipc

        tabs = []
        for p in b["path"].to_pylist():
            with ipc.open_file(p) as r:
                tabs.append(r.read_all())
        return pa.concat_tables(tabs, promote_options="default")

    return rd.from_items([{"path": p} for p in paths]).map_batches(
        load, batch_format="pyarrow", batch_size=1
    )
