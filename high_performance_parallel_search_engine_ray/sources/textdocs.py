"""Reference-format text-document dataset reader/writer.

The reference stores each crawled page as ``dataset/<name>.txt`` with a
``Source URL: <url>\\n\\n`` header followed by the extracted text
(`Serial Version/src/crawler.c:963-968`), then re-reads the directory to
build the index (`build_index`, `Serial Version/src/index.c:15-67`:
readdir order, dotfiles skipped, doc_id by encounter order).

These functions make the Ray engine a drop-in consumer/producer of that
on-disk format: a user of the reference can point the engine at an existing
``dataset/`` directory, and crawl output can be exported back to it.
"""

from __future__ import annotations

import os

import pyarrow as pa

HEADER_PREFIX = "Source URL: "


def parse_text_doc(payload: bytes, filename: str) -> dict:
    """One reference text file -> {url, filename, text}."""
    text = payload.decode("utf-8", "replace")
    url = ""
    if text.startswith(HEADER_PREFIX):
        nl = text.find("\n")
        if nl != -1:
            url = text[len(HEADER_PREFIX) : nl]
            body_start = nl + 2 if text[nl : nl + 2] == "\n\n" else nl + 1
            text = text[body_start:]
    return {"url": url, "filename": filename, "text": text}


def read_text_docs(folder: str):
    """Ray Dataset over a reference ``dataset/`` directory: one row per
    file, columns (doc_id, url, filename, text). doc_id = sorted-filename
    order (readdir order is filesystem-dependent; sorted is the
    deterministic choice, documented divergence)."""
    import ray.data as rd

    names = sorted(
        f for f in os.listdir(folder) if not f.startswith(".")
    )  # dotfiles skipped, as index.c:32
    paths = [os.path.join(folder, f) for f in names]
    ds = rd.read_binary_files(paths, include_paths=True)

    def to_rows(batch: pa.Table) -> pa.Table:
        rows = {"doc_id": [], "url": [], "filename": [], "text": []}
        for path, payload in zip(batch["path"].to_pylist(), batch["bytes"].to_pylist()):
            fname = os.path.basename(path)
            r = parse_text_doc(payload, fname)
            rows["doc_id"].append(names.index(fname))
            rows["url"].append(r["url"])
            rows["filename"].append(fname)
            rows["text"].append(r["text"])
        return pa.table(
            {
                "doc_id": pa.array(rows["doc_id"], pa.int64()),
                "url": pa.array(rows["url"], pa.string()),
                "filename": pa.array(rows["filename"], pa.string()),
                "text": pa.array(rows["text"], pa.string()),
            }
        )

    return ds.map_batches(to_rows, batch_format="pyarrow")


def write_text_docs(docs_ds, folder: str) -> int:
    """Export crawl docs (doc_id=url, spans) to the reference's on-disk
    format — flat text reconstructed via render_flat, filename via the
    reference's derivation (`get_url_filename` / `get_medium_filename`)."""
    import pyarrow as pa

    from ..functions.htmltext import get_medium_filename, render_flat
    from ..functions.urlnorm import get_url_filename

    os.makedirs(folder, exist_ok=True)

    def write_batch(batch: pa.Table) -> pa.Table:
        n = 0
        for url, spans in zip(batch["doc_id"].to_pylist(), batch["spans"].to_pylist()):
            events = [(s["kind"], s["text"]) for s in spans if s["kind"] not in ("link", "media")]
            flat = render_flat(events)
            if "medium.com" in url:
                fname = get_medium_filename(url, flat)
            else:
                fname = get_url_filename(url)
            with open(os.path.join(folder, fname), "w") as f:
                f.write(f"{HEADER_PREFIX}{url}\n\n")
                f.write(flat)
            n += 1
        return pa.table({"written": pa.array([n], pa.int64())})

    out = docs_ds.map_batches(write_batch, batch_format="pyarrow")
    return int(out.sum("written") or 0)
