"""REST control plane over the engine (SURVEY.md §2.10).

Reference analog: the Flask dashboard API (`WebSite/api.py:350-520`) with
routes /api/status, /api/search, /api/metrics, /api/compare, where "engine
versions" are the reference's six parallel C builds. Here the engine is ONE
Ray Data pipeline library, so the comparable axis is the pipeline VARIANT
(bm25 / bm25_expanded / pattern); CPU-config comparison lives in the CLI
``compare`` subcommand (fresh processes — a server can't re-init its own
Ray session per request).

Stdlib-only (http.server) — no Flask in the container. The server never
calls ray.init: the CLI ``serve`` command (or a test) owns the session and
passes a ready EngineHandle. Request handling is thread-per-request
(ThreadingHTTPServer); Ray Data execution is driver-serialized per request
via a lock, which is the right semantics for a control plane (queries are
interactive top-k probes, not throughput traffic).
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class EngineHandle:
    """Serving handle over a docs Dataset, backed by a PERSISTED term index.

    Default (``adhoc=False``): the server-side analog of the reference's
    build-index-once evaluate loop (`Serial Version/src/evaluate.c:28-66`)
    at deployment shape — the inverted index is written ONCE to disk
    (`index.write_term_index` layout; reused as-is when ``index_dir``
    already holds a manifest) and every bm25 / bm25_expanded request reads
    only the query terms' hash buckets (`rank.bm25_from_index`). Nothing
    corpus-scale is ever pinned in the object store: at 100 TB the server's
    steady-state footprint is the manifest dict, and a query reads
    postings-of-q from disk. The ``pattern`` variant is an inherent corpus
    scan (substring counts over full text) and streams ``docs`` lazily.

    ``adhoc=True`` keeps the previous behavior — the full tf table
    materialized in the object store at construction — as a fallback for
    corpora too small/ephemeral to bother persisting. Equality of the two
    paths is pytest-asserted (test_server.py) and oracle-checked
    (bm25_served).
    """

    VARIANTS = ("bm25", "bm25_expanded", "pattern")

    def __init__(self, docs, metrics=None, index_dir=None, adhoc=False):
        from .pipelines.metrics import MetricsRecorder
        from .sources.io import read_manifest

        self.docs = docs
        self.metrics = metrics or MetricsRecorder(None)
        self._lock = threading.Lock()
        self.adhoc = adhoc
        self.tf = None
        self.index_dir = None
        if adhoc:
            from .pipelines.index import term_doc_tf

            self.num_docs = docs.count()
            self.tf = term_doc_tf(docs).materialize()
            return
        import os
        import tempfile

        from .pipelines.index import write_term_index

        self._owns_index_dir = index_dir is None
        self.index_dir = index_dir or tempfile.mkdtemp(prefix="hppse_index_")
        man = read_manifest(self.index_dir)
        if man is None:
            if docs is None:
                raise FileNotFoundError(
                    f"no index manifest under {self.index_dir} and no docs "
                    "to build one from"
                )
            # refuse to build into a non-empty user directory that is NOT
            # an index: write_term_index starts with rmtree(out_dir), and a
            # typo'd/reused --index-dir must not silently delete data
            if (
                not self._owns_index_dir
                and os.path.isdir(self.index_dir)
                and os.listdir(self.index_dir)
            ):
                raise ValueError(
                    f"--index-dir {self.index_dir} exists, is non-empty and "
                    "holds no index MANIFEST.json; refusing to overwrite it "
                    "— point at an empty/new directory or a built index"
                )
            man = write_term_index(docs, self.index_dir)
        self.manifest = man
        self.num_docs = int(man["n_docs"])

    def close(self) -> None:
        """Remove the auto-created temp index dir (no-op for adhoc mode or
        a user-supplied --index-dir)."""
        import shutil

        if getattr(self, "_owns_index_dir", False) and self.index_dir:
            shutil.rmtree(self.index_dir, ignore_errors=True)
            self.index_dir = None

    def search(self, query: str, k: int = 10, variant: str = "bm25") -> dict:
        from .pipelines.rank import (
            bm25_from_index,
            bm25_from_index_expanded,
            bm25_topk,
            bm25_topk_expanded,
            pattern_match_counts,
        )

        if variant not in self.VARIANTS:
            raise ValueError(
                f"Invalid version: {variant}. Must be one of: "
                + ", ".join(self.VARIANTS)
            )
        t0 = time.perf_counter()
        with self._lock:
            if variant == "bm25":
                if self.adhoc:
                    rows = bm25_topk(self.docs, query, k=k, tf=self.tf).to_pylist()
                else:
                    rows = bm25_from_index(self.index_dir, query, k=k).to_pylist()
            elif variant == "bm25_expanded":
                if self.adhoc:
                    rows = bm25_topk_expanded(self.docs, query, k=k).to_pylist()
                else:
                    rows = bm25_from_index_expanded(
                        self.index_dir, query, k=k
                    ).to_pylist()
            else:
                if self.docs is None:
                    raise ValueError(
                        "pattern search needs the docs table; server was "
                        "started index-only"
                    )
                t = pattern_match_counts(self.docs, [query])
                rows = (
                    t.sort(["n_matches", "doc_id"], descending=[True, False])
                    .limit(k)
                    .take_all()
                )
        ms = (time.perf_counter() - t0) * 1000.0
        self.metrics.record_query_latency(ms)
        return {
            "query": query,
            "version": variant,
            "results": rows,
            "execution_time_ms": round(ms, 3),
        }

    def status(self) -> dict:
        import ray

        return {
            "engine": "ray-data",
            "api_version": "1.0",
            "serving": "adhoc" if self.adhoc else "index",
            "num_docs": self.num_docs,
            # pattern search is an inherent corpus scan: unavailable on an
            # index-only server, and /api/status must say so
            "versions": {
                v: {"available": v != "pattern" or self.docs is not None}
                for v in self.VARIANTS
            },
            "ray_cpus": ray.cluster_resources().get("CPU")
            if ray.is_initialized()
            else None,
        }


# Single-file dashboard front-end (reference analog: the static `WebSite/`
# HTML/JS console). Original markup, inline CSS/JS, zero external assets —
# the sandbox has no network and the control plane should not grow static
# file serving. It drives the same four API routes the JSON clients use.
DASHBOARD_HTML = """<!doctype html>
<html lang="en"><head><meta charset="utf-8">
<title>search engine console</title>
<style>
 body{font-family:system-ui,sans-serif;margin:2rem auto;max-width:52rem;
      color:#222}
 h1{font-size:1.3rem} h2{font-size:1rem;margin-top:1.5rem}
 input,select,button{font-size:1rem;padding:.3rem .5rem;margin-right:.4rem}
 #q{width:22rem}
 table{border-collapse:collapse;margin-top:.6rem;width:100%}
 td,th{border:1px solid #ccc;padding:.25rem .5rem;text-align:left;
       font-size:.9rem}
 #status,#metrics{white-space:pre-wrap;font-family:monospace;font-size:.85rem;
      background:#f6f6f6;padding:.6rem;border-radius:4px}
 .err{color:#a00}
</style></head><body>
<h1>search engine console</h1>
<form id="f">
 <input id="q" placeholder="query terms" autofocus>
 <select id="v"><option>bm25</option><option>bm25_expanded</option>
  <option>pattern</option></select>
 <input id="k" type="number" value="10" min="1" max="100" style="width:4rem">
 <button>search</button>
</form>
<div id="out"></div>
<h2>engine status</h2><div id="status">loading…</div>
<h2>query metrics</h2><div id="metrics">–</div>
<script>
const $=id=>document.getElementById(id);
// crawled content (doc ids/urls) and server error strings are untrusted —
// escape before any innerHTML interpolation (stored/reflected XSS otherwise)
const esc=s=>String(s).replace(/[&<>"']/g,
  c=>({"&":"&amp;","<":"&lt;",">":"&gt;",'"':"&quot;","'":"&#39;"}[c]));
async function j(url,opts){const r=await fetch(url,opts);return r.json();}
async function refresh(){
  $("status").textContent=JSON.stringify(await j("/api/status"),null,1);
  $("metrics").textContent=JSON.stringify(await j("/api/metrics"),null,1);
}
$("f").addEventListener("submit",async e=>{
  e.preventDefault();
  const body=JSON.stringify({query:$("q").value,version:$("v").value,
                             k:+$("k").value});
  const res=await j("/api/search",{method:"POST",body});
  if(res.status!=="ok"){
    $("out").innerHTML='<p class="err">'+esc(res.error)+"</p>";return;}
  const rows=res.results.map(r=>{
    const id=r.doc_id??r.url??"?";
    const sc=r.score??r.n_matches??"";
    return "<tr><td>"+esc(id)+"</td><td>"+esc(sc)+"</td></tr>";}).join("");
  $("out").innerHTML="<table><tr><th>doc</th><th>score</th></tr>"+rows+
    "</table><p>"+esc(res.execution_time_ms)+" ms · "+esc(res.version)+"</p>";
  refresh();
});
refresh();
</script></body></html>"""


class _Handler(BaseHTTPRequestHandler):
    engine: EngineHandle  # set by make_server

    def log_message(self, *args):  # control plane stays quiet on stdout
        pass

    def _reply(self, code: int, payload: dict) -> None:
        body = json.dumps(payload).encode("utf-8")
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _body(self) -> dict:
        n = int(self.headers.get("Content-Length") or 0)
        if not n:
            return {}
        return json.loads(self.rfile.read(n).decode("utf-8"))

    def _reply_html(self, code: int, html: str) -> None:
        body = html.encode("utf-8")
        self.send_response(code)
        self.send_header("Content-Type", "text/html; charset=utf-8")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):  # noqa: N802 — http.server API
        try:
            if self.path in ("/", "/index.html"):
                self._reply_html(200, DASHBOARD_HTML)
            elif self.path == "/api/status":
                self._reply(200, {"status": "ok", **self.engine.status()})
            elif self.path == "/api/metrics":
                self._reply(
                    200,
                    {"status": "ok", "metrics": self.engine.metrics.snapshot()},
                )
            else:
                self._reply(404, {"status": "error", "error": "not found"})
        except Exception as e:  # noqa: BLE001 — mirror the reference's 500s
            self._reply(500, {"status": "error", "error": str(e)})

    def do_POST(self):  # noqa: N802 — http.server API
        try:
            data = self._body()
            if self.path == "/api/search":
                if "query" not in data:
                    self._reply(
                        400,
                        {"status": "error", "error": "Missing required field: query"},
                    )
                    return
                try:
                    res = self.engine.search(
                        data["query"],
                        k=int(data.get("k", 10)),
                        variant=data.get("version", "bm25"),
                    )
                except ValueError as ve:
                    self._reply(400, {"status": "error", "error": str(ve)})
                    return
                self._reply(200, {"status": "ok", **res})
            elif self.path == "/api/compare":
                if "query" not in data or "versions" not in data:
                    self._reply(
                        400,
                        {
                            "status": "error",
                            "error": "Missing required fields: query and versions",
                        },
                    )
                    return
                try:
                    results = {
                        v: self.engine.search(
                            data["query"], k=int(data.get("k", 10)), variant=v
                        )
                        for v in data["versions"]
                    }
                except ValueError as ve:
                    self._reply(400, {"status": "error", "error": str(ve)})
                    return
                self._reply(
                    200,
                    {"status": "ok", "query": data["query"], "results": results},
                )
            else:
                self._reply(404, {"status": "error", "error": "not found"})
        except Exception as e:  # noqa: BLE001
            self._reply(500, {"status": "error", "error": str(e)})


def make_server(engine: EngineHandle, port: int = 0) -> ThreadingHTTPServer:
    """Bind (port=0 -> ephemeral) and return the server; caller runs
    serve_forever (or a background thread) and shutdown()."""
    handler = type("BoundHandler", (_Handler,), {"engine": engine})
    return ThreadingHTTPServer(("127.0.0.1", port), handler)


def serve(engine: EngineHandle, port: int) -> None:
    try:
        srv = make_server(engine, port)
    except Exception:
        engine.close()  # don't leak the auto-built temp index on bind failure
        raise
    print(json.dumps({"serving": True, "port": srv.server_address[1]}), flush=True)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.shutdown()
        engine.close()
