"""REST control plane (server.py) — the reference dashboard API surface
(`WebSite/api.py:350-520`) re-expressed over the Ray engine: status, search,
metrics, compare, plus the reference's 400/404 error envelope."""

import json
import threading
import urllib.error
import urllib.request

import pytest
import ray.data as rd

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def server(ray_session):
    from high_performance_parallel_search_engine_ray.server import (
        EngineHandle,
        make_server,
    )

    docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    eng = EngineHandle(docs)  # default: persisted-index serving
    srv = make_server(eng, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", eng
    srv.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=60) as r:
        return json.load(r)


def _post(url, payload):
    req = urllib.request.Request(
        url,
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.load(r)


def test_status(server):
    base, _ = server
    d = _get(f"{base}/api/status")
    assert d["status"] == "ok" and d["api_version"] == "1.0"
    assert d["num_docs"] == 500
    assert d["serving"] == "index"
    assert set(d["versions"]) == {"bm25", "bm25_expanded", "pattern"}


def test_serves_from_persisted_index_no_tf_pin(server):
    """Default mode builds the on-disk term index once and pins nothing
    corpus-scale: no materialized tf table, manifest on disk."""
    import os

    _, eng = server
    assert eng.tf is None and not eng.adhoc
    assert os.path.exists(f"{eng.index_dir}/MANIFEST.json")
    assert os.path.isdir(f"{eng.index_dir}/postings")


def test_search_matches_direct_pipeline(server):
    """Served-vs-adhoc equality: the index-served bm25 result equals the
    fused single-pass corpus computation, row for row."""
    from high_performance_parallel_search_engine_ray.pipelines.rank import bm25_topk

    base, eng = server
    d = _post(f"{base}/api/search", {"query": "hash join", "k": 5})
    assert d["status"] == "ok" and d["execution_time_ms"] > 0
    direct = bm25_topk(eng.docs, "hash join", k=5).to_pylist()
    assert d["results"] == json.loads(json.dumps(direct))


def test_expanded_served_equals_adhoc(server):
    """bm25_expanded over the persisted index == the corpus-pass expanded
    pipeline, including when a term only matches via plural/singular
    fallback."""
    from high_performance_parallel_search_engine_ray.pipelines.rank import (
        bm25_from_index_expanded,
        bm25_topk_expanded,
    )

    base, eng = server
    for q in ("hash joins", "scan operator xyzzynonterm"):
        served = bm25_from_index_expanded(eng.index_dir, q, k=5).to_pylist()
        adhoc = bm25_topk_expanded(eng.docs, q, k=5).to_pylist()
        assert served == adhoc
        d = _post(
            f"{base}/api/search", {"query": q, "k": 5, "version": "bm25_expanded"}
        )
        assert d["results"] == json.loads(json.dumps(served))


def test_index_only_serving(server):
    """An EngineHandle over a prebuilt index with NO docs table serves the
    bm25 variants (the ship-the-index deployment); the pattern variant —
    an inherent corpus scan — errors cleanly."""
    from high_performance_parallel_search_engine_ray.server import EngineHandle

    base, eng = server
    index_only = EngineHandle(None, index_dir=eng.index_dir)
    got = index_only.search("hash join", k=5)["results"]
    d = _post(f"{base}/api/search", {"query": "hash join", "k": 5})
    assert got == json.loads(json.dumps(d["results"]))
    exp = index_only.search("hash joins", k=5, variant="bm25_expanded")["results"]
    assert exp  # expansion works from the index alone
    with pytest.raises(ValueError, match="pattern"):
        index_only.search("scan", variant="pattern")
    # /api/status must not advertise the variant search() always rejects
    st = index_only.status()
    assert st["versions"]["pattern"]["available"] is False
    assert st["versions"]["bm25"]["available"] is True


def test_dashboard_escapes_untrusted_values(server):
    """The console escapes crawled/server strings before any innerHTML
    interpolation (regression pin for the stored/reflected XSS finding)."""
    import urllib.request

    base, _ = server
    with urllib.request.urlopen(f"{base}/", timeout=60) as r:
        html = r.read().decode()
    assert "const esc=" in html
    for use in ("esc(res.error)", "esc(id)", "esc(sc)"):
        assert use in html


def test_refuses_to_overwrite_non_index_dir(server, tmp_path):
    """A user-supplied index_dir that exists, is non-empty and holds no
    manifest must NOT be rm-treed and rebuilt over (data-loss guard)."""
    from high_performance_parallel_search_engine_ray.server import EngineHandle

    _, eng = server
    victim = tmp_path / "precious"
    victim.mkdir()
    (victim / "data.txt").write_text("not an index")
    with pytest.raises(ValueError, match="refusing to overwrite"):
        EngineHandle(eng.docs, index_dir=str(victim))
    assert (victim / "data.txt").read_text() == "not an index"  # untouched


def test_close_removes_only_owned_tempdir(server, tmp_path):
    """close() deletes the auto-created temp index, never a user-supplied
    --index-dir."""
    import os

    from high_performance_parallel_search_engine_ray.server import EngineHandle

    _, eng = server
    owned = EngineHandle(eng.docs)
    d = owned.index_dir
    assert os.path.isdir(d)
    owned.close()
    assert not os.path.exists(d)
    user = EngineHandle(None, index_dir=eng.index_dir)
    user.close()
    assert os.path.isdir(eng.index_dir)  # user dir survives


def test_adhoc_fallback_equality(server):
    """The --adhoc fallback (materialized tf) returns the same top-k as
    the index-served default."""
    from high_performance_parallel_search_engine_ray.server import EngineHandle

    base, eng = server
    adhoc_eng = EngineHandle(eng.docs, adhoc=True)
    assert adhoc_eng.adhoc and adhoc_eng.tf is not None
    a = adhoc_eng.search("hash join", k=5)["results"]
    d = _post(f"{base}/api/search", {"query": "hash join", "k": 5})
    assert d["results"] == json.loads(json.dumps(a))


def test_search_pattern_variant(server):
    base, _ = server
    d = _post(
        f"{base}/api/search", {"query": "scan", "k": 3, "version": "pattern"}
    )
    assert d["status"] == "ok" and len(d["results"]) == 3
    assert all(r["pattern"] == "scan" for r in d["results"])
    ns = [r["n_matches"] for r in d["results"]]
    assert ns == sorted(ns, reverse=True)


def test_compare_variants(server):
    base, _ = server
    d = _post(
        f"{base}/api/compare",
        {"query": "hash join", "versions": ["bm25", "bm25_expanded"], "k": 5},
    )
    assert d["status"] == "ok"
    assert set(d["results"]) == {"bm25", "bm25_expanded"}
    for v in d["results"].values():
        assert v["execution_time_ms"] > 0 and v["results"]


def test_metrics_accumulate(server):
    base, _ = server
    d = _get(f"{base}/api/metrics")
    assert d["status"] == "ok"
    assert "query_latency" in json.dumps(d["metrics"])  # searches above recorded


def test_error_envelope(server):
    base, _ = server
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(f"{base}/api/search", {"k": 5})
    assert e.value.code == 400
    assert json.load(e.value)["status"] == "error"
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(f"{base}/api/search", {"query": "x", "version": "mpi"})
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(f"{base}/api/nope")
    assert e.value.code == 404


def test_dashboard_page(server):
    """GET / serves the single-file dashboard (the `WebSite/` front-end
    analog): HTML wired to the same four API routes."""
    base, _ = server
    with urllib.request.urlopen(f"{base}/", timeout=60) as r:
        assert r.status == 200
        assert r.headers["Content-Type"].startswith("text/html")
        html = r.read().decode()
    assert "search engine console" in html
    for route in ("/api/status", "/api/search", "/api/metrics"):
        assert route in html
    with urllib.request.urlopen(f"{base}/index.html", timeout=60) as r:
        assert r.status == 200
