"""Hypothesis property tests: transliterations vs the compiled reference C
over arbitrary printable-ASCII inputs (far nastier than the curated corpus)."""

import subprocess

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from high_performance_parallel_search_engine_ray.functions.htmltext import (
    html_to_events,
    html_to_events_slow,
    render_flat,
)
from high_performance_parallel_search_engine_ray.functions.urlnorm import normalize_url

# printable ASCII incl. the scanner's trigger characters, newline-free for
# the line-oriented normalize_url harness
_URL_CHARS = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=200
)
_HTML_FRAGS = st.lists(
    st.sampled_from(
        [
            "<p>", "</p>", "<h1>", "</h1>", "<h2 x=1>", "</h2>", "<br/>", "<li>",
            "<script>", "</script>", "<style>", "</style>", "<head>", "</head>",
            "<body>", "</body>", "<title>", "</title>", "<!--", "-->", "-->x",
            "<article", "medium.com", "&amp;", "&lt;", "&gt;", "&quot;", "&nbsp;",
            "&#039;", "&x;", "&nope", "&", ";", "<", ">", '"', "'", " ", "\t",
            "\n", "word", "Word2", "a", "<TITLE>", "</TiTlE>", "<P>", "<hR>",
        ]
    ),
    max_size=60,
).map("".join)


@settings(max_examples=250, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(_HTML_FRAGS)
def test_fast_equals_slow_on_arbitrary_fragments(html):
    assert html_to_events(html) == html_to_events_slow(html)


@settings(max_examples=120, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(_HTML_FRAGS)
def test_scanner_matches_compiled_c(ref_html_to_text_bin, html):
    want = subprocess.run(
        [ref_html_to_text_bin], input=html.encode(), capture_output=True, check=True
    ).stdout.decode()
    assert render_flat(html_to_events(html)) == want


@settings(max_examples=200, deadline=None)
@given(_URL_CHARS)
def test_normalize_url_matches_compiled_c(ref_normalize_url_bin, url):
    want = subprocess.run(
        [ref_normalize_url_bin], input=(url + "\n").encode(), capture_output=True,
        check=True,
    ).stdout.decode().split("\n")[0]
    assert normalize_url(url) == want


# -- SeenSet vs model set (spill-backed exact store) -------------------------

@settings(max_examples=60, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(
        st.tuples(st.sampled_from(["add", "probe"]), st.integers(0, 120)),
        min_size=1,
        max_size=200,
    ),
    st.integers(2, 40),
)
def test_seenset_matches_model_set(tmp_path_factory, ops, cap):
    """Random interleavings of add/probe against a model set: the
    spill-backed store must answer identically at every step, across any
    spill boundary the cap induces, and after a state round-trip."""
    from high_performance_parallel_search_engine_ray.state.seenset import SeenSet

    d = tmp_path_factory.mktemp("seen_prop")
    s = SeenSet(spill_dir=str(d), memory_cap=cap)
    model: set[str] = set()
    for op, i in ops:
        u = f"https://h{i % 7}.example.org/p/{i}"
        if op == "add":
            if u not in s:
                s.add(u)
            model.add(u)
        else:
            assert (u in s) == (u in model)
        assert len(s) == len(model)
    restored = SeenSet.from_state(s.to_state())
    assert set(restored) == model
    for i in range(130):
        u = f"https://h{i % 7}.example.org/p/{i}"
        assert (u in restored) == (u in model)


# -- interleaved-family properties (fuzzed corpora) ---------------------------

_TEXTS = st.lists(
    st.text(
        alphabet=st.characters(blacklist_categories=("Cs",)),
        max_size=120,
    ),
    min_size=1,
    max_size=12,
)


@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(_TEXTS)
def test_interleave_roundtrip_any_text(ray_session, texts):
    """docs_to_interleaved -> reconstruct_text is BIT-EXACT for arbitrary
    unicode texts (multi-space runs, tabs, newlines, empty strings):
    chunking splits on single spaces and rejoins with single spaces, so
    every byte survives."""
    import pyarrow as pa
    import ray.data as rd

    from high_performance_parallel_search_engine_ray.pipelines import interleave as il

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    rec = (
        il.reconstruct_text(il.docs_to_interleaved(docs))
        .to_pandas()
        .astype({"doc_id": int})
        .sort_values("doc_id")
    )
    assert list(rec["text"]) == texts


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(_TEXTS)
def test_span_dedup_set_semantics_any_text(ray_session, texts):
    """Fuzzed corpora: span_dedup keeps each distinct span text exactly
    once corpus-wide, and per-doc kept+dropped == total text spans."""
    import pyarrow as pa
    import ray.data as rd

    from high_performance_parallel_search_engine_ray.pipelines import interleave as il

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    inter = il.docs_to_interleaved(docs).materialize()
    flat = il.explode_spans(inter).to_pandas()
    tx = flat[flat["kind"] == "text"]
    out = il.span_dedup(inter).to_pandas()
    assert (
        out.set_index("doc_id")[["n_kept", "n_dropped"]].sum(axis=1).sort_index()
        == tx.groupby("doc_id").size().sort_index()
    ).all()
    # set(), not pandas nunique(): pandas' khash hashes object strings as
    # NUL-terminated C strings, so '' and '\x00' wrongly count as ONE
    # distinct value (hypothesis found this; the engine's md5 keying is
    # NUL-clean and keeps both)
    assert int(out["n_kept"].sum()) == len(set(tx["text"]))
