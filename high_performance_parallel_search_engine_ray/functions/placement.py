"""Placement diagnostics shared by the crawl engine's actor classes."""

from __future__ import annotations


def current_node_id() -> str:
    """Node the calling worker runs on. Exposed as a `runtime_node()`
    actor method on FrontierShard and FetchParse so the SPREAD scheduling
    test (tests/test_placement.py) can assert actors span a multi-node
    cluster without the dashboard state API."""
    import ray

    return ray.get_runtime_context().get_node_id()
