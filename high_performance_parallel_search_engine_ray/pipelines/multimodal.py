"""Multimodal column plumbing (image/audio/video as opaque binary).

The decode step is STUBBED (no image/audio libraries in this container, per
the build contract): ``MediaFeatureStage(decode=True)`` raises
NotImplementedError at the exact point a real decoder (PIL/torchaudio/
pyav) would run; everything around it — schema, actor-pool signature, batch
sizing for large binary payloads, deterministic fake features, output
layout — is real and tested.

Scale notes: binary payloads ride Arrow large_binary; keep batch_size small
(the stage default is 64) so batch x concurrency fits worker heaps; feature
outputs are fixed-width list<float> columns suitable for the ann pipelines.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.string()),
        ("media_type", pa.string()),  # image/audio/video
        ("payload", pa.large_binary()),
        ("width", pa.int32()),  # typed metadata; -1 = unknown
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


def attach_fake_media(docs, id_col: str = "doc_id", text_col: str = "text"):
    """Deterministically derive a media table from a docs Dataset (stand-in
    for a real binary column): payload = utf-8 bytes, type round-robins by
    id hash, metadata synthesized."""
    from ..functions.hashing import stable_hash64

    def mk(b: pa.Table) -> pa.Table:
        ids = [str(x) for x in b[id_col].to_pylist()]
        texts = b[text_col].to_pylist()
        types = []
        widths, heights, durs = [], [], []
        for i in ids:
            h = stable_hash64(i)
            mt = ("image", "audio", "video")[h % 3]
            types.append(mt)
            widths.append(int(64 + h % 1024) if mt == "image" else -1)
            heights.append(int(64 + (h >> 10) % 1024) if mt == "image" else -1)
            durs.append(int(1000 + h % 60_000) if mt != "image" else -1)
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "media_type": pa.array(types, pa.string()),
                "payload": pa.array([t.encode() for t in texts], pa.large_binary()),
                "width": pa.array(widths, pa.int32()),
                "height": pa.array(heights, pa.int32()),
                "duration_ms": pa.array(durs, pa.int32()),
            }
        )

    return docs.map_batches(mk, batch_format="pyarrow")


class MediaFeatureStage:
    """Actor-pool feature extractor over binary media payloads.

    decode=False (default): deterministic fake features — 16-bin byte
    histogram (normalized) + size — real plumbing end to end.
    decode=True: the seam where a real decoder goes; raises
    NotImplementedError (clearly marked stub per the build contract).
    """

    FEATURE_DIM = 17

    def __init__(self, decode: bool = False):
        self.decode = decode
        self._bins = np.linspace(0, 256, 17)  # built once per actor

    def __call__(self, b: pa.Table) -> pa.Table:
        if self.decode:
            raise NotImplementedError(
                "real media decode requires PIL/pyav/torchaudio, not available "
                "in this container; run with decode=False for histogram features"
            )
        feats = []
        sizes = []
        for payload in b["payload"].to_pylist():
            arr = np.frombuffer(payload, dtype=np.uint8)
            hist, _ = np.histogram(arr, bins=self._bins)
            total = max(1, arr.size)
            feats.append(
                np.concatenate([hist / total, [float(arr.size)]]).astype(np.float32).tolist()
            )
            sizes.append(arr.size)
        return pa.table(
            {
                "media_id": b["media_id"],
                "media_type": b["media_type"],
                "n_bytes": pa.array(sizes, pa.int64()),
                "features": pa.array(feats, pa.list_(pa.float32())),
            }
        )


def media_features(docs, concurrency: int = 2, batch_size: int = 64):
    media = attach_fake_media(docs)
    return media.map_batches(
        MediaFeatureStage,
        fn_constructor_kwargs=dict(decode=False),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
