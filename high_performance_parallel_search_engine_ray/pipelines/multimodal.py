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


class MediaResizeStage:
    """Actor-pool image resize. Same stub contract as MediaFeatureStage:
    decode=True is the seam where PIL/opencv pixel work goes
    (NotImplementedError in this container); decode=False performs a
    deterministic byte-level stand-in (truncate/cycle the payload to
    target_w*target_h bytes) so the schema, actor signature, batch sizing
    and output layout are real and testable. Non-image rows pass through
    untouched (width/height stay -1)."""

    def __init__(self, target_w: int = 224, target_h: int = 224, decode: bool = False):
        self.tw = int(target_w)
        self.th = int(target_h)
        self.decode = decode
        self._target_size = self.tw * self.th  # computed once per actor

    def __call__(self, b: pa.Table) -> pa.Table:
        if self.decode:
            raise NotImplementedError(
                "real image resize requires PIL/opencv, not available in this "
                "container; run with decode=False for the byte-level stand-in"
            )
        payloads, widths, heights = [], [], []
        for mt, payload, w, h in zip(
            b["media_type"].to_pylist(), b["payload"].to_pylist(),
            b["width"].to_pylist(), b["height"].to_pylist(),
        ):
            if mt != "image":
                payloads.append(payload)
                widths.append(w)
                heights.append(h)
                continue
            arr = np.frombuffer(payload, dtype=np.uint8)
            reps = -(-self._target_size // max(1, arr.size))  # ceil
            out = np.tile(arr, reps)[: self._target_size]
            payloads.append(out.tobytes())
            widths.append(self.tw)
            heights.append(self.th)
        return pa.table(
            {
                "media_id": b["media_id"],
                "media_type": b["media_type"],
                "payload": pa.array(payloads, pa.large_binary()),
                "width": pa.array(widths, pa.int32()),
                "height": pa.array(heights, pa.int32()),
                "duration_ms": b["duration_ms"],
            }
        )


class FrameSampleStage:
    """Actor-pool video frame sampler: explodes each video row into
    ceil(duration_ms / interval_ms) frame rows (media_id, frame_idx, ts_ms,
    payload) — the flat_map-shaped stream expansion a video pipeline needs.
    Frame payloads are deterministic byte slices of the source payload
    (the decode seam is the same stub contract as the other stages);
    non-video rows produce no frames."""

    def __init__(self, interval_ms: int = 1000, max_frames: int = 32, decode: bool = False):
        self.interval_ms = int(interval_ms)
        self.max_frames = int(max_frames)
        self.decode = decode

    def __call__(self, b: pa.Table) -> pa.Table:
        if self.decode:
            raise NotImplementedError(
                "real frame extraction requires pyav/ffmpeg, not available in "
                "this container; run with decode=False for byte-slice frames"
            )
        out = {"media_id": [], "frame_idx": [], "ts_ms": [], "payload": []}
        for mid, mt, payload, dur in zip(
            b["media_id"].to_pylist(), b["media_type"].to_pylist(),
            b["payload"].to_pylist(), b["duration_ms"].to_pylist(),
        ):
            if mt != "video" or dur <= 0:
                continue
            n = min(self.max_frames, -(-dur // self.interval_ms))
            chunk = max(1, len(payload) // max(1, n))
            for i in range(n):
                out["media_id"].append(mid)
                out["frame_idx"].append(i)
                out["ts_ms"].append(i * self.interval_ms)
                out["payload"].append(payload[i * chunk : (i + 1) * chunk])
        return pa.table(
            {
                "media_id": pa.array(out["media_id"], pa.string()),
                "frame_idx": pa.array(out["frame_idx"], pa.int32()),
                "ts_ms": pa.array(out["ts_ms"], pa.int32()),
                "payload": pa.array(out["payload"], pa.large_binary()),
            }
        )


class MediaFetchStage:
    """Actor-pool media fetcher: (media_ref, n_docs) manifest rows ->
    MEDIA_SCHEMA payload rows. The actual GET (HTTP / object store) is the
    stub seam per the build contract: ``fetch=True`` raises
    NotImplementedError at exactly the point a real client would run;
    ``fetch=False`` synthesizes a deterministic payload from the ref hash so
    the plumbing — per-actor client setup in ``__init__``, small batches for
    large binaries, typed-metadata output — is real and testable.

    media_type derives from the ref's extension (the same blacklist notion
    the crawler's ``is_media_url`` uses); payload size is hash-varied so
    downstream batch-sizing paths see non-uniform binaries.
    """

    _AUDIO = (".mp3", ".wav", ".ogg", ".flac")
    _VIDEO = (".mp4", ".avi", ".mov", ".webm", ".mkv")

    def __init__(self, max_payload_bytes: int = 4096, fetch: bool = False):
        self.max_payload = int(max_payload_bytes)
        self.fetch = fetch  # per-actor client/session would be built here

    def _type_of(self, ref: str) -> str:
        low = ref.lower()
        if low.endswith(self._AUDIO):
            return "audio"
        if low.endswith(self._VIDEO):
            return "video"
        return "image"

    def __call__(self, b: pa.Table) -> pa.Table:
        if self.fetch:
            raise NotImplementedError(
                "real media fetch requires a network/object-store client, not "
                "available in this container; run with fetch=False for "
                "deterministic synthetic payloads"
            )
        from ..functions.hashing import stable_hash64

        refs = b["media_ref"].to_pylist()
        types, payloads, widths, heights, durs = [], [], [], [], []
        for ref in refs:
            h = stable_hash64(ref)
            mt = self._type_of(ref)
            size = 512 + h % max(1, self.max_payload - 512)
            payloads.append(
                np.random.RandomState(h % 2**32).bytes(size)
            )
            types.append(mt)
            widths.append(int(64 + h % 1024) if mt == "image" else -1)
            heights.append(int(64 + (h >> 10) % 1024) if mt == "image" else -1)
            durs.append(int(1000 + h % 60_000) if mt != "image" else -1)
        return pa.table(
            {
                "media_id": pa.array([str(r) for r in refs], pa.string()),
                "media_type": pa.array(types, pa.string()),
                "payload": pa.array(payloads, pa.large_binary()),
                "width": pa.array(widths, pa.int32()),
                "height": pa.array(heights, pa.int32()),
                "duration_ms": pa.array(durs, pa.int32()),
            }
        )


def media_features_from_interleaved(inter, concurrency: int = 2,
                                    batch_size: int = 64):
    """The crawl->media loop: interleaved docs (the crawl engine's output
    shape) -> media manifest (distinct refs; tiny shuffle) -> actor-pool
    fetch (deduplicated: each ref fetched ONCE no matter how many docs
    reference it) -> actor-pool feature extraction. Returns
    (media_id, media_type, n_bytes, features); per-ref doc counts are the
    manifest itself (``interleave.media_manifest``)."""
    from .interleave import media_manifest

    manifest = media_manifest(inter)
    # autoscaling (1, N) pools: two chained actor pools with fixed size can
    # reserve every CPU of a small cluster and starve the upstream read
    # (same failure shape as the measured join-pool deadlock,
    # relational._join_partitions) — min 1 actor keeps the plan live anywhere
    media = manifest.map_batches(
        MediaFetchStage,
        fn_constructor_kwargs=dict(fetch=False),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
        num_cpus=1,
    )
    return media.map_batches(
        MediaFeatureStage,
        fn_constructor_kwargs=dict(decode=False),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
        num_cpus=1,
    )


def media_fetch_from_interleaved(inter, concurrency: int = 2,
                                 batch_size: int = 64):
    """Manifest -> fetched MEDIA_SCHEMA rows (one per distinct media_ref)."""
    from .interleave import media_manifest

    return media_manifest(inter).map_batches(
        MediaFetchStage,
        fn_constructor_kwargs=dict(fetch=False),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, concurrency),
        num_cpus=1,
    )


def media_resize(docs, target_w: int = 224, target_h: int = 224,
                 concurrency: int = 2, batch_size: int = 64):
    media = attach_fake_media(docs)
    return media.map_batches(
        MediaResizeStage,
        fn_constructor_kwargs=dict(target_w=target_w, target_h=target_h),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def media_frame_samples(docs, interval_ms: int = 1000, max_frames: int = 32,
                        concurrency: int = 2, batch_size: int = 64):
    media = attach_fake_media(docs)
    return media.map_batches(
        FrameSampleStage,
        fn_constructor_kwargs=dict(interval_ms=interval_ms, max_frames=max_frames),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def media_payload_dedup(media):
    """(payload_hash, keeper_media_id, n_copies) per distinct media payload
    — the media analog of ``dedup.exact_dedup``: at web scale the same
    image bytes appear under many URLs (mirrors, CDNs, resized-by-URL
    params), and a multimodal pipeline decodes each distinct payload once.
    Shuffle carries (md5, media_id) rows only; payload bytes stay in their
    blocks."""
    import hashlib

    from ray.data.aggregate import Count, Min

    def hash_batch(b: pa.Table) -> pa.Table:
        hs = [
            hashlib.md5(p).hexdigest()
            for p in b["payload"].to_pylist()
        ]
        return pa.table(
            {
                "payload_hash": pa.array(hs, pa.string()),
                "media_id": b["media_id"],
            }
        )

    return (
        media.map_batches(hash_batch, batch_format="pyarrow")
        .groupby("payload_hash")
        .aggregate(
            Min("media_id", alias_name="keeper_media_id"),
            Count(alias_name="n_copies"),
        )
    )
