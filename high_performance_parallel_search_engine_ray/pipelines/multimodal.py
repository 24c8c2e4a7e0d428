"""Multimodal column plumbing (image/audio/video as opaque binary).

``decode=True`` is REAL for one uncompressed format per modality —
24-bit BMP / binary P6 PPM pixels, RIFF PCM16 WAV samples, and
concatenated-P6 streams as the uncompressed video container — plus BOTH
compressed image formats a web crawl actually meets: non-interlaced 8-bit
RGB/RGBA PNG (stdlib zlib) and baseline sequential JPEG (pure numpy,
`functions/jpegcodec.py`) — via the codecs in ``functions/mediacodec.py``
(the reference analog is the CUDA version's pixel kernels,
`CUDA-OpenMP Hybrid Version/src/cuda_kernels.cu:287-321`). The REMAINING
compressed formats (MP3/MP4 audio/video, progressive JPEG) stay the
contract stub: the stages raise at the exact seam where
PIL/torchaudio/pyav would plug in (no codec libraries in this container).
``decode=False`` (the default; what the oracle-shaped query entries use)
keeps the deterministic byte-level stand-ins.

Scale notes: binary payloads ride Arrow large_binary; keep batch_size small
(the stage default is 64) so batch x concurrency fits worker heaps; feature
outputs are fixed-width list<float> columns suitable for the ann pipelines.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.mediacodec import (
    decode_bmp,
    decode_jpeg,
    decode_png,
    decode_ppm,
    decode_ppm_stream,
    decode_wav,
    detect_media_format,
    encode_bmp,
    encode_jpeg,
    encode_png,
    encode_ppm,
    encode_wav,
    luminance,
    resize_nearest,
)

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


def attach_decodable_media(docs, id_col: str = "doc_id"):
    """Deterministically derive a media table whose payloads are REAL
    uncompressed media (the decode=True path's synthetic input): images are
    gradient BMP, P6 PPM, zlib PNG or baseline JPEG (rotating by id hash;
    the JPEG leg is lossy, so value tests compare with tolerance there),
    audio is a PCM16 WAV
    ramp, video is a P6 frame stream. All dimensions are hash-derived and
    tiny (<= 16 px, <= 512 samples, <= 5 frames) so payload x batch x
    concurrency stays small; metadata columns reflect the true decoded
    shape."""
    from ..functions.hashing import stable_hash64

    def mk(b: pa.Table) -> pa.Table:
        ids = [str(x) for x in b[id_col].to_pylist()]
        types, payloads = [], []
        widths, heights, durs = [], [], []
        for i in ids:
            h = stable_hash64(i)
            mt = ("image", "audio", "video")[h % 3]
            types.append(mt)
            if mt == "image":
                w = 4 + (h >> 3) % 13
                ht = 4 + (h >> 7) % 13
                yy, xx = np.mgrid[0:ht, 0:w]
                px = np.stack(
                    [
                        (xx * 255 // max(1, w - 1)).astype(np.uint8),
                        (yy * 255 // max(1, ht - 1)).astype(np.uint8),
                        ((xx + yy + h) % 256).astype(np.uint8),
                    ],
                    axis=-1,
                )
                enc = (encode_bmp, encode_ppm, encode_png, encode_jpeg)[
                    (h >> 11) % 4
                ]
                payloads.append(enc(px))
                widths.append(int(w))
                heights.append(int(ht))
                durs.append(-1)
            elif mt == "audio":
                n = 64 + (h >> 5) % 449
                rate = 16_000
                samples = (
                    ((np.arange(n, dtype=np.int64) * ((h % 997) + 3)) % 65536)
                    - 32768
                ).astype(np.int16)
                payloads.append(encode_wav(samples, rate))
                widths.append(-1)
                heights.append(-1)
                durs.append(int(max(1, n * 1000 // rate)))
            else:
                f = 2 + (h >> 4) % 4
                frames = []
                for j in range(f):
                    yy, xx = np.mgrid[0:6, 0:8]
                    frames.append(
                        np.stack(
                            [
                                ((xx * 36 + j * 40) % 256).astype(np.uint8),
                                ((yy * 51 + j * 17) % 256).astype(np.uint8),
                                np.full((6, 8), (h + j) % 256, np.uint8),
                            ],
                            axis=-1,
                        )
                    )
                payloads.append(b"".join(encode_ppm(fr) for fr in frames))
                widths.append(-1)
                heights.append(-1)
                durs.append(int(f * 1000))
        return pa.table(
            {
                "media_id": pa.array(ids, pa.string()),
                "media_type": pa.array(types, pa.string()),
                "payload": pa.array(payloads, pa.large_binary()),
                "width": pa.array(widths, pa.int32()),
                "height": pa.array(heights, pa.int32()),
                "duration_ms": pa.array(durs, pa.int32()),
            }
        )

    return docs.map_batches(mk, batch_format="pyarrow")


class MediaFeatureStage:
    """Actor-pool feature extractor over binary media payloads.

    decode=False (default): deterministic byte-level features — 16-bin byte
    histogram (normalized) + size — real plumbing end to end.
    decode=True: REAL decode for uncompressed formats (BMP/PPM pixels ->
    16-bin BT.601-luminance histogram + pixel count; P6-stream video ->
    luminance histogram over ALL frames; PCM16 WAV -> 16-bin amplitude
    histogram + sample count). Compressed payloads hit the contract stub
    (NotImplementedError at the PIL/pyav seam).
    """

    FEATURE_DIM = 17

    def __init__(self, decode: bool = False):
        self.decode = decode
        self._bins = np.linspace(0, 256, 17)  # built once per actor

    def _decoded_values(self, payload: bytes, media_type: str) -> np.ndarray:
        """Payload -> uint8 value stream in the decoded domain (luminance
        pixels for images/video frames, 0..255-mapped amplitudes for PCM)."""
        fmt = detect_media_format(payload)
        if fmt == "bmp":
            return luminance(decode_bmp(payload)).ravel()
        if fmt == "png":
            # alpha (if any) doesn't enter luminance
            return luminance(decode_png(payload)[..., :3]).ravel()
        if fmt == "jpeg":
            return luminance(decode_jpeg(payload)).ravel()
        if fmt == "ppm":
            frames = (
                decode_ppm_stream(payload)
                if media_type == "video"
                else [decode_ppm(payload)[0]]
            )
            return np.concatenate([luminance(f).ravel() for f in frames])
        if fmt == "wav":
            samples, _rate = decode_wav(payload)
            # int16 -> 0..255 (exact integer bucketing of the amplitude range)
            return ((samples.astype(np.int32).ravel() + 32768) // 256).astype(
                np.uint8
            )
        raise NotImplementedError(
            "MP3/MP4 decode requires pyav/torchaudio (not in this "
            "container); decode=True handles BMP/PPM/WAV/PNG/baseline-JPEG, "
            "decode=False computes byte-level features for anything"
        )

    def __call__(self, b: pa.Table) -> pa.Table:
        feats = []
        sizes = []
        for payload, mt in zip(
            b["payload"].to_pylist(), b["media_type"].to_pylist()
        ):
            if self.decode:
                arr = self._decoded_values(payload, mt)
            else:
                arr = np.frombuffer(payload, dtype=np.uint8)
            hist, _ = np.histogram(arr, bins=self._bins)
            total = max(1, arr.size)
            feats.append(
                np.concatenate([hist / total, [float(arr.size)]]).astype(np.float32).tolist()
            )
            sizes.append(len(payload))
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
    """Actor-pool image resize. decode=True performs REAL nearest-neighbor
    pixel resampling for uncompressed BMP/PPM payloads (decode -> resize ->
    re-encode in the SAME format); compressed payloads hit the contract stub
    (NotImplementedError at the PIL/opencv seam). decode=False performs a
    deterministic byte-level stand-in (truncate/cycle the payload to
    target_w*target_h bytes) so the schema, actor signature, batch sizing
    and output layout are real and testable. Non-image rows pass through
    untouched (width/height stay -1)."""

    def __init__(self, target_w: int = 224, target_h: int = 224, decode: bool = False):
        self.tw = int(target_w)
        self.th = int(target_h)
        self.decode = decode
        self._target_size = self.tw * self.th  # computed once per actor

    def _resize_real(self, payload: bytes) -> bytes:
        fmt = detect_media_format(payload)
        if fmt == "bmp":
            return encode_bmp(resize_nearest(decode_bmp(payload), self.tw, self.th))
        if fmt == "png":
            # channel count (RGB vs RGBA) survives the round-trip
            return encode_png(resize_nearest(decode_png(payload), self.tw, self.th))
        if fmt == "jpeg":
            # lossy re-encode, same as any thumbnailer
            return encode_jpeg(resize_nearest(decode_jpeg(payload), self.tw, self.th))
        if fmt == "ppm":
            px, _end = decode_ppm(payload)
            return encode_ppm(resize_nearest(px, self.tw, self.th))
        raise NotImplementedError(
            "unrecognized image container; decode=True handles BMP/PPM, "
            "zlib PNG and baseline JPEG (progressive JPEG stays behind "
            "the PIL seam)"
        )

    def __call__(self, b: pa.Table) -> pa.Table:
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
            if self.decode:
                payloads.append(self._resize_real(payload))
                widths.append(self.tw)
                heights.append(self.th)
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
    decode=True performs REAL frame extraction from the uncompressed
    P6-stream container (consecutive binary PPM images — ffmpeg's
    image2pipe ppm format): the stream's frames are taken as uniformly
    spanning duration_ms, the frame nearest below each sample timestamp is
    selected, and each sampled frame re-encodes as a standalone P6 payload.
    Compressed containers hit the contract stub (NotImplementedError at the
    pyav/ffmpeg seam). decode=False emits deterministic byte slices of the
    source payload. Non-video rows produce no frames."""

    def __init__(self, interval_ms: int = 1000, max_frames: int = 32, decode: bool = False):
        self.interval_ms = int(interval_ms)
        self.max_frames = int(max_frames)
        self.decode = decode

    def __call__(self, b: pa.Table) -> pa.Table:
        out = {"media_id": [], "frame_idx": [], "ts_ms": [], "payload": []}
        for mid, mt, payload, dur in zip(
            b["media_id"].to_pylist(), b["media_type"].to_pylist(),
            b["payload"].to_pylist(), b["duration_ms"].to_pylist(),
        ):
            if mt != "video" or dur <= 0:
                continue
            n = min(self.max_frames, -(-dur // self.interval_ms))
            if self.decode:
                if detect_media_format(payload) != "ppm":
                    raise NotImplementedError(
                        "compressed video demux requires pyav/ffmpeg (not in "
                        "this container); decode=True handles uncompressed "
                        "P6-stream payloads"
                    )
                frames = decode_ppm_stream(payload)
                n_src = len(frames)
                for i in range(n):
                    ts = i * self.interval_ms
                    src = min(n_src - 1, (ts * n_src) // max(1, dur))
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["ts_ms"].append(ts)
                    out["payload"].append(encode_ppm(frames[src]))
                continue
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


def media_features_decoded(docs, concurrency: int = 2, batch_size: int = 64):
    """Real-decode feature extraction over synthetic uncompressed payloads
    (BMP/PPM luminance histograms, WAV amplitude histograms) — the
    decode=True path end to end."""
    media = attach_decodable_media(docs)
    return media.map_batches(
        MediaFeatureStage,
        fn_constructor_kwargs=dict(decode=True),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def media_resize_decoded(docs, target_w: int = 16, target_h: int = 16,
                         concurrency: int = 2, batch_size: int = 64):
    """Real nearest-neighbor pixel resize over synthetic BMP/PPM payloads."""
    media = attach_decodable_media(docs)
    return media.map_batches(
        MediaResizeStage,
        fn_constructor_kwargs=dict(
            target_w=target_w, target_h=target_h, decode=True
        ),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def media_frame_samples_decoded(docs, interval_ms: int = 1000,
                                max_frames: int = 32, concurrency: int = 2,
                                batch_size: int = 64):
    """Real frame extraction from synthetic P6-stream video payloads."""
    media = attach_decodable_media(docs)
    return media.map_batches(
        FrameSampleStage,
        fn_constructor_kwargs=dict(
            interval_ms=interval_ms, max_frames=max_frames, decode=True
        ),
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
