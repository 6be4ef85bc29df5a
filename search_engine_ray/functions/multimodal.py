"""Multimodal (image/audio/video) column plumbing.

Binary media are opaque ``binary`` columns with typed metadata; decode /
feature-extract / resize / frame-sample run as actor-pool ``map_batches``
stages. The container ships NO image/audio libraries, so the codec leaf is
STUBBED: ``RealDecoder`` raises ``NotImplementedError`` (swap in
PIL/torchaudio in a real deployment), while ``FakeDecoder`` produces a
deterministic array from the bytes so the Ray-side plumbing — schema, batch
sizing for wide binary rows, actor signature, output layout — is real and
tested.

Memory note: binary payloads can be MBs/row, so these stages run with SMALL
``batch_size`` (see ``media_features``) and keep the payload column out of
any shuffle — only the extracted fixed-size features move.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),        # "image" | "audio" | "video"
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),        # typed metadata (0 when unknown)
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)

FEATURE_DIM = 64


class RealDecoder:
    """The production decode path — intentionally not implementable in this
    container (no PIL / libav). Kept as the documented extension point."""

    def decode_image(self, payload: bytes) -> np.ndarray:
        raise NotImplementedError(
            "image decoding requires an image library not present in this "
            "container; use FakeDecoder for plumbing tests"
        )

    decode_audio = decode_image
    decode_video_frames = decode_image


class FakeDecoder:
    """Deterministic stand-in: bytes -> fixed 8x8 float32 'pixels' derived
    from a blake2b stream of the payload. Stable across runs/machines."""

    def decode_image(self, payload: bytes) -> np.ndarray:
        h = hashlib.blake2b(payload or b"", digest_size=FEATURE_DIM).digest()
        return (np.frombuffer(h, dtype=np.uint8).astype(np.float32) / 255.0
                ).reshape(8, 8)

    def decode_audio(self, payload: bytes) -> np.ndarray:
        # blake2b caps digest_size at 64; derive 128 'samples' from two hashes
        h = hashlib.blake2b(payload or b"", digest_size=64).digest()
        h2 = hashlib.blake2b((payload or b"") + b"\x01", digest_size=64).digest()
        return (np.frombuffer(h + h2, dtype=np.uint8).astype(np.float32)
                - 128.0) / 128.0

    def decode_video_frames(self, payload: bytes, n_frames: int = 4):
        return [
            self.decode_image((payload or b"") + bytes([i]))
            for i in range(n_frames)
        ]


class MediaFeatureExtractor:
    """Actor-pool stage: decoder constructed ONCE per actor (the 'model
    load'), per-batch decode + pooled feature vector per row."""

    def __init__(self, decoder: str = "fake"):
        self._dec = FakeDecoder() if decoder == "fake" else RealDecoder()

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch.column("kind").to_pylist()
        payloads = batch.column("payload").to_pylist()
        feats = []
        for kind, p in zip(kinds, payloads):
            if kind == "image":
                arr = self._dec.decode_image(p).ravel()
            elif kind == "audio":
                arr = self._dec.decode_audio(p).ravel()
            elif kind == "video":
                frames = self._dec.decode_video_frames(p)
                arr = np.mean([f.ravel() for f in frames], axis=0)
            else:
                raise ValueError(f"unknown media kind {kind!r}")
            vec = np.zeros(FEATURE_DIM, dtype=np.float32)
            vec[: min(FEATURE_DIM, arr.size)] = arr[:FEATURE_DIM]
            feats.append(vec.tolist())
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "kind": batch.column("kind"),
                "feature": pa.array(feats, pa.list_(pa.float32())),
            }
        )


def media_features(ds, decoder: str = "fake", concurrency: int = 2,
                   batch_size: int = 64):
    """documents-with-media Dataset -> (media_id, kind, feature:list<float>).

    batch_size is deliberately SMALL: payload rows are wide; 64 rows x a few
    MB stays within a worker heap, and the payload column never outlives
    this stage.
    """
    return ds.map_batches(
        MediaFeatureExtractor,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"decoder": decoder},
    )


class MediaResize:
    """Actor-pool resize stage: decode image payload -> nearest-neighbour
    resample to (out_h, out_w) — the resample itself is a real vectorized
    gather (np.ix_ index grid), only the codec leaf is swappable. Emits
    the resized pixel block as list<float> plus its dimensions."""

    def __init__(self, out_w: int = 4, out_h: int = 4,
                 decoder: str = "fake"):
        self._dec = FakeDecoder() if decoder == "fake" else RealDecoder()
        self.out_w = out_w
        self.out_h = out_h

    def _resize(self, img: np.ndarray) -> np.ndarray:
        h, w = img.shape
        ri = np.minimum((np.arange(self.out_h) * h) // self.out_h, h - 1)
        ci = np.minimum((np.arange(self.out_w) * w) // self.out_w, w - 1)
        return img[np.ix_(ri, ci)]

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        out = [self._resize(self._dec.decode_image(p)).ravel().tolist()
               for p in payloads]
        n = len(out)
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "pixels": pa.array(out, pa.list_(pa.float32())),
                "width": pa.array([self.out_w] * n, pa.int32()),
                "height": pa.array([self.out_h] * n, pa.int32()),
            }
        )


def resize_images(ds, out_w: int = 4, out_h: int = 4, decoder: str = "fake",
                  concurrency: int = 2, batch_size: int = 64):
    """Image rows -> resized pixel blocks (media_id, pixels, width,
    height). Filters to kind == 'image' first so non-image payloads never
    reach the decoder."""
    import pyarrow.compute as pc

    imgs = ds.map_batches(
        lambda t: t.filter(pc.equal(t.column("kind"), "image")),
        batch_format="pyarrow", batch_size=batch_size)
    return imgs.map_batches(
        MediaResize, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"out_w": out_w, "out_h": out_h,
                               "decoder": decoder},
    )


class FrameSampler:
    """Actor-pool frame sampler: one video row -> n_frames rows
    (media_id, frame_idx, frame:list<float>) — the explode/flat_map shape
    a video featurization pipeline needs (per-frame rows are narrow, so
    downstream stages shuffle frames, never payloads)."""

    def __init__(self, n_frames: int = 4, decoder: str = "fake"):
        self._dec = FakeDecoder() if decoder == "fake" else RealDecoder()
        self.n_frames = n_frames

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("media_id").to_pylist()
        payloads = batch.column("payload").to_pylist()
        out_id, out_idx, out_frame = [], [], []
        for mid, p in zip(ids, payloads):
            for i, f in enumerate(
                    self._dec.decode_video_frames(p, self.n_frames)):
                out_id.append(mid)
                out_idx.append(i)
                out_frame.append(f.ravel().tolist())
        return pa.table(
            {
                "media_id": pa.array(out_id, pa.int64()),
                "frame_idx": pa.array(out_idx, pa.int32()),
                "frame": pa.array(out_frame, pa.list_(pa.float32())),
            }
        )


def sample_video_frames(ds, n_frames: int = 4, decoder: str = "fake",
                        concurrency: int = 2, batch_size: int = 32):
    """Video rows -> per-frame rows (frame-sample explode)."""
    import pyarrow.compute as pc

    vids = ds.map_batches(
        lambda t: t.filter(pc.equal(t.column("kind"), "video")),
        batch_format="pyarrow", batch_size=batch_size)
    return vids.map_batches(
        FrameSampler, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"n_frames": n_frames, "decoder": decoder},
    )


def synthetic_media(n: int, seed: int = 42) -> pa.Table:
    """Deterministic media fixture table (no real codecs needed)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = {k: [] for k in MEDIA_SCHEMA.names}
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, size=int(rng.integers(64, 512)),
                               dtype=np.uint8).tobytes()
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["mime"].append({"image": "image/fake", "audio": "audio/fake",
                             "video": "video/fake"}[kind])
        rows["width"].append(8 if kind != "audio" else 0)
        rows["height"].append(8 if kind != "audio" else 0)
        rows["duration_ms"].append(0 if kind == "image" else 1000)
    return pa.table(rows, schema=MEDIA_SCHEMA)
