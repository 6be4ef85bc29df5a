"""Multimodal (image/audio/video) column plumbing.

Binary media are opaque ``binary`` columns with typed metadata; decode /
feature-extract / resize / frame-sample run as actor-pool ``map_batches``
stages. The container ships NO image/audio libraries, so the codec leaf
is ``PureDecoder`` — dependency-free REAL parsers for published formats:
24-bit uncompressed BMP (BITMAPINFOHEADER), 16-bit PCM RIFF/WAVE, and a
length-prefixed BMP frame container for video. ``FakeDecoder`` (a
deterministic blake2b stand-in that accepts arbitrary bytes) remains for
plumbing tests; swap in PIL/libav for JPEG/MP4 in a real deployment —
the actor signature and output layout don't change.

Memory note: binary payloads can be MBs/row, so these stages run with SMALL
``batch_size`` (see ``media_features``) and keep the payload column out of
any shuffle — only the extracted fixed-size features move.
"""

from __future__ import annotations

import hashlib
import struct

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


# --- dependency-free real codecs -------------------------------------------
# BMP: Microsoft BITMAPFILEHEADER + BITMAPINFOHEADER, 24-bit BI_RGB,
# rows bottom-up, each row padded to 4 bytes (the published format).
# WAV: RIFF/WAVE with a PCM 'fmt ' chunk and a 'data' chunk, 16-bit.
# Video: "GVID" magic + uint32 frame count + per-frame uint32-length-
# prefixed BMP blobs (a defined container so frame parsing is real).

_VID_MAGIC = b"GVID"


def encode_bmp(gray: np.ndarray) -> bytes:
    """Grayscale uint8 (h, w) -> 24-bit uncompressed BMP bytes (each of
    B, G, R carries the gray value)."""
    g = np.asarray(gray, dtype=np.uint8)
    h, w = g.shape
    pad = (-(w * 3)) % 4
    rows = []
    for r in range(h - 1, -1, -1):  # bottom-up row order
        bgr = np.repeat(g[r], 3).astype(np.uint8).tobytes()
        rows.append(bgr + b"\x00" * pad)
    pixel_data = b"".join(rows)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                       len(pixel_data), 2835, 2835, 0, 0)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(pixel_data),
                         0, 0, 14 + 40)
    return header + info + pixel_data


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """int16 mono samples -> RIFF/WAVE PCM bytes."""
    s = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    chunks = (b"WAVE"
              + b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", len(s)) + s)
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def encode_video(frames: list[np.ndarray]) -> bytes:
    """List of grayscale uint8 frames -> GVID container bytes."""
    blobs = [encode_bmp(f) for f in frames]
    return (_VID_MAGIC + struct.pack("<I", len(blobs))
            + b"".join(struct.pack("<I", len(b)) + b for b in blobs))


class PureDecoder:
    """Real, dependency-free decode leaf for the formats above. Raises
    ``ValueError`` on malformed payloads (magic/bpp/compression checks),
    so a corrupt row fails loudly instead of producing garbage pixels."""

    def decode_image(self, payload: bytes) -> np.ndarray:
        """24-bit BI_RGB BMP -> float32 grayscale (h, w) in [0, 1]
        (mean of B, G, R per pixel)."""
        if not payload or len(payload) < 54 or payload[:2] != b"BM":
            raise ValueError("not a BMP payload")
        data_off = struct.unpack_from("<I", payload, 10)[0]
        (hdr_size, w, h, _planes, bpp, comp) = struct.unpack_from(
            "<IiiHHI", payload, 14)
        if hdr_size < 40 or bpp != 24 or comp != 0:
            raise ValueError(f"unsupported BMP (bpp={bpp}, comp={comp})")
        bottom_up = h > 0
        h = abs(h)
        stride = (w * 3 + 3) & ~3
        px = np.frombuffer(payload, dtype=np.uint8, count=stride * h,
                           offset=data_off)
        rows = px.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
        if bottom_up:
            rows = rows[::-1]
        return (rows.astype(np.float32).mean(axis=2) / 255.0)

    def decode_audio(self, payload: bytes) -> np.ndarray:
        """16-bit PCM RIFF/WAVE -> float32 samples in [-1, 1)."""
        if (not payload or payload[:4] != b"RIFF"
                or payload[8:12] != b"WAVE"):
            raise ValueError("not a WAV payload")
        off = 12
        data = None
        while off + 8 <= len(payload):
            cid = payload[off:off + 4]
            sz = struct.unpack_from("<I", payload, off + 4)[0]
            if off + 8 + sz > len(payload):
                raise ValueError("truncated WAV chunk")
            if cid == b"fmt ":
                fmt_code, _ch, _rate, _, _, bits = struct.unpack_from(
                    "<HHIIHH", payload, off + 8)
                if fmt_code != 1 or bits != 16:
                    raise ValueError("unsupported WAV (non-PCM16)")
            elif cid == b"data":
                data = payload[off + 8:off + 8 + sz]
            off += 8 + sz + (sz & 1)  # chunks are word-aligned
        if data is None:
            raise ValueError("WAV without data chunk")
        return np.frombuffer(data, dtype="<i2").astype(np.float32) / 32768.0

    def decode_video_frames(self, payload: bytes,
                            n_frames: int | None = None) -> list[np.ndarray]:
        """GVID container -> list of decoded frames; when ``n_frames`` is
        given, evenly subsample (the frame-sampling a featurizer wants)."""
        if not payload or payload[:4] != _VID_MAGIC:
            raise ValueError("not a GVID payload")
        if len(payload) < 8:
            raise ValueError("truncated GVID header")
        total = struct.unpack_from("<I", payload, 4)[0]
        off, frames = 8, []
        for _ in range(total):
            if off + 4 > len(payload):
                raise ValueError("truncated GVID frame table")
            ln = struct.unpack_from("<I", payload, off)[0]
            frames.append(self.decode_image(payload[off + 4:off + 4 + ln]))
            off += 4 + ln
        if n_frames is not None and n_frames > 0 and frames:
            # exactly n_frames, evenly sampled (repeats when the clip is
            # shorter — fixed-count sampling is what a featurizer wants)
            idx = (np.arange(n_frames) * len(frames)) // n_frames
            frames = [frames[i] for i in idx]
        return frames


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


def _decoder_of(decoder: str):
    try:
        return {"fake": FakeDecoder, "pure": PureDecoder}[decoder]()
    except KeyError:
        raise ValueError(f"unknown decoder {decoder!r}") from None


class MediaFeatureExtractor:
    """Actor-pool stage: decoder constructed ONCE per actor (the 'model
    load'), per-batch decode + REAL decoded stats (width/height of the
    decoded raster, sample/frame counts, pixel-or-sample mean and rms)
    + a pooled fixed-size feature vector per row."""

    def __init__(self, decoder: str = "pure"):
        self._dec = _decoder_of(decoder)

    def __call__(self, batch: pa.Table) -> pa.Table:
        kinds = batch.column("kind").to_pylist()
        payloads = batch.column("payload").to_pylist()
        feats, widths, heights, units, means, rmss = [], [], [], [], [], []
        for kind, p in zip(kinds, payloads):
            if kind == "image":
                img = self._dec.decode_image(p)
                arr = img.ravel()
                w, h, n_units = img.shape[1], img.shape[0], 1
            elif kind == "audio":
                arr = self._dec.decode_audio(p).ravel()
                w, h, n_units = 0, 0, arr.size
            elif kind == "video":
                frames = self._dec.decode_video_frames(p)
                arr = np.mean([f.ravel() for f in frames], axis=0)
                w, h = frames[0].shape[1], frames[0].shape[0]
                n_units = len(frames)
            else:
                raise ValueError(f"unknown media kind {kind!r}")
            vec = np.zeros(FEATURE_DIM, dtype=np.float32)
            vec[: min(FEATURE_DIM, arr.size)] = arr[:FEATURE_DIM]
            feats.append(vec.tolist())
            widths.append(w)
            heights.append(h)
            units.append(n_units)
            a64 = arr.astype(np.float64)
            means.append(round(float(a64.mean()), 6))
            rmss.append(round(float(np.sqrt((a64 * a64).mean())), 6))
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "kind": batch.column("kind"),
                "width": pa.array(widths, pa.int32()),
                "height": pa.array(heights, pa.int32()),
                "n_units": pa.array(units, pa.int64()),
                "sig_mean": pa.array(means, pa.float64()),
                "sig_rms": pa.array(rmss, pa.float64()),
                "feature": pa.array(feats, pa.list_(pa.float32())),
            }
        )


def media_features(ds, decoder: str = "pure", concurrency: int = 2,
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
                 decoder: str = "pure"):
        self._dec = _decoder_of(decoder)
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


def resize_images(ds, out_w: int = 4, out_h: int = 4, decoder: str = "pure",
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

    def __init__(self, n_frames: int = 4, decoder: str = "pure"):
        self._dec = _decoder_of(decoder)
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


def sample_video_frames(ds, n_frames: int = 4, decoder: str = "pure",
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


def synthetic_media_analytic(n: int = 48) -> pa.Table:
    """Media fixture whose pixel/sample CONTENT follows closed-form
    integer formulas of ``media_id`` — so an independent SQL engine can
    recompute the decoded statistics from first principles (DuckDB
    ``generate_series`` + a float32-faithful replay; see the
    ``media_features`` oracle in ``__ray_entry__``). The payload bytes
    are still REAL encoded formats (BMP / PCM-16 WAV / GVID), so the
    engine path exercises the actual encode → parse → featurize chain;
    the oracle checks that the round trip preserves the analytic signal
    exactly (6-dp).

    Content contract (i = media_id; any change must update the SQL twin):

    * image  (i%3==0): h = 4+(i*7)%13, w = 4+(i*11)%13,
      gray(r, c) = (i*31 + r*17 + c*7) % 256
    * audio  (i%3==1): n = 64+(i*29)%448,
      sample(j) = ((i*13 + j*97)*2731) % 65536 - 32768
    * video  (i%3==2): nf = 3+(i%4), h = 4+(i*7)%9, w = 4+(i*11)%9,
      gray(f, r, c) = (i*31 + f*53 + r*17 + c*7) % 256
    """
    rows = {k: [] for k in MEDIA_SCHEMA.names}
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        if kind == "image":
            h, w = 4 + (i * 7) % 13, 4 + (i * 11) % 13
            r = np.arange(h)[:, None]
            c = np.arange(w)[None, :]
            payload = encode_bmp(
                ((i * 31 + r * 17 + c * 7) % 256).astype(np.uint8))
            dur = 0
        elif kind == "audio":
            n_samp = 64 + (i * 29) % 448
            j = np.arange(n_samp, dtype=np.int64)
            s = ((i * 13 + j * 97) * 2731) % 65536 - 32768
            payload = encode_wav(s.astype(np.int16), rate=8000)
            w = h = 0
            dur = int(n_samp * 1000 / 8000)
        else:
            nf = 3 + (i % 4)
            h, w = 4 + (i * 7) % 9, 4 + (i * 11) % 9
            r = np.arange(h)[:, None]
            c = np.arange(w)[None, :]
            payload = encode_video([
                ((i * 31 + f * 53 + r * 17 + c * 7) % 256).astype(np.uint8)
                for f in range(nf)])
            dur = nf * 40
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["mime"].append({"image": "image/bmp", "audio": "audio/wav",
                             "video": "video/x-gvid"}[kind])
        rows["width"].append(w)
        rows["height"].append(h)
        rows["duration_ms"].append(dur)
    return pa.table(rows, schema=MEDIA_SCHEMA)


def synthetic_media(n: int, seed: int = 42, real: bool = True) -> pa.Table:
    """Deterministic media fixture table. ``real=True`` (default) writes
    REAL payload bytes in the formats ``PureDecoder`` parses — BMP images
    of varying sizes, PCM-16 WAV clips, GVID multi-frame videos —
    so the decode stage exercises an actual codec path end-to-end;
    ``real=False`` keeps the legacy opaque-random-bytes fixture for the
    FakeDecoder plumbing tests."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = {k: [] for k in MEDIA_SCHEMA.names}
    for i in range(n):
        kind = kinds[i % 3]
        if not real:
            payload = rng.integers(0, 256, size=int(rng.integers(64, 512)),
                                   dtype=np.uint8).tobytes()
            w = h = 8 if kind != "audio" else 0
            dur = 0 if kind == "image" else 1000
        elif kind == "image":
            h, w = int(rng.integers(4, 17)), int(rng.integers(4, 17))
            payload = encode_bmp(
                rng.integers(0, 256, size=(h, w), dtype=np.uint8))
            dur = 0
        elif kind == "audio":
            n_samp = int(rng.integers(64, 512))
            payload = encode_wav(rng.integers(
                -32768, 32768, size=n_samp, dtype=np.int64
            ).astype(np.int16), rate=8000)
            w = h = 0
            dur = int(n_samp * 1000 / 8000)
        else:
            h, w = int(rng.integers(4, 13)), int(rng.integers(4, 13))
            n_fr = int(rng.integers(3, 7))
            payload = encode_video([
                rng.integers(0, 256, size=(h, w), dtype=np.uint8)
                for _ in range(n_fr)])
            dur = n_fr * 40
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["mime"].append(
            {"image": "image/bmp" if real else "image/fake",
             "audio": "audio/wav" if real else "audio/fake",
             "video": "video/x-gvid" if real else "video/fake"}[kind])
        rows["width"].append(w)
        rows["height"].append(h)
        rows["duration_ms"].append(dur)
    return pa.table(rows, schema=MEDIA_SCHEMA)
