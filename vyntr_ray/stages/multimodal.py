"""Multimodal columns: opaque binary payloads + typed metadata (build brief).

Image/audio/video payloads are carried as Arrow ``binary`` columns with
sidecar metadata columns; decode / feature-extract / resize / frame-sample
run as **actor-pool** ``map_batches`` stages with small batch sizes (binary
rows are heavy — SURVEY §7.4.6 applies to any blob column).

The real codec libraries (PIL/ffmpeg) are not in this container, so the
codec boundary is explicit: ``ImageDecoder`` tries PIL first and otherwise
decodes the deterministic ``VIMG`` container produced by
``make_fake_image`` (tests use it); truly-unknown payloads raise
``NotImplementedError`` at the decode call, never import-time.  The Ray-side
plumbing — schema, actor signature, batch size, output layout — is real and
tested.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

__all__ = ["make_fake_image", "make_fake_video", "make_fake_audio",
           "ImageDecoder", "FrameSampler", "AudioChunker",
           "decode_images", "sample_frames", "chunk_audio"]

_MAGIC_IMG = b"VIMG"
_MAGIC_VID = b"VVID"


def make_fake_image(width: int, height: int, seed: int = 0) -> bytes:
    """Deterministic fake image: 'VIMG' + w + h + seeded byte payload."""
    rng = np.random.Generator(np.random.PCG64(seed))
    payload = rng.integers(0, 256, size=width * height, dtype=np.uint8)
    return _MAGIC_IMG + struct.pack("<II", width, height) + payload.tobytes()


def make_fake_video(n_frames: int, width: int, height: int,
                    seed: int = 0) -> bytes:
    rng = np.random.Generator(np.random.PCG64(seed))
    frames = rng.integers(0, 256, size=n_frames * width * height,
                          dtype=np.uint8)
    return (_MAGIC_VID + struct.pack("<III", n_frames, width, height)
            + frames.tobytes())


class ImageDecoder:
    """Actor-pool stage: binary image column → width/height/histogram features.

    PIL loads once per actor when available; otherwise only the VIMG fake
    container is decodable and any other payload raises
    ``NotImplementedError`` (clearly-marked codec stub).
    """

    def __init__(self, bytes_col: str = "image", n_bins: int = 16,
                 resize_to: int | None = None):
        self.bytes_col = bytes_col
        self.n_bins = n_bins
        self.resize_to = resize_to
        try:
            from PIL import Image  # noqa: F401 — optional real codec
            self._pil = Image
        except ImportError:
            self._pil = None

    def _decode(self, blob: bytes) -> tuple[int, int, np.ndarray]:
        if blob[:4] == _MAGIC_IMG:
            w, h = struct.unpack("<II", blob[4:12])
            px = np.frombuffer(blob, dtype=np.uint8, offset=12)
            return w, h, px
        if self._pil is not None:
            import io
            img = self._pil.open(io.BytesIO(blob)).convert("L")
            return img.width, img.height, np.asarray(img).ravel()
        raise NotImplementedError(
            "real image codecs unavailable in this container; "
            "payload is not a VIMG fake container")

    def __call__(self, batch: pa.Table) -> pa.Table:
        widths, heights, feats, hashes = [], [], [], []
        for blob in batch[self.bytes_col].to_pylist():
            w, h, px = self._decode(blob)
            if self.resize_to:  # stub resize: decimate to fixed pixel count
                step = max(1, len(px) // (self.resize_to * self.resize_to))
                px = px[::step][: self.resize_to * self.resize_to]
                w = h = self.resize_to
            hist, _ = np.histogram(px, bins=self.n_bins, range=(0, 256))
            feats.append((hist / max(1, px.size)).astype(np.float32).tolist())
            widths.append(w)
            heights.append(h)
            hashes.append(hashlib.md5(px.tobytes()).hexdigest())
        out = batch.drop_columns([self.bytes_col])  # blobs stay out of shuffle
        return (out
                .append_column("width", pa.array(widths, pa.int32()))
                .append_column("height", pa.array(heights, pa.int32()))
                .append_column("pixel_md5", pa.array(hashes, pa.string()))
                .append_column("features",
                               pa.array(feats, pa.list_(pa.float32()))))


class FrameSampler:
    """Actor-pool stage: VVID video blobs → every-nth-frame summary rows."""

    def __init__(self, bytes_col: str = "video", every: int = 2):
        self.bytes_col = bytes_col
        self.every = every

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = (batch["doc_id"].to_pylist()
               if "doc_id" in batch.schema.names
               else list(range(batch.num_rows)))
        out_id, out_frame, out_mean = [], [], []
        for i, blob in zip(ids, batch[self.bytes_col].to_pylist()):
            if blob[:4] != _MAGIC_VID:
                raise NotImplementedError("real video codecs unavailable")
            n, w, h = struct.unpack("<III", blob[4:16])
            frames = np.frombuffer(blob, dtype=np.uint8, offset=16)
            frames = frames.reshape(n, w * h)
            for f in range(0, n, self.every):
                out_id.append(i)
                out_frame.append(f)
                out_mean.append(int(frames[f].sum()))
        return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                         "frame": pa.array(out_frame, pa.int32()),
                         "pixel_sum": pa.array(out_mean, pa.int64())})


def decode_images(ds, bytes_col: str = "image", concurrency: int = 2,
                  batch_size: int = 64, resize_to: int | None = None):
    """Small batches: blob × batch × concurrency must fit worker heap."""
    return ds.map_batches(
        ImageDecoder,
        fn_constructor_kwargs={"bytes_col": bytes_col, "resize_to": resize_to},
        batch_format="pyarrow", concurrency=concurrency,
        batch_size=batch_size, num_cpus=0.5)


def sample_frames(ds, bytes_col: str = "video", every: int = 2,
                  concurrency: int = 2, batch_size: int = 16):
    return ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"bytes_col": bytes_col, "every": every},
        batch_format="pyarrow", concurrency=concurrency,
        batch_size=batch_size, num_cpus=0.5)


_MAGIC_AUD = b"VAUD"


def make_fake_audio(n_samples: int, sample_rate: int = 16_000,
                    seed: int = 0) -> bytes:
    """Deterministic fake audio: 'VAUD' + rate + n + int16 PCM payload."""
    rng = np.random.Generator(np.random.PCG64(seed))
    pcm = rng.integers(-32768, 32767, size=n_samples, dtype=np.int16)
    return (_MAGIC_AUD + struct.pack("<II", sample_rate, n_samples)
            + pcm.tobytes())


class AudioChunker:
    """Actor-pool stage: binary audio column → fixed-length windows with
    integer features (sum of |pcm| and zero-crossing count per window —
    int arithmetic, so downstream aggregates stay exact).

    Same codec-boundary contract as :class:`ImageDecoder`: decodes the
    deterministic ``VAUD`` container; a real deployment swaps in
    soundfile/librosa inside ``_decode`` (unknown payloads raise
    ``NotImplementedError`` at decode time, never import time).
    """

    def __init__(self, bytes_col: str = "audio", window_s: float = 1.0):
        self.bytes_col = bytes_col
        self.window_s = window_s

    def _decode(self, blob: bytes) -> tuple[int, np.ndarray]:
        if blob[:4] == _MAGIC_AUD:
            rate, n = struct.unpack("<II", blob[4:12])
            pcm = np.frombuffer(blob[12:12 + 2 * n], np.int16)
            return rate, pcm
        raise NotImplementedError(
            "real audio codecs unavailable in this sandbox; "
            "payload is not a VAUD container")

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, widx, abs_sum, zero_x = [], [], [], []
        id_col = batch.column_names[0]
        for rid, blob in zip(batch[id_col].to_pylist(),
                             batch[self.bytes_col].to_pylist()):
            rate, pcm = self._decode(blob)
            win = max(1, int(rate * self.window_s))
            for w in range(0, len(pcm), win):
                seg = pcm[w:w + win].astype(np.int64)
                ids.append(rid)
                widx.append(w // win)
                abs_sum.append(int(np.abs(seg).sum()))
                zero_x.append(int(((seg[:-1] < 0) != (seg[1:] < 0)).sum()))
        return pa.table({
            id_col: pa.array(ids),
            "window": pa.array(widx, pa.int32()),
            "abs_sum": pa.array(abs_sum, pa.int64()),
            "zero_crossings": pa.array(zero_x, pa.int64()),
        })


def chunk_audio(ds, bytes_col: str = "audio", window_s: float = 1.0,
                concurrency: int = 2, batch_size: int = 16):
    """Blob rows are heavy: small batches, actor pool (SURVEY §7.4.6)."""
    return ds.map_batches(
        AudioChunker,
        fn_constructor_kwargs={"bytes_col": bytes_col,
                               "window_s": window_s},
        batch_format="pyarrow", concurrency=concurrency,
        batch_size=batch_size, num_cpus=0.5)
