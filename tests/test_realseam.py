"""Real-library seam smoke tests (r4-verdict item 7).

The HFEncoder and ImageDecoder production seams are contract-tested
elsewhere with fakes (`tests/test_stages.py`); these tests run them against
the REAL libraries so the first environment that ships torch / transformers
/ PIL exercises the seams with zero code changes:

    pytest -m realseam -rs

In this sandbox (no torch, no PIL) every test skips, and the skip reason
names the missing imports.  Reference behaviors pinned here:
MiniLM-L6-v2 mean-pool embedding (genesis
`tools/embedding/generate_embeddings.py:199-278`) and real image decode.
"""
from __future__ import annotations

import pytest


def _missing(*mods: str) -> list[str]:
    out = []
    for m in mods:
        try:
            __import__(m)
        except ImportError:
            out.append(m)
    return out


_TORCH_MISSING = _missing("torch", "transformers")
_PIL_MISSING = _missing("PIL")

pytestmark = pytest.mark.realseam


@pytest.mark.skipif(bool(_TORCH_MISSING),
                    reason=f"missing imports: {_TORCH_MISSING}")
class TestHFEncoderReal:
    MODEL = "sentence-transformers/all-MiniLM-L6-v2"

    def _encoder(self):
        from vyntr_ray.stages.embed import HFEncoder
        try:
            return HFEncoder(model_name=self.MODEL)
        except OSError as e:  # importable libs but no weights (offline)
            pytest.skip(f"model weights unavailable (offline?): {e}")

    def test_encode_shape_and_determinism(self):
        enc = self._encoder()
        texts = ["the quick brown fox", "jumps over the lazy dog", ""]
        a = enc.encode(texts)
        b = enc.encode(texts)
        assert a.shape == (3, 384)          # MiniLM-L6-v2 hidden size
        assert a.dtype.name == "float32"
        import numpy as np
        assert np.isfinite(a).all()
        assert np.allclose(a, b)            # eval mode ⇒ deterministic

    def test_embed_chunks_real_model(self, ray_session):
        """The full actor-pool path with model= set — the one-command flip
        from StubEncoder to the production encoder."""
        import pyarrow as pa
        import ray.data as rd
        from vyntr_ray.stages.embed import embed_chunks
        self._encoder()                      # weight-availability gate
        ds = rd.from_arrow(pa.table({
            "doc_id": list(range(6)),
            "chunk_text": [f"document number {i} about rays" for i in range(6)],
        }))
        out = embed_chunks(ds, model=self.MODEL, concurrency=1,
                           batch_size=4).take_all()
        assert len(out) == 6
        assert all(len(r["embedding"]) == 384 for r in out)


@pytest.mark.skipif(bool(_PIL_MISSING),
                    reason=f"missing imports: {_PIL_MISSING}")
class TestImageDecoderReal:
    def test_decode_real_png(self, ray_session):
        """A real PNG (not the VIMG fake container) through the actor-pool
        decode stage: dimensions, grayscale md5 and histogram must match a
        direct PIL decode."""
        import hashlib
        import io

        import numpy as np
        import pyarrow as pa
        import ray.data as rd
        from PIL import Image

        from vyntr_ray.stages.multimodal import decode_images

        rng = np.random.Generator(np.random.PCG64(7))
        px = rng.integers(0, 256, size=(13, 17, 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(px, "RGB").save(buf, format="PNG")
        blob = buf.getvalue()

        ds = rd.from_arrow(pa.table({"doc_id": [1],
                                     "image": pa.array([blob], pa.binary())}))
        (row,) = decode_images(ds, concurrency=1, batch_size=8).take_all()
        gray = np.asarray(
            Image.open(io.BytesIO(blob)).convert("L")).ravel()
        assert (row["width"], row["height"]) == (17, 13)
        assert row["pixel_md5"] == hashlib.md5(gray.tobytes()).hexdigest()
        hist, _ = np.histogram(gray, bins=16, range=(0, 256))
        assert np.allclose(row["features"],
                           (hist / gray.size).astype(np.float32))
