"""JSONL analyses sink + tolerant reader (S5, S6-S8).

Sink mirrors `genesis/src/db.rs:90-147`: records sanitized, serialized one
compact JSON object per line in SeoAnalysis field order, chunked at ≤10,000
rows per file, laid out ``analyses/partition=XX/batch_<id>.jsonl`` where
``XX`` is the md5-first-byte of the **first record in the chunk**
(`db.rs:110-114` — yes, the whole chunk keys off its first row; kept for
byte-level layout parity).  Runs as a distributed ``map_batches`` writer
with deterministic per-batch file ids (task retries overwrite, not
duplicate).

Reader mirrors the tolerant JSONL loaders (`content_cleaner.js:70-112`,
`generate_embeddings.py:171-196`, `pulse/src/main.rs:91-153`): recursive
``*.jsonl`` discovery, per-line parse, malformed lines skipped (counted),
missing fields tolerated as nulls.
"""

from __future__ import annotations

import hashlib
import json
import os

import pyarrow as pa

from ..extract import sanitize_text
from ..urls import md5_partition

__all__ = ["analysis_to_json", "write_analyses_jsonl", "read_jsonl_tolerant"]

_FIELDS = ("url", "language", "title", "meta_tags", "canonical_url",
           "content_text")


def analysis_to_json(rec: dict) -> str:
    """Compact serde_json-style serialization in struct field order."""
    clean = {
        "url": sanitize_text(rec.get("url", "") or ""),
        "language": sanitize_text(rec.get("language", "") or ""),
        "title": sanitize_text(rec.get("title", "") or ""),
        "meta_tags": [
            {"name": sanitize_text(m.get("name", "") or ""),
             "content": sanitize_text(m.get("content", "") or "")}
            for m in (rec.get("meta_tags") or [])],
        "canonical_url": (sanitize_text(rec["canonical_url"])
                          if rec.get("canonical_url") is not None else None),
        "content_text": sanitize_text(rec.get("content_text", "") or ""),
    }
    return json.dumps(clean, ensure_ascii=False, separators=(",", ":"))


def write_analyses_jsonl(ds, out_dir: str, max_rows_per_file: int = 10_000):
    """Distributed JSONL sink with the reference's partition layout."""

    def write_batch(batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        n_files = 0
        for i in range(0, len(rows), max_rows_per_file):
            chunk = rows[i:i + max_rows_per_file]
            lines = [analysis_to_json(r) for r in chunk]
            body = "\n".join(lines)
            if not body:
                continue
            partition = md5_partition(chunk[0]["url"])  # first record keys
            pdir = os.path.join(out_dir, f"partition={partition}")
            os.makedirs(pdir, exist_ok=True)
            tag = hashlib.md5(
                (chunk[0]["url"] + f":{len(chunk)}").encode()).hexdigest()[:16]
            tmp = os.path.join(pdir, f".batch_{tag}.tmp")
            with open(tmp, "w", encoding="utf-8") as f:
                f.write(body)
            os.replace(tmp, os.path.join(pdir, f"batch_{tag}.jsonl"))
            n_files += 1
        return pa.table({"files": pa.array([n_files], pa.int64()),
                         "rows": pa.array([len(rows)], pa.int64())})

    stats = ds.map_batches(write_batch, batch_format="pyarrow",
                           batch_size=max_rows_per_file).to_pandas()
    return {"files": int(stats["files"].sum()),
            "rows": int(stats["rows"].sum())}


def read_jsonl_tolerant(root: str, columns: list[str] | None = None):
    """Recursive *.jsonl read; bad lines dropped, missing fields → null."""
    import ray.data as rd

    def parse(batch: pa.Table) -> pa.Table:
        recs = []
        for line in batch["text"].to_pylist():
            if not line.strip():
                continue
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue  # warn-and-skip semantics
            if not isinstance(rec, dict):
                continue
            recs.append({f: rec.get(f) for f in (columns or _FIELDS)})
        if not recs:
            return pa.table({f: pa.array([], pa.string())
                             for f in (columns or _FIELDS)})
        return pa.Table.from_pylist(recs)

    ds = rd.read_text(root, file_extensions=["jsonl"])
    return ds.map_batches(parse, batch_format="pyarrow")
