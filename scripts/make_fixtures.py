#!/usr/bin/env python
"""Generate oracle fixture parquets (deterministic; no Ray session needed).

Two fixtures under tests/fixtures/ let DuckDB oracle-check pipelines whose
core transform is not SQL-expressible:

- ``chunk_embeddings.parquet`` (chunk_md5, pos, val): the StubEncoder's
  exact per-chunk output for every distinct chunk text across the sf test
  dirs, keyed by md5 of the chunk text.  The oracle re-derives chunk texts
  in SQL (same window arithmetic as the chunk_documents oracle), joins on
  the md5, and mean-pools per document — so only the hash-seeded encoder
  itself is pinned by fixture; chunking and pooling are recomputed by SQL.
- ``extract_text_golden.parquet``: the pinned parse output (url, language,
  title, content_text, partition) for the 1500-page synthetic store.
  ``extract.parse_html`` semantics are already pinned by golden fixtures in
  tests/test_extract.py; this extends that regression pin to the driver's
  oracle harness.

Rerun after any intentional encoder/parser change:
    python scripts/make_fixtures.py
"""

from __future__ import annotations

import hashlib
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FIXTURE_DIR = os.path.join(REPO, "tests", "fixtures")
SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01",
           "/root/testdata/sf0.1"]


def chunk_embeddings_fixture() -> str:
    from vyntr_ray.stages.embed import Chunker, StubEncoder

    chunker = Chunker()
    enc = StubEncoder(dim=16)
    seen: set[str] = set()
    md5s, poss, vals = [], [], []
    for sf in SF_DIRS:
        tab = pq.read_table(os.path.join(sf, "documents.parquet"),
                            columns=["doc_id", "text"])
        chunks = chunker(tab)
        fresh: list[tuple[str, str]] = []
        for t in chunks["chunk_text"].to_pylist():
            m = hashlib.md5(t.encode("utf-8")).hexdigest()
            if m not in seen:
                seen.add(m)
                fresh.append((m, t))
        if not fresh:
            continue
        emb = enc.encode([t for _, t in fresh])  # float32 — exact values
        for (m, _), v in zip(fresh, emb):
            for p, x in enumerate(v, start=1):
                md5s.append(m)
                poss.append(p)
                vals.append(float(x))
    out = pa.table({"chunk_md5": pa.array(md5s, pa.string()),
                    "pos": pa.array(poss, pa.int64()),
                    "val": pa.array(vals, pa.float64())})
    path = os.path.join(FIXTURE_DIR, "chunk_embeddings.parquet")
    pq.write_table(out, path)
    return f"{path}: {out.num_rows} rows ({len(seen)} distinct chunks)"


def extract_text_fixture() -> str:
    from vyntr_ray.pipelines.crawl import parse_pages_batch
    from vyntr_ray.sources.pages import gen_pages_table

    tab = gen_pages_table(range(1500), 1500, seed=42).select(["url", "html"])
    parsed = parse_pages_batch(tab)
    out = parsed.select(["url", "language", "title", "content_text",
                         "partition"])
    path = os.path.join(FIXTURE_DIR, "extract_text_golden.parquet")
    pq.write_table(out, path)
    return f"{path}: {out.num_rows} rows"


def main() -> None:
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    print(chunk_embeddings_fixture())
    print(extract_text_fixture())


if __name__ == "__main__":
    main()
