"""Record → embedding-input projection (M9).

Mirrors `genesis/tools/embedding/generate_embeddings.py:90-105`
(`extract_relevant_text`): combine title, the first ``description`` meta
tag's content, and the content text into the canonical
``Title: …\\nDescription: …\\nContent: …`` prompt, then strip.
"""

from __future__ import annotations

import pyarrow as pa

__all__ = ["extract_relevant_text", "relevant_text_batch"]


def extract_relevant_text(entry: dict) -> str:
    title = entry.get("title", "") or ""
    content = entry.get("content_text", "") or ""
    description = ""
    meta = entry.get("meta_tags")
    if isinstance(meta, (list, tuple)):
        for tag in meta:
            if (isinstance(tag, dict) and tag.get("name") == "description"
                    and tag.get("content")):
                description = tag["content"]
                break
    return (f"Title: {title}\nDescription: {description}\n"
            f"Content: {content}").strip()


def relevant_text_batch(batch: pa.Table, title_col: str = "title",
                        meta_col: str | None = "meta_tags",
                        content_col: str = "content_text",
                        out_col: str = "relevant_text") -> pa.Table:
    """Vectorized batch wrapper over analysis-shaped rows."""
    titles = (batch[title_col].to_pylist()
              if title_col in batch.schema.names else [""] * batch.num_rows)
    contents = (batch[content_col].to_pylist()
                if content_col in batch.schema.names
                else [""] * batch.num_rows)
    metas = (batch[meta_col].to_pylist()
             if meta_col and meta_col in batch.schema.names
             else [None] * batch.num_rows)
    out = [extract_relevant_text(
        {"title": t, "content_text": c, "meta_tags": m})
        for t, c, m in zip(titles, contents, metas)]
    return batch.append_column(out_col, pa.array(out, pa.string()))
