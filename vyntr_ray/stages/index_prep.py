"""Index-preparation transforms: preview, language fill, blocklist flag.

Rebuild of the Pulse ingest row prep (`pulse/src/main.rs:100-143`):

- ``generate_preview`` — M10 (`pulse/src/main.rs:24-33`): trim, keep whole
  text when ≤ ``max_len`` *chars*, else first ``max_len`` chars + "...".
- language default fill — M13 (`pulse/src/main.rs:109`): null/"" → "en".
- blocklist flag — M11 (`pulse/src/main.rs:114-118,219-246`): the NSFW
  domain-set membership probe, generalized to flagging rows whose key is in
  a broadcast set; an **actor-pool stage** so the (large) set loads once per
  worker, exactly like the reference loads `top_1m_nsfw_sites.txt` once.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["generate_preview", "prep_batch", "index_prep", "BlocklistFlagger"]


def generate_preview(text: str, max_len: int = 500) -> str:
    text = text.strip()
    if len(text) <= max_len:
        return text
    return text[:max_len] + "..."


def prep_batch(batch: pa.Table, text_col: str = "text",
               lang_col: str = "lang", max_len: int = 500) -> pa.Table:
    """Vectorized preview + language fill over one Arrow batch."""
    trimmed = pc.utf8_trim_whitespace(batch[text_col])
    short = pc.less_equal(pc.utf8_length(trimmed), max_len)
    truncated = pc.binary_join_element_wise(
        pc.utf8_slice_codeunits(trimmed, 0, max_len), "...", "")
    preview = pc.if_else(short, trimmed, truncated)
    lang = batch[lang_col]
    lang = pc.if_else(
        pc.or_kleene(pc.is_null(lang), pc.equal(lang, "")),
        pa.scalar("en"), lang)
    out = batch.append_column("preview", preview)
    idx = out.schema.get_field_index(lang_col)
    return out.set_column(idx, lang_col, lang)


class BlocklistFlagger:
    """Actor-pool stage: flag rows whose ``key_col`` is in a broadcast set.

    The set is shipped once via ``ray.put`` and resolved once per actor in
    ``__init__`` — not per batch (SURVEY §2.3 T8 / M11).
    """

    def __init__(self, blocklist_ref, key_col: str = "source",
                 flag_col: str = "nsfw"):
        import ray
        blocklist = (ray.get(blocklist_ref)
                     if not isinstance(blocklist_ref, (set, frozenset))
                     else blocklist_ref)
        self.values = pa.array(sorted(blocklist), pa.string())
        self.key_col = key_col
        self.flag_col = flag_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        flag = pc.is_in(batch[self.key_col], value_set=self.values)
        return batch.append_column(self.flag_col, flag)


def index_prep(ds, blocklist: set[str] | None = None,
               text_col: str = "text", lang_col: str = "lang",
               key_col: str = "source", concurrency: int = 2):
    """Full Pulse-style ingest prep pipeline over a documents Dataset."""
    import ray

    out = ds.map_batches(
        lambda b: prep_batch(b, text_col, lang_col), batch_format="pyarrow")
    if blocklist is not None:
        ref = ray.put(frozenset(blocklist))
        out = out.map_batches(
            BlocklistFlagger, fn_constructor_args=(ref, key_col),
            batch_format="pyarrow", concurrency=concurrency, num_cpus=0.5)
    return out
