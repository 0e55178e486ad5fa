"""Content cleaner: the ordered 8-regex chain + drop rule (M6/M7/M8).

Re-expresses `genesis/tools/dataset/content_cleaner.js:20-37,64-112` as a
vectorized Ray ``map_batches`` stage.  The pattern table is data (kept
verbatim, order-preserving); per-pattern byte-reduction stats (A2,
`content_cleaner.js:82-92`) are emitted as partial counts per batch and
summed with a tiny aggregate — the partial/final split the reference does
across worker threads (`content_cleaner.js:196-206`).
"""

from __future__ import annotations

import re

import pyarrow as pa

__all__ = ["PATTERNS", "clean_text", "clean_batch", "clean_documents",
           "cleaning_stats", "PII_PATTERNS", "scrub_pii_batch"]

# (name, compiled pattern, replacement) — order matters.
PATTERNS: list[tuple[str, re.Pattern, str]] = [
    ("spaces", re.compile(r"[ \t　]+"), " "),
    ("tags", re.compile(r"<[^>]+>"), ""),
    ("entities",
     re.compile(r"&(?:[a-z0-9]+|#[0-9]{1,6}|#x[0-9a-f]{1,6});", re.IGNORECASE),
     ""),
    ("controlChars", re.compile(r"[\x00-\x08\x0B-\x1F\x7F]"), ""),
    ("unicodeReplacement", re.compile("�"), ""),
    ("markdown", re.compile(r"\[(.*?)\]\((.*?)\)"), r"\1"),
    ("urls", re.compile(r"\?[^\"'\s<>]+"), ""),
    ("extraLineBreaks", re.compile(r"\n{3,}"), "\n\n"),
]


def clean_text(text: str, stats: dict[str, int] | None = None) -> str:
    """Apply the chain to one string, final trim included."""
    for name, pat, repl in PATTERNS:
        before = len(text)
        text = pat.sub(repl, text)
        if stats is not None:
            red = before - len(text)
            if red > 0:
                stats[name] = stats.get(name, 0) + red
    return text.strip()


def _meta_empty(meta) -> bool:
    """`content_cleaner.js:39-44`: null, blank string, or empty list."""
    if meta is None:
        return True
    if isinstance(meta, str) and meta.strip() == "":
        return True
    if isinstance(meta, (list, tuple)) and len(meta) == 0:
        return True
    try:  # numpy array from Arrow list column
        return len(meta) == 0
    except TypeError:
        return False


def clean_batch(batch: pa.Table, text_col: str = "text",
                meta_col: str | None = None,
                collect_stats: bool = False) -> pa.Table:
    """Vectorized batch cleaner: clean ``text_col``, drop empty rows.

    A row whose text is not a string passes through unmodified
    (`content_cleaner.js:73-76`); a row cleaning to "" with empty meta is
    dropped (`content_cleaner.js:97-101`).
    """
    texts = batch[text_col].to_pylist()
    metas = batch[meta_col].to_pylist() if meta_col else [None] * len(texts)
    stats: dict[str, int] = {}
    out_texts, keep = [], []
    for t, m in zip(texts, metas):
        if not isinstance(t, str):
            out_texts.append(t)        # pass-through on type mismatch (M8)
            keep.append(True)
            continue
        c = clean_text(t, stats if collect_stats else None)
        out_texts.append(c)
        keep.append(not (c == "" and _meta_empty(m)))
    idx = batch.schema.get_field_index(text_col)
    out = batch.set_column(idx, text_col, pa.array(out_texts, pa.string()))
    out = out.filter(pa.array(keep))
    if collect_stats:
        n = out.num_rows
        for name, _, _ in PATTERNS:
            out = out.append_column(
                f"red_{name}",
                pa.array([stats.get(name, 0)] + [0] * (n - 1) if n else [],
                         pa.int64()))
    return out


def clean_documents(ds, text_col: str = "text", meta_col: str | None = None):
    """Dataset-level cleaner stage."""
    return ds.map_batches(
        lambda b: clean_batch(b, text_col, meta_col),
        batch_format="pyarrow")


def cleaning_stats(ds, text_col: str = "text"):
    """A2: total bytes removed per pattern (partial per batch → one sum)."""
    with_stats = ds.map_batches(
        lambda b: clean_batch(b, text_col, collect_stats=True),
        batch_format="pyarrow")
    cols = [f"red_{name}" for name, _, _ in PATTERNS]
    return with_stats.sum(cols)


# --------------------------------------------------------------------------
# PII scrubbing (training-data curation)
# --------------------------------------------------------------------------

# RE2-safe patterns (no lookaround/backrefs) so the DuckDB oracle can
# replicate byte-for-byte; applied IN ORDER (email -> ip -> phone, so a
# redacted ip's digits can't re-match as a phone).
PII_PATTERNS: list[tuple[str, re.Pattern, str]] = [
    ("email", re.compile(r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
     "<EMAIL>"),
    ("ip", re.compile(r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"), "<IP>"),
    ("phone", re.compile(r"\+?\d[\d\- ]{7,}\d"), "<PHONE>"),
]


def scrub_pii_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Redact emails / IPv4s / phone-like digit runs; per-row hit counts.

    Vectorized enough for the hot path (compiled patterns, one pass per
    pattern); counts ride as int64 columns so redaction rates aggregate
    with a plain sum downstream.
    """
    texts = batch[text_col].to_pylist()
    out, counts = [], {name: [] for name, _, _ in PII_PATTERNS}
    for t in texts:
        s = t or ""
        for name, pat, repl in PII_PATTERNS:
            s, n = pat.subn(repl, s)
            counts[name].append(n)
        out.append(s)
    res = batch.set_column(batch.schema.get_field_index(text_col),
                           text_col, pa.array(out, pa.string()))
    for name, _, _ in PII_PATTERNS:
        res = res.append_column(f"n_{name}",
                                pa.array(counts[name], pa.int64()))
    return res
