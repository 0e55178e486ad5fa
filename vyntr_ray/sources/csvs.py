"""Tolerant CSV source — the CSV sibling of the tolerant JSONL readers
(sources/jsonl.py; reference parity: the reference's batch readers skip
malformed records rather than failing the run, e.g. its JSONL ingest —
see SURVEY §2 S6–S8).

``ray.data.read_csv`` delegates to the Arrow CSV reader, which aborts
the whole file on a malformed row — unusable for web-scale scrapes
where a few broken lines per shard are normal.  This reader goes
line-based (``read_text`` streams blocks of lines, so parallelism and
backpressure come from Ray Data, not the parser) and applies
warn-and-skip semantics per LINE: wrong column count, unparseable
typed fields, or embedded-quote damage drop that line only.

Quoting: standard RFC-4180 double-quote handling via Python's ``csv``
module per block (C-accelerated); a line whose quotes never close is
dropped rather than silently merged with its neighbor (the classic CSV
corruption mode), because each line parses independently here —
multi-line quoted fields are therefore out of scope by contract (the
tolerant/streaming trade-off, documented).
"""

from __future__ import annotations

import csv
import io

import pyarrow as pa

__all__ = ["read_csv_tolerant"]

_CASTERS = {
    "int64": int,
    "double": float,
    "string": lambda s: s,
}


def read_csv_tolerant(root: str, schema: dict[str, str],
                      header: bool = True):
    """Read ``*.csv`` under ``root`` into the typed ``schema`` (an
    ordered name -> {'int64','double','string'} mapping), skipping any
    line that fails to parse.  Empty string in a typed column -> null.
    Returns a Dataset with exactly the schema's columns."""
    import ray.data as rd

    names = list(schema)
    caster = [_CASTERS[schema[n]] for n in names]
    arrow_t = {"int64": pa.int64(), "double": pa.float64(),
               "string": pa.string()}

    def parse(batch: pa.Table) -> pa.Table:
        cols: list[list] = [[] for _ in names]
        for line in batch["text"].to_pylist():
            s = line.strip("\r\n")
            if not s:
                continue
            if header and s == ",".join(names):
                continue                      # header line (any block)
            try:
                row = next(csv.reader(io.StringIO(s)))
            except (csv.Error, StopIteration):
                continue
            if len(row) != len(names):
                continue
            try:
                vals = [None if v == "" else c(v)
                        for c, v in zip(caster, row)]
            except ValueError:
                continue
            for i, v in enumerate(vals):
                cols[i].append(v)
        return pa.table({n: pa.array(c, arrow_t[schema[n]])
                         for n, c in zip(names, cols)})

    ds = rd.read_text(root, file_extensions=["csv"])
    return ds.map_batches(parse, batch_format="pyarrow")
