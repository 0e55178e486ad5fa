"""Proxy parsing (S2/T6) + JSONL sink/reader round-trip (S5-S8)."""

import glob
import json
import os

import pytest

from vyntr_ray.functions.proxy import ProxyRotation, parse_proxy_list
from vyntr_ray.sources.jsonl import analysis_to_json


class TestProxy:
    def test_parse_and_skip_malformed(self):
        lines = ["1.2.3.4:8080:u:p", "bad line", "5.6.7.8:notaport:u:p",
                 "# comment", "", "9.9.9.9:3128:a:b"]
        ps = parse_proxy_list(lines)
        assert [(p.host, p.port) for p in ps] == [("1.2.3.4", 8080),
                                                  ("9.9.9.9", 3128)]
        assert ps[0].url == "http://u:p@1.2.3.4:8080"

    def test_round_robin(self):
        ps = parse_proxy_list(["a:1:u:p", "b:2:u:p", "c:3:u:p"])
        rot = ProxyRotation(ps)
        got = [rot.get_next_proxy().host for _ in range(7)]
        assert got == ["a", "b", "c", "a", "b", "c", "a"]
        assert ProxyRotation([]).get_next_proxy() is None


def test_analysis_json_field_order_and_sanitize():
    rec = {"url": "https://a/\x01", "language": "en", "title": "T\x00i",
           "meta_tags": [{"name": "d", "content": "c\n"}],
           "canonical_url": None, "content_text": "body"}
    line = analysis_to_json(rec)
    obj = json.loads(line)
    assert list(obj) == ["url", "language", "title", "meta_tags",
                         "canonical_url", "content_text"]
    assert obj["url"] == "https://a/" and obj["title"] == "Ti"
    assert obj["meta_tags"] == [{"name": "d", "content": "c"}]
    assert " " not in line.split('","')[0]  # compact separators


@pytest.mark.usefixtures("ray_session")
def test_jsonl_sink_reader_roundtrip(tmp_path):
    import ray.data as rd

    from vyntr_ray.sources.jsonl import read_jsonl_tolerant, write_analyses_jsonl
    from vyntr_ray.urls import md5_partition

    rows = [{"url": f"https://h{i % 3}.example/p/{i}", "language": "en",
             "title": f"t{i}", "meta_tags": [{"name": "n", "content": str(i)}],
             "canonical_url": None, "content_text": f"body {i}"}
            for i in range(50)]
    out = str(tmp_path / "analyses")
    stats = write_analyses_jsonl(rd.from_items(rows), out,
                                 max_rows_per_file=20)
    assert stats["rows"] == 50
    files = glob.glob(os.path.join(out, "partition=*", "batch_*.jsonl"))
    assert files and len(files) == stats["files"]
    # layout: partition dir = md5-first-byte of the FIRST record of the chunk
    for f in files:
        part = f.split("partition=")[1].split(os.sep)[0]
        first = json.loads(open(f).readline())
        assert md5_partition(first["url"]) == part
    # tolerant read back (plus a malformed line injected)
    with open(files[0], "a") as fh:
        fh.write("\n{not json}\n")
    back = read_jsonl_tolerant(out).to_pandas()
    assert len(back) == 50                       # bad line skipped
    assert set(back["url"]) == {r["url"] for r in rows}


def test_upsert_parquet_merge_semantics(ray_session, tmp_path):
    """S9/S10 keyed upsert: incoming wins on conflict, untouched
    partitions keep their bytes, re-running the same upsert is
    idempotent."""
    import pyarrow as pa
    import ray.data as rd

    from vyntr_ray.sources.upsert import read_store, upsert_parquet

    store = str(tmp_path / "store")
    b1 = rd.from_arrow(pa.table({
        "url": [f"u{i}" for i in range(40)],
        "chunk_id": [i % 3 for i in range(40)],
        "val": list(range(40)),
    }))
    stats1 = upsert_parquet(b1, store, ["url", "chunk_id"],
                            n_parts=8).to_pandas()
    assert stats1["n_incoming"].sum() == 40
    assert stats1["n_replaced"].sum() == 0

    import glob
    import os
    mtimes = {f: os.path.getmtime(f)
              for f in glob.glob(f"{store}/part=*/data.parquet")}

    # conflicting update for half the keys + 5 brand-new keys
    b2 = rd.from_arrow(pa.table({
        "url": [f"u{i}" for i in range(20)] + [f"v{i}" for i in range(5)],
        "chunk_id": [i % 3 for i in range(20)] + [0] * 5,
        "val": [1000 + i for i in range(25)],
    }))
    stats2 = upsert_parquet(b2, store, ["url", "chunk_id"],
                            n_parts=8).to_pandas()
    assert stats2["n_replaced"].sum() == 20      # DO UPDATE hits
    back = read_store(store).to_pandas()
    assert len(back) == 45
    lookup = back.set_index(["url", "chunk_id"])["val"]
    assert lookup[("u5", 2)] == 1005             # incoming won
    assert lookup[("u25", 1)] == 25              # untouched key kept
    # partitions that received no incoming rows were not rewritten
    touched = {f"{store}/part={p}/data.parquet"
               for p in stats2["part"]}
    for f, m in mtimes.items():
        if f not in touched:
            assert os.path.getmtime(f) == m

    # idempotency: replaying the same upsert leaves the store identical
    upsert_parquet(b2, store, ["url", "chunk_id"], n_parts=8).to_pandas()
    again = read_store(store).to_pandas()
    pd_sort = lambda d: d.sort_values(["url", "chunk_id"]).reset_index(drop=True)
    assert pd_sort(again).equals(pd_sort(back))
