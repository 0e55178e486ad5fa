"""Deterministic synthetic Common-Crawl-style page table (FIXTURES.md §1).

Input shape mandated by BASELINE.json ``input_hint``:
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.

Pages embed a seeded link graph inside the ``html`` column so crawl
simulations are closed-world and reproducible; ``text`` carries the expected
extraction output (computed with the pinned pure-Python extractor) so the
per-row byte-identical invariant ``extract(html).content_text == text`` is
directly testable through the Ray pipeline.

Everything is a pure function of ``(index, n_pages, n_hosts, seed)``; batch
generation is embarrassingly parallel and is run through
``ray.data.range(n).map_batches`` for large scales.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..extract import parse_html
from ..urls import md5_partition

EPOCH_US = 1_751_155_200_000_000  # 2025-06-29T00:00:00Z in microseconds

PAGES_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
    ("text", pa.string()),
    ("lang", pa.string()),
])

_LANGS = ["en", "en", "en", "de", "fr", "ja", ""]
_WORDS = (
    "the quick brown fox jumps over lazy dog crawl frontier parquet arrow "
    "stream shard batch queue filter index token bucket robots page link "
    "host domain fetch parse extract text title meta canonical wave seed"
).split()


def page_host(i: int, n_hosts: int) -> int:
    """Zipf-ish host assignment: low host ids get quadratically more pages."""
    u = ((i * 2654435761) & 0xFFFFFFFF) / 2**32
    return int(n_hosts * u * u) % n_hosts


def page_url(i: int, n_hosts: int) -> str:
    return f"https://host{page_host(i, n_hosts)}.example/p/{i}"


def _page_record(i: int, n_pages: int, n_hosts: int, seed: int,
                 rich: bool = False) -> dict:
    rng = np.random.Generator(np.random.PCG64(seed * 1_000_003 + i))
    host = page_host(i, n_hosts)
    url = page_url(i, n_hosts)
    lang = _LANGS[int(rng.integers(0, len(_LANGS)))]

    # --- link targets: seeded graph edges over the same url universe
    outdeg = int(rng.integers(3, 9))
    targets = rng.integers(0, n_pages, size=outdeg)
    anchors = []
    for j in targets:
        j = int(j)
        t_host = page_host(j, n_hosts)
        t_url = page_url(j, n_hosts)
        form = int(rng.integers(0, 4))
        if form == 0 and t_host == host:
            href = f"/p/{j}"                     # relative absolute-path
        elif form == 1:
            href = t_url + "#sec"                # fragment → stripped, dedup
        else:
            href = t_url
        anchors.append(f'<a href="{href}">l{j}</a>')
    if rng.random() < 0.08:                      # dangling link (fetch miss)
        anchors.append(
            f'<a href="https://host{host}.example/missing/{i}">m</a>')
    if rng.random() < 0.3:                       # noise the filter must drop
        noise = ['<a href="mailto:a@b.c">e</a>',
                 '<a href="/img/x.jpg">img</a>',
                 '<a href="/download/file">d</a>',
                 '<a href="javascript:void(0)">j</a>']
        anchors.append(noise[int(rng.integers(0, len(noise)))])

    # --- head
    head = []
    title = f"Page {i} — host{host}"
    head.append(f"<title>{title}</title>")
    if rng.random() < 0.7:
        words = " ".join(rng.choice(_WORDS, size=6))
        head.append(f'<meta name="description" content="{words}">')
    if rng.random() < 0.4:
        head.append(f'<meta property="og:title" content="{title}">')
    if rng.random() < 0.3:
        head.append(f'<link rel="canonical" href="{url}">')

    # --- body: h1-h6/p/li content plus excluded noise
    # rich mode (bench workloads): realistic page weight so parse cost
    # dominates over scheduling overhead, as it would on real Common Crawl
    n_paras = int(rng.integers(25, 70)) if rich else int(rng.integers(1, 5))
    body = [f"<h1>Heading {i}</h1>"]
    for _ in range(n_paras):
        words = " ".join(rng.choice(_WORDS, size=int(rng.integers(4, 14))))
        if rng.random() < 0.1:
            words += " &amp; more"
        pad = " " if rng.random() < 0.3 else ""
        body.append(f"<p>{pad}{words}{pad}</p>")
    if rng.random() < 0.15:
        body.append("<p>   </p>")                # whitespace-only chunk
    if rng.random() < 0.4:
        items = "".join(
            f"<li>item {int(x)}</li>" for x in rng.integers(0, 99, size=3))
        body.append(f"<ul>{items}</ul>")
    body.append(f"<div>chrome not extracted {i}</div>")
    body.extend(anchors)

    lang_attr = f' lang="{lang}"' if lang else ""
    html = (f"<!DOCTYPE html><html{lang_attr}><head>{''.join(head)}</head>"
            f"<body>{''.join(body)}</body></html>")
    text = parse_html(html, url).content_text
    return {
        "url": url,
        "warc_ts": EPOCH_US + i * 1_000_000,
        "html": html.encode("utf-8"),
        "text": text,
        "lang": lang,
    }


def gen_pages_table(indices, n_pages: int, n_hosts: int | None = None,
                    seed: int = 42, rich: bool = False) -> pa.Table:
    """Generate page rows for ``indices`` (any int iterable) as Arrow."""
    if n_hosts is None:
        n_hosts = max(1, n_pages // 50)
    recs = [_page_record(int(i), n_pages, n_hosts, seed, rich) for i in indices]
    cols = {name: [r[name] for r in recs] for name in PAGES_SCHEMA.names}
    cols["warc_ts"] = pa.array(cols["warc_ts"], type=pa.timestamp("us"))
    return pa.table(cols, schema=PAGES_SCHEMA)


def gen_robots_table(n_pages: int, n_hosts: int | None = None,
                     seed: int = 42) -> pa.Table:
    """robots.txt rows for every 5th host: ``Disallow: /p/<digit>``.

    The prefix rule blocks ~10% of that host's pages (every page id whose
    decimal form starts with the digit) — deterministic, meaningful robots
    pressure for crawl tests and benches.
    """
    if n_hosts is None:
        n_hosts = max(1, n_pages // 50)
    urls, htmls, texts = [], [], []
    for h in range(0, n_hosts, 5):
        body = (f"# synthetic robots for host{h}\n"
                f"User-agent: other-bot\nDisallow: /\n\n"
                f"User-agent: *\nDisallow: /p/{h % 10}\n")
        urls.append(f"https://host{h}.example/robots.txt")
        htmls.append(body.encode("utf-8"))
        texts.append("")
    n = len(urls)
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array([EPOCH_US] * n, pa.timestamp("us")),
        "html": pa.array(htmls, pa.binary()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array([""] * n, pa.string()),
    }, schema=PAGES_SCHEMA)


def make_pages_dataset(n_pages: int, n_hosts: int | None = None,
                       seed: int = 42, parallelism: int = -1,
                       rich: bool = False):
    """Distributed generation: ``ray.data`` Dataset of the page table."""
    import ray.data as rd

    if n_hosts is None:
        n_hosts = max(1, n_pages // 50)

    def gen(batch: dict) -> pa.Table:
        return gen_pages_table(batch["id"], n_pages, n_hosts, seed, rich)

    if parallelism <= 0:
        # range() blocks are sized by the tiny int payload (a 2M-row range
        # is ONE ~16 MB block), which would serialize the expensive html
        # generation onto 1-2 tasks — block explicitly on row count.
        # Content is a pure function of id, so block count never changes
        # the generated store.
        parallelism = max(16, n_pages // 25_000)
    ds = rd.range(n_pages, override_num_blocks=parallelism)
    return ds.map_batches(gen, batch_format="numpy", batch_size=2048)


def _gen_bucket_file(bucket: int, id_dir: str, out_dir: str, n_pages: int,
                     n_hosts: int, seed: int, rich: bool,
                     robots_tab: pa.Table | None,
                     chunk_rows: int = 4096) -> int:
    """One store bucket, generated STREAMING: read this bucket's (tiny)
    id list from the staged partition, regenerate its page rows in
    ``chunk_rows`` chunks (content is a pure function of id), and append
    each chunk as one parquet row group via ``ParquetWriter`` — worker
    heap holds one chunk, never the bucket.  tmp + atomic rename; a rerun
    (or a resumed build) skips buckets whose final file exists.  Chunk-
    sized row groups also give the fused fetch's url-first row-group
    probe real pruning granularity (one row group per bucket meant
    match-anything ⇒ decode-everything)."""
    import glob as _glob

    bdir = os.path.join(out_dir, f"bucket={bucket}")
    final = os.path.join(bdir, "part-0.parquet")
    if os.path.exists(final):
        return pq.ParquetFile(final).metadata.num_rows
    id_files = sorted(_glob.glob(os.path.join(id_dir, f"bucket={bucket}",
                                              "*.parquet")))
    ids = (np.sort(np.concatenate(
        [pq.read_table(f, columns=["id"])["id"].to_numpy() for f in id_files]))
        if id_files else np.array([], np.int64))
    n = 0
    os.makedirs(bdir, exist_ok=True)
    tmp = final + ".tmp"
    with pq.ParquetWriter(tmp, PAGES_SCHEMA) as w:
        for lo in range(0, len(ids), chunk_rows):
            t = gen_pages_table(ids[lo:lo + chunk_rows], n_pages, n_hosts,
                                seed, rich)
            w.write_table(t)
            n += t.num_rows
        if robots_tab is not None and robots_tab.num_rows:
            w.write_table(robots_tab)
            n += robots_tab.num_rows
    os.replace(tmp, final)
    return n


def write_pages_store(n_pages: int, out_dir: str, n_hosts: int | None = None,
                      seed: int = 42, n_buckets: int = 64,
                      rich: bool = False) -> str:
    """Materialize the page table partitioned by url-hash bucket.

    Rows are co-located per bucket so each bucket is ONE parquet file — a
    crawl wave's fetch join then opens only the bucket files its urls hash
    into, and plan-time metadata discovery stays O(wave), not O(files).
    ``n_buckets`` is a scale parameter: size it so a bucket is a few GB at
    the target corpus (the reference hardcodes 256,
    `genesis/src/db.rs:110-114`).

    BUCKET-FIRST streaming build (r5): page content is a pure function of
    the page id, so only the (id, bucket) pairs ever cross the cluster —

    1. map-only pass over the id range emits (id, bucket) (~12 bytes/row;
       the html never materializes here) into a partitioned staging dir,
    2. one raw task per bucket regenerates its rows chunk-by-chunk and
       streams row groups straight into the final bucket file
       (`_gen_bucket_file`: ParquetWriter, tmp + atomic rename,
       restartable per bucket).

    Replaces the staged full-corpus write + full-corpus bucket shuffle
    whose ~3× transient disk (staging + store + shuffle spill) made an 8M
    local soak impossible (measured OutOfDiskError, r2): peak disk is now
    final store + O(n_pages·12B) id staging, and peak worker heap is one
    chunk per task.
    """
    import json
    import shutil
    import tempfile

    import ray
    import ray.data as rd

    from ..urls import url_bucket

    if n_hosts is None:
        n_hosts = max(1, n_pages // 50)

    def id_bucket(batch: dict) -> pa.Table:
        ids = np.asarray(batch["id"], np.int64)
        bks = [url_bucket(page_url(int(i), n_hosts), n_buckets)
               for i in ids]
        return pa.table({"id": pa.array(ids, pa.int64()),
                         "bucket": pa.array(bks, pa.int32())})

    # per-bucket resume guard: bucket files are only reusable for the
    # SAME build parameters — a params marker written at build START
    # (store_meta.json only lands at the end) makes a crashed build
    # resumable while a params CHANGE wipes stale buckets instead of
    # silently mixing corpora
    params = {"n_pages": n_pages, "n_hosts": n_hosts, "seed": seed,
              "n_buckets": n_buckets, "rich": rich}
    pmark = os.path.join(out_dir, "_BUILD_PARAMS.json")
    if os.path.isdir(out_dir):
        prev = None
        if os.path.exists(pmark):
            with open(pmark) as f:
                prev = json.load(f)
        if prev != params:
            shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    with open(pmark, "w") as f:
        json.dump(params, f)

    id_dir = tempfile.mkdtemp(prefix="pages_ids_")
    try:
        par = max(16, n_pages // 100_000)
        (rd.range(n_pages, override_num_blocks=par)
         .map_batches(id_bucket, batch_format="numpy")
         .write_parquet(id_dir, partition_cols=["bucket"]))

        # robots rows are O(n_hosts/5) — bucket them driver-side and hand
        # each task its slice (appended after the sorted page ids)
        rob = gen_robots_table(n_pages, n_hosts, seed)
        rob_bk = np.array([url_bucket(u, n_buckets)
                           for u in rob["url"].to_pylist()], np.int64)

        os.makedirs(out_dir, exist_ok=True)
        task = ray.remote(num_cpus=1)(_gen_bucket_file)
        refs = [task.remote(b, id_dir, out_dir, n_pages, n_hosts, seed,
                            rich, rob.filter(pa.array(rob_bk == b)))
                for b in range(n_buckets)]
        n_written = sum(ray.get(refs))
        assert n_written == n_pages + rob.num_rows, \
            f"store build wrote {n_written}, expected {n_pages + rob.num_rows}"
    finally:
        shutil.rmtree(id_dir, ignore_errors=True)
    with open(os.path.join(out_dir, "store_meta.json"), "w") as f:
        json.dump({"n_buckets": n_buckets, "n_pages": n_pages,
                   "seed": seed, "rich": rich}, f)
    return out_dir


def make_seed_list(n_pages: int, n_hosts: int | None = None, n_seeds: int = 10,
                   seed: int = 42) -> list[str]:
    """Raw seed lines as the reference reads them (`genesis/src/main.rs:142-153`):

    mostly normalized urls, plus one scheme-less and one uppercase entry to
    exercise the http:// fallback + normalization path.
    """
    if n_hosts is None:
        n_hosts = max(1, n_pages // 50)
    rng = np.random.Generator(np.random.PCG64(seed))
    idx = sorted(int(i) for i in rng.choice(n_pages, size=n_seeds, replace=False))
    seeds = [page_url(i, n_hosts) for i in idx]
    if len(seeds) >= 2:
        seeds[0] = seeds[0].removeprefix("https://")          # scheme-less
        host_part = f"host{page_host(idx[1], n_hosts)}"
        seeds[1] = seeds[1].replace(host_part, host_part.upper(), 1)
    return seeds
