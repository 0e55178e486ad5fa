"""Actor-owned frontier tier: the 100×-scale link→frontier feedback path.

Round-2 verdict, "What's wrong #4": even on the distributed-links path the
wave's new links funneled through the driver (``links_ds.to_pandas()`` +
serial ``enqueue`` + driver ``frontier.add``) — politeness bounds the
*scheduled* size, not the *discovered* size, so a 1M-page wave × ~10
links/page put 10M rows through one process.  This module removes that
tier:

- :class:`FrontierWorker` — a Ray actor owning a contiguous slice of the
  host-hash buckets.  Internally it IS a :class:`BucketedFrontier` (same
  spill/refill/hot-split kernels, per-worker spill subdir) plus a local
  :class:`PolitenessPolicy` so token-bucket state lives WITH the buckets
  it governs (a domain never spans buckets, so the partition is exact).
- :class:`ActorFrontier` — the driver-side facade with the same surface
  ``run_crawl`` uses (``add / select / __len__ / bucket_of /
  bucket_sizes / to_frame``), plus:

  * :meth:`enqueue_distributed` — the wave's seen-filtered new links
    (a ``(link, orderkey)`` Dataset) never reach the driver.  They are
    sorted by orderkey (global Ray sort), each sorted block is filtered
    (host-extract regex → robots) and its per-wave seen-delta part
    written AS A TASK; the driver sees only per-block counts, computes
    the seq offsets (the distributed prefix-sum shape
    ``stages/sampling.py`` established), and per-block route tasks
    assign ``seq`` and push rows straight to the owning worker.  Serial
    driver work per wave drops from O(discovered) to O(blocks).
  * :meth:`write_parts` — each worker checkpoints its own buckets to its
    own parquet part (no whole-frontier gather on the driver).

Determinism contract (the crawl/sim parity bar): ``seq`` equals exactly
what the serial ``enqueue`` assigns — rank by min-orderkey over the
surviving (host-parsed, robots-allowed) links — because the blocks are
globally orderkey-sorted and offsets are exact prefix sums.  Selection is
unchanged: the same pure ``PolitenessPolicy.select_frame`` kernel runs per
bucket inside each worker, and the driver's final (priority, seq) sort
makes concat order irrelevant (seq is unique).
"""

from __future__ import annotations

import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from .filters import _hash64
from .frontier import BucketedFrontier
from .politeness import PolitenessPolicy

__all__ = ["FrontierWorker", "ActorFrontier"]

_COLS = ["seq", "url", "domain"]

# host of an already-normalized URL (same regex the serial enqueue uses):
# greedy userinfo strip, bracketed IPv6 kept whole, port split off
_HOST_RE = re.compile(
    r"^[a-z][a-z0-9+.\-]*://(?:[^/?#]*@)?(\[[^\]/?#]*\]|[^/:?#@]+)")


class FrontierWorker:
    """One actor = one slice of the frontier's host-hash buckets."""

    def __init__(self, n_buckets: int, spill_dir: str | None,
                 mem_rows: int, head_per_domain: int, cap_hint: int,
                 hot_rows: int, capacity: int, refill: float | None,
                 domain_caps: dict | None):
        self.fr = BucketedFrontier(
            n_buckets=n_buckets, spill_dir=spill_dir, mem_rows=mem_rows,
            head_per_domain=head_per_domain, cap_hint=cap_hint,
            hot_rows=hot_rows)
        # token state lives here, with the domains it governs
        self.policy = PolitenessPolicy(capacity, refill, None,
                                       domain_caps=domain_caps)

    def add(self, df: pd.DataFrame) -> int:
        self.fr.add(df)
        return len(df)

    def select(self) -> pd.DataFrame:
        return self.fr.select(self.policy)

    def total(self) -> int:
        return len(self.fr)

    def bucket_sizes(self) -> dict:
        return self.fr.bucket_sizes()

    def to_frame(self) -> pd.DataFrame:
        return self.fr.to_frame()

    def write_part(self, path: str, with_priority: bool = False) -> int:
        """Checkpoint this worker's buckets (memory + spill) to one file.

        Empty parts are written with the SAME explicit schema as full ones
        so a directory read over all parts never hits a null-type merge."""
        df = self.fr.to_frame()
        has_prio = with_priority or "priority" in df.columns
        fields = [("seq", pa.int64()), ("url", pa.string()),
                  ("domain", pa.string())]
        if has_prio:
            fields.append(("priority", pa.float64()))
        schema = pa.schema(fields)
        if len(df) == 0:
            tbl = schema.empty_table()
        else:
            cols = _COLS + (["priority"] if has_prio else [])
            if has_prio and "priority" not in df.columns:
                df = df.assign(priority=0.0)
            tbl = pa.Table.from_pandas(df[cols],
                                       preserve_index=False).cast(schema)
        pq.write_table(tbl, path)
        return len(df)

    def get_tokens(self) -> dict:
        return dict(self.policy._tokens)

    def set_tokens(self, tokens: dict) -> None:
        self.policy._tokens = dict(tokens)


class ActorFrontier:
    """Driver facade over ``n_actors`` bucket-owning FrontierWorkers.

    Same observable wave semantics as a driver-held
    :class:`BucketedFrontier` (crawl/sim parity-tested); the driver keeps
    only O(actors) state plus a row-count ledger.
    """

    def __init__(self, n_buckets: int = 16, n_actors: int = 4,
                 spill_dir: str | None = None, mem_rows: int = 1_000_000,
                 head_per_domain: int = 32, cap_hint: int = 5,
                 hot_rows: int = 50_000, capacity: int = 5,
                 refill: float | None = None, domain_caps: dict | None = None):
        import ray

        assert head_per_domain >= 2 * cap_hint
        self.n_buckets = n_buckets
        self.n_actors = min(n_actors, n_buckets)
        self.total = 0
        self.has_priority = False   # any row ever carried a priority col
        worker = ray.remote(num_cpus=0.1)(FrontierWorker)
        self.workers = [
            worker.remote(
                n_buckets,
                os.path.join(spill_dir, f"worker={i}") if spill_dir else None,
                mem_rows, head_per_domain, cap_hint, hot_rows,
                capacity, refill, domain_caps)
            for i in range(self.n_actors)]
        # bucket -> owning worker index (contiguous-ish round robin)
        self.owner_of = [b % self.n_actors for b in range(n_buckets)]

    def shutdown(self) -> None:
        """Kill the workers (run_crawl calls this in a finally — leaked
        actors reserve CPU and starve later jobs in long sessions)."""
        import ray
        for w in self.workers:
            try:
                ray.kill(w)
            except Exception:
                pass
        self.workers = []

    # -- partition fn (same hash as BucketedFrontier) -----------------------
    def bucket_of(self, domains: list[str]):
        return (_hash64(domains) % self.n_buckets).astype(int)

    def __len__(self) -> int:
        return self.total

    # -- driver-side add (seeds, resume, small waves) ------------------------
    def add(self, df: pd.DataFrame) -> None:
        import ray

        if len(df) == 0:
            return
        if "priority" in df.columns:
            self.has_priority = True
        b_of = self.bucket_of(df["domain"].tolist())
        owners = np.asarray([self.owner_of[b] for b in b_of])
        futs = [self.workers[o].add.remote(df[owners == o])
                for o in sorted(set(owners.tolist()))]
        ray.get(futs)
        self.total += len(df)

    # -- selection (one politeness wave) -------------------------------------
    def select(self, policy=None) -> pd.DataFrame:
        """Collect ≤cap per domain across all workers in parallel.

        ``policy`` is accepted for interface parity but ignored — token
        state lives in the workers (sync via get/scatter_tokens around
        checkpoints)."""
        import ray

        frames = [f for f in ray.get(
            [w.select.remote() for w in self.workers]) if len(f)]
        if not frames:
            return pd.DataFrame(columns=_COLS)
        out = pd.concat(frames, ignore_index=True)
        if "priority" in out.columns:
            out = out.sort_values(["priority", "seq"],
                                  ascending=[False, True], kind="stable")
        else:
            out = out.sort_values("seq", kind="stable")
        self.total -= len(out)
        return out.reset_index(drop=True)

    # interface parity: the actor path is already distributed
    select_distributed = select

    # -- token state sync (stateful refill mode only) ------------------------
    def gather_tokens(self) -> dict:
        import ray
        merged: dict = {}
        for t in ray.get([w.get_tokens.remote() for w in self.workers]):
            merged.update(t)
        return merged

    def scatter_tokens(self, tokens: dict) -> None:
        import ray
        if not tokens:
            return
        doms = list(tokens)
        owners = [self.owner_of[b] for b in self.bucket_of(doms)]
        parts: list[dict] = [{} for _ in range(self.n_actors)]
        for d, o in zip(doms, owners):
            parts[o][d] = tokens[d]
        ray.get([w.set_tokens.remote(p)
                 for w, p in zip(self.workers, parts)])

    # -- metrics / checkpoint -------------------------------------------------
    def bucket_sizes(self) -> dict:
        import ray
        sizes: dict = {}
        for s in ray.get([w.bucket_sizes.remote() for w in self.workers]):
            sizes.update(s)
        return dict(sorted(sizes.items()))

    def to_frame(self) -> pd.DataFrame:
        import ray
        frames = [f for f in ray.get(
            [w.to_frame.remote() for w in self.workers]) if len(f)]
        if not frames:
            return pd.DataFrame(columns=_COLS)
        return (pd.concat(frames, ignore_index=True)
                .sort_values("seq", kind="stable").reset_index(drop=True))

    def write_parts(self, out_dir: str) -> int:
        """Per-worker frontier checkpoint parts (no driver gather)."""
        import ray
        os.makedirs(out_dir, exist_ok=True)
        ns = ray.get([w.write_part.remote(
            os.path.join(out_dir, f"part-w{i:03d}.parquet"),
            self.has_priority)
            for i, w in enumerate(self.workers)])
        return int(sum(ns))

    def restore_parts(self, paths: list[str]) -> int:
        """Distributed resume: one task per checkpoint part reads the file,
        re-derives bucket ownership from the domain hash, and pushes slices
        straight to the owning workers — the driver sees only per-part row
        counts.  The serial alternative (``pq.read_table(...).to_pandas()``
        → ``ActorFrontier.add``) put the ENTIRE frontier through the driver
        on every resume, the last O(frontier) driver tier of the crawl.

        Re-deriving ownership per row (instead of mapping part files to
        workers 1:1) makes the restore correct across ``n_actors`` changes
        between runs and for legacy single-file ``frontier.parquet``
        checkpoints.  Arrival order across parts is irrelevant: bucket
        spill orders the frame by key before splitting, and selection sorts
        by (priority, seq) — the spill-forced parity suite pins this.
        """
        import ray

        if not paths:
            return 0
        workers = self.workers
        owner_of = self.owner_of
        n_buckets = self.n_buckets

        @ray.remote(num_cpus=0.25)
        def _restore_part(path: str):
            df = pq.read_table(path).to_pandas()
            if len(df) == 0:
                return 0, False
            has_prio = "priority" in df.columns
            b_of = (_hash64(df["domain"].tolist()) % n_buckets).astype(int)
            owners = np.asarray([owner_of[b] for b in b_of])
            futs = [workers[o].add.remote(df[owners == o])
                    for o in sorted(set(owners.tolist()))]
            ray.get(futs)
            return len(df), has_prio

        results = ray.get([_restore_part.remote(p) for p in paths])
        n = int(sum(r[0] for r in results))
        self.has_priority = self.has_priority or any(r[1] for r in results)
        self.total += n
        return n

    # -- the distributed link feedback path -----------------------------------
    def enqueue_distributed(self, links_ds, next_seq: int, wave: int,
                            robots_rules: dict | None, robots_pool,
                            priority_fn, delta_dir: str | None
                            ) -> tuple[int, int, dict]:
        """Seen-filtered ``(link, orderkey)`` Dataset → frontier workers.

        Returns ``(n_new, n_kept, per-bucket enqueued counts)`` —
        everything else stays off the driver.  ``n_new`` is the wave's
        discovered count (pre host/robots filtering, matching the serial
        path's ``stats.discovered``); ``n_kept`` advances ``next_seq``.
        """
        import ray

        if priority_fn is not None:
            self.has_priority = True
        mat = links_ds.materialize()
        if mat.count() == 0:
            return 0, 0, {}
        refs = mat.sort("orderkey").materialize().to_arrow_refs()

        if delta_dir is not None:
            os.makedirs(delta_dir, exist_ok=True)
            for f in os.listdir(delta_dir):   # wave rerun: drop stale parts
                if f.startswith(f"wave-{wave:05d}-"):
                    os.remove(os.path.join(delta_dir, f))

        pf_ref = ray.put(priority_fn) if priority_fn is not None else None
        rules_ref = ray.put(robots_rules) if robots_rules else None
        pool_ref = ray.put(robots_pool) if robots_pool is not None else None

        @ray.remote(num_cpus=0.25, num_returns=2)
        def _filter_block(tbl: pa.Table, delta_file: str | None):
            from ..sim import robots_allowed
            if "link" not in tbl.column_names or tbl.num_rows == 0:
                return (pd.DataFrame({"url": pd.Series(dtype="object"),
                                      "domain": pd.Series(dtype="object")}),
                        (0, 0))
            if delta_file is not None:
                pq.write_table(tbl.select(["link"]).rename_columns(["url"]),
                               delta_file)
            n_new = tbl.num_rows
            s = pd.Series(tbl["link"].to_pylist(), dtype="object")
            hosts = s.str.extract(_HOST_RE, expand=False)
            ok = hosts.notna()
            urls, doms = s[ok], hosts[ok]
            if pool_ref is not None and len(urls):
                pool = ray.get(pool_ref)
                paths = ["/" + u.split("://", 1)[1].split("/", 1)[1]
                         if "/" in u.split("://", 1)[1] else "/"
                         for u in urls]
                flags = np.asarray(pool.allowed(doms.tolist(), paths),
                                   dtype=bool)
                urls, doms = urls[flags], doms[flags]
            elif rules_ref is not None and len(urls):
                rules = ray.get(rules_ref)
                flags = np.fromiter(
                    (robots_allowed(u, rules) for u in urls),
                    bool, len(urls))
                urls, doms = urls[flags], doms[flags]
            df = pd.DataFrame({"url": urls.reset_index(drop=True),
                               "domain": doms.reset_index(drop=True)})
            if pf_ref is not None:
                fn = ray.get(pf_ref)
                df["priority"] = [float(fn(u)) for u in df["url"]]
            return df, (n_new, len(df))

        kept_refs, count_refs = [], []
        for i, ref in enumerate(refs):
            delta_file = (os.path.join(
                delta_dir, f"wave-{wave:05d}-part-{i:04d}.parquet")
                if delta_dir is not None else None)
            k, c = _filter_block.remote(ref, delta_file)
            kept_refs.append(k)
            count_refs.append(c)
        counts = ray.get(count_refs)
        n_new = sum(c[0] for c in counts)
        n_kept = sum(c[1] for c in counts)
        offsets = next_seq + np.concatenate(
            [[0], np.cumsum([c[1] for c in counts])[:-1]]).astype(np.int64)

        workers = self.workers
        owner_of = self.owner_of
        n_buckets = self.n_buckets

        @ray.remote(num_cpus=0.25)
        def _route_block(df: pd.DataFrame, seq_start: int):
            if len(df) == 0:
                return {}
            df = df.copy()
            df["seq"] = np.arange(seq_start, seq_start + len(df),
                                  dtype=np.int64)
            cols = _COLS + (["priority"] if "priority" in df.columns else [])
            df = df[cols]
            b_of = (_hash64(df["domain"].tolist()) % n_buckets).astype(int)
            owners = np.asarray([owner_of[b] for b in b_of])
            futs = [workers[o].add.remote(df[owners == o])
                    for o in sorted(set(owners.tolist()))]
            ray.get(futs)
            bk, ns = np.unique(b_of, return_counts=True)
            return {int(b): int(n) for b, n in zip(bk, ns)}

        eq_counts: dict = {}
        for part in ray.get([_route_block.remote(k, int(o))
                             for k, o in zip(kept_refs, offsets)]):
            for b, n in part.items():
                eq_counts[b] = eq_counts.get(b, 0) + n
        self.total += n_kept
        return n_new, n_kept, eq_counts
