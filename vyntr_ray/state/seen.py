"""Sharded URL-seen set: exact tier + cuckoo filter per shard, actor pool.

Rebuild of the reference's global visited ``HashSet`` behind one mutex
(`genesis/src/main.rs:159,216-225,272-279`) as a pool of shard actors keyed
by a stable url hash — the shared-mutable-state case where raw Ray actors are
the right tool (SURVEY.md §2.3 T1).

Each shard holds
- the **exact tier** (authoritative set — in-memory, durably mirrored by an
  **append-only per-shard Parquet log**: ``flush_log`` writes each wave's
  delta as one part in the shard's own partition, ``restore_from_log``
  rebuilds the tier from only that partition, so restore is distributed —
  O(history / n_shards) per shard, nothing through the driver — and EXACT),
  and
- a **cuckoo filter** (fast membership, snapshottable to bytes); a Bloom
  filter stands in while a restored shard is still loading its exact tier
  ("bloom fallback for cold shards").

``check_and_add`` is atomic per shard (actor = serialized mailbox), which
preserves the reference's exactly-once-enqueue discipline (SURVEY §7.4.3).
Routing is ``md5-hash(url) % n_shards`` — stable across waves, restarts and
cluster sizes as long as ``n_shards`` is kept in the checkpoint manifest.
"""

from __future__ import annotations

import os

import numpy as np

from .filters import BloomFilter, CuckooFilter, _hash64

__all__ = ["SeenShard", "ShardedSeenSet", "route_shards"]


def route_shards(urls: list[str], n_shards: int) -> np.ndarray:
    return (_hash64(urls) % np.uint64(n_shards)).astype(np.int64)


class SeenShard:
    """One shard. Wrap with ``ray.remote`` for the actor pool."""

    def __init__(self, shard_id: int, capacity: int = 1 << 16,
                 log_dir: str | None = None):
        self.shard_id = shard_id
        self.exact: set[str] = set()
        self.cuckoo = CuckooFilter(capacity)
        self.bloom_fallback: BloomFilter | None = None  # cold-start answers
        # append-only parquet log: this shard's own partition of the seen
        # set, written as one part per flush generation (= wave)
        self.log_dir = (os.path.join(log_dir, f"shard={shard_id:03d}")
                        if log_dir else None)
        self._pending_log: list[str] = []

    def check_and_add(self, urls: list[str]) -> np.ndarray:
        """Atomically test-and-insert a batch; True where the url was NEW.

        Warm shard: cuckoo-negative ⇒ definitely new; cuckoo-positive ⇒
        confirm against the exact tier (FP safety).  Cold shard (filters
        restored, exact tier not yet streamed in): a filter-positive is
        treated as SEEN — the exact tier can't confirm, and re-reporting
        history as new would re-enqueue the whole crawl, so we accept the
        filters' bounded false-positive rate (a few urls skipped) instead
        of unbounded duplicates (exactly-once-enqueue discipline,
        SURVEY §7.4.3).
        """
        h = _hash64(urls)
        maybe = self.cuckoo.contains_hashes(h)
        cold = self.bloom_fallback is not None
        if cold:
            maybe = maybe | self.bloom_fallback.contains_hashes(h)
        new = np.zeros(len(urls), dtype=bool)
        for i, url in enumerate(urls):
            if url in self.exact:   # seen (or within-batch duplicate)
                continue
            if maybe[i] and cold:   # maybe-seen, no exact tier to confirm
                continue
            self.exact.add(url)     # warm filter-positive miss = cuckoo FP
            new[i] = True
        if new.any():
            self.cuckoo.add_hashes(h[new])
            # auto-grow: past ~85% load a 4-slot cuckoo insert degrades
            # into the 500-kick eviction loop (and finally FAILS, leaving
            # the url filter-absent for cold restores).  The exact tier
            # holds every url this shard has seen, so rebuild at 2×
            # — amortized-doubling O(n), exactly the restore-path rebuild.
            # Measured: without this, a 4M-page crawl spent 600-800 s per
            # wave inside saturated-filter kick loops (PERF.md).
            cap = self.cuckoo.n_buckets * self.cuckoo.SLOTS
            if self.cuckoo.count >= int(0.85 * cap):
                self.cuckoo = CuckooFilter(max(1 << 16, 2 * len(self.exact)))
                self.cuckoo.add_hashes(_hash64(sorted(self.exact)))
            if self.log_dir is not None:
                self._pending_log.extend(
                    urls[i] for i in np.nonzero(new)[0])
        return new

    def contains(self, urls: list[str]) -> np.ndarray:
        return np.fromiter((u in self.exact for u in urls), bool, len(urls))

    def probe(self, urls: list[str]) -> np.ndarray:
        """READ-ONLY definitely-seen test (True ⇒ ``check_and_add`` would
        report not-new).  Warm shard: exact-tier membership (cuckoo FPs
        are NOT reported seen, so a new url is never falsely dropped).
        Cold shard: filter-positive ⇒ seen, mirroring ``check_and_add``'s
        cold rule exactly.  Used by the link pre-filter to shrink the
        wave's dedup shuffle without touching state — deterministic
        because the groupby barrier downstream guarantees every probe
        sees only pre-wave state."""
        seen = np.fromiter((u in self.exact for u in urls), bool, len(urls))
        if self.bloom_fallback is not None:   # cold: no exact tier yet
            h = _hash64(urls)
            maybe = self.cuckoo.contains_hashes(h) \
                | self.bloom_fallback.contains_hashes(h)
            seen = seen | maybe
        return seen

    def add(self, urls: list[str]) -> int:
        return int(self.check_and_add(urls).sum())

    def stats(self) -> dict:
        return {"shard": self.shard_id, "n": len(self.exact),
                "cuckoo_count": self.cuckoo.count,
                "cuckoo_buckets": self.cuckoo.n_buckets}

    def filter_blob(self) -> bytes:
        """Compact cuckoo snapshot (checkpoint artifact; O(filter), not O(urls))."""
        return self.cuckoo.to_bytes()

    # --- checkpoint ------------------------------------------------------
    def snapshot(self) -> dict:
        return {"shard": self.shard_id,
                "cuckoo": self.cuckoo.to_bytes(),
                "urls": sorted(self.exact)}

    def restore(self, snap: dict) -> int:
        self.shard_id = snap["shard"]
        self.cuckoo = CuckooFilter.from_bytes(snap["cuckoo"])
        self.exact = set(snap["urls"])
        self.bloom_fallback = None
        return len(self.exact)

    def restore_cold(self, cuckoo_blob: bytes, bloom_blob: bytes) -> None:
        """Scale path: restore filters only; exact tier streams in later."""
        self.cuckoo = CuckooFilter.from_bytes(cuckoo_blob)
        self.bloom_fallback = BloomFilter.from_bytes(bloom_blob)

    # --- append-only parquet log ----------------------------------------
    def flush_log(self, gen: int) -> int:
        """Write the urls first seen since the last flush as ONE parquet part.

        O(delta) per flush, not O(history).  Parts are named by generation
        (= wave number): waves are deterministic under the sim-parity
        contract, so a crash-rerun of the same wave overwrites its own
        part with identical content instead of duplicating it; tmp+rename
        keeps a concurrent restore from seeing a half-written file.
        """
        import pyarrow as pa
        import pyarrow.parquet as pq
        if self.log_dir is None:
            raise RuntimeError("seen log not configured (log_dir=None)")
        os.makedirs(self.log_dir, exist_ok=True)
        n = len(self._pending_log)
        path = os.path.join(self.log_dir, f"gen={gen:09d}.parquet")
        tmp = f"{path}.tmp-{os.getpid()}"
        pq.write_table(
            pa.table({"url": pa.array(self._pending_log, pa.string())}), tmp)
        os.replace(tmp, path)
        self._pending_log = []
        return n

    def compact_log(self, upto_gen: int) -> int:
        """Merge every log part with gen <= ``upto_gen`` into ONE part —
        bounds restore cost after long runs (a 10^10-URL crawl flushes
        one part per wave per shard; restore stays O(history/n_shards)
        in bytes but the per-FILE open cost grows without bound).

        The merged part keeps the LARGEST merged generation as its
        name, so ``restore_from_log``'s gen <= upto_gen filter is
        unchanged by compaction.  Crash-safe in both windows: the merge
        writes tmp + atomic-replace onto the max-gen part first (a
        crash before the replace leaves the old parts intact; after it,
        the merged part is complete), THEN deletes the subsumed parts
        (a crash mid-delete leaves duplicate urls across parts —
        harmless, restore unions into a set).  Returns the number of
        parts removed.
        """
        import pyarrow as pa
        import pyarrow.parquet as pq
        if self.log_dir is None:
            raise RuntimeError("seen log not configured (log_dir=None)")
        if not os.path.isdir(self.log_dir):
            return 0
        parts = sorted(
            name for name in os.listdir(self.log_dir)
            if name.startswith("gen=") and name.endswith(".parquet")
            and int(name[4:-8]) <= upto_gen)
        if len(parts) < 2:
            return 0
        urls: set[str] = set()
        for name in parts:
            urls.update(pq.read_table(
                os.path.join(self.log_dir, name))["url"].to_pylist())
        target = os.path.join(self.log_dir, parts[-1])
        tmp = f"{target}.tmp-{os.getpid()}"
        pq.write_table(
            pa.table({"url": pa.array(sorted(urls), pa.string())}), tmp)
        os.replace(tmp, target)
        for name in parts[:-1]:
            os.remove(os.path.join(self.log_dir, name))
        return len(parts) - 1

    def restore_from_log(self, upto_gen: int,
                         cuckoo_blob: bytes | None = None) -> int:
        """Rebuild the exact tier from this shard's own log partition.

        The distributed replacement for driver-side delta replay: each
        shard reads only its own files (O(history / n_shards) per shard,
        in parallel, nothing passes through the driver), and membership is
        EXACT afterwards — no ``bloom_fallback`` bounded-FP compromise.
        Parts with gen > ``upto_gen`` (flushed by a wave whose checkpoint
        manifest never completed) are ignored, keeping the restored state
        consistent with the manifest's filter blobs.
        """
        import pyarrow.parquet as pq
        if self.log_dir is None:
            raise RuntimeError("seen log not configured (log_dir=None)")
        self.exact = set()
        if os.path.isdir(self.log_dir):
            for name in sorted(os.listdir(self.log_dir)):
                if not (name.startswith("gen=")
                        and name.endswith(".parquet")):
                    continue
                if int(name[4:-8]) > upto_gen:
                    continue
                self.exact.update(pq.read_table(
                    os.path.join(self.log_dir, name))["url"].to_pylist())
        if cuckoo_blob is not None:
            self.cuckoo = CuckooFilter.from_bytes(cuckoo_blob)
        else:
            self.cuckoo = CuckooFilter(max(1 << 16, 2 * len(self.exact)))
            if self.exact:
                self.cuckoo.add_hashes(_hash64(sorted(self.exact)))
        self.bloom_fallback = None
        self._pending_log = []
        return len(self.exact)


class ShardedSeenSet:
    """Driver-side handle over the shard actor pool."""

    def __init__(self, n_shards: int = 8, capacity_per_shard: int = 1 << 16,
                 log_dir: str | None = None):
        import ray
        self.n_shards = n_shards
        self.log_dir = log_dir
        actor_cls = ray.remote(num_cpus=0.05)(SeenShard)
        self.shards = [actor_cls.remote(i, capacity_per_shard, log_dir)
                       for i in range(n_shards)]

    def check_and_add(self, urls: list[str]) -> np.ndarray:
        """Route a batch to shards; returns was-new flags aligned to input."""
        import ray
        if not urls:
            return np.zeros(0, dtype=bool)
        shard_of = route_shards(urls, self.n_shards)
        out = np.zeros(len(urls), dtype=bool)
        futs, idxs = [], []
        for s in range(self.n_shards):
            idx = np.nonzero(shard_of == s)[0]
            if len(idx):
                futs.append(self.shards[s].check_and_add.remote(
                    [urls[i] for i in idx]))
                idxs.append(idx)
        for idx, res in zip(idxs, ray.get(futs)):
            out[idx] = res
        return out

    def add(self, urls: list[str]) -> None:
        self.check_and_add(urls)

    def all_urls(self) -> set[str]:
        """Test/oracle helper — materializes every shard's exact tier."""
        import ray
        snaps = ray.get([s.snapshot.remote() for s in self.shards])
        out: set[str] = set()
        for snap in snaps:
            out.update(snap["urls"])
        return out

    def snapshot(self) -> list[dict]:
        import ray
        return ray.get([s.snapshot.remote() for s in self.shards])

    def restore(self, snaps: list[dict]) -> None:
        import ray
        assert len(snaps) == self.n_shards, "shard count must match manifest"
        ray.get([self.shards[snap["shard"]].restore.remote(snap)
                 for snap in snaps])

    def stats(self) -> list[dict]:
        import ray
        return ray.get([s.stats.remote() for s in self.shards])

    def filter_blobs(self) -> list[bytes]:
        import ray
        return ray.get([s.filter_blob.remote() for s in self.shards])

    # --- append-only parquet log (fan-out) -------------------------------
    def flush_log(self, gen: int) -> int:
        import ray
        return sum(ray.get([s.flush_log.remote(gen) for s in self.shards]))

    def compact_log(self, upto_gen: int) -> int:
        """Each shard compacts its own log partition in parallel."""
        import ray
        return sum(ray.get([s.compact_log.remote(upto_gen)
                            for s in self.shards]))

    def restore_from_log(self, upto_gen: int,
                         cuckoo_blobs: list[bytes] | None = None) -> int:
        """Each shard restores its own partition in parallel."""
        import ray
        blobs = cuckoo_blobs or [None] * self.n_shards
        return sum(ray.get([s.restore_from_log.remote(upto_gen, b)
                            for s, b in zip(self.shards, blobs)]))
