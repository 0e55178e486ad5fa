"""Sharded URL-seen set: exact tier + cuckoo filter per shard, actor pool.

Rebuild of the reference's global visited ``HashSet`` behind one mutex
(`genesis/src/main.rs:159,216-225,272-279`) as a pool of shard actors keyed
by a stable url hash — the shared-mutable-state case where raw Ray actors are
the right tool (SURVEY.md §2.3 T1).

Each shard holds
- the **exact tier** (authoritative set — in-memory here; at 10^10-URL scale
  this tier is an append-only per-shard Parquet log consulted only when the
  cuckoo filter reports *maybe seen*), and
- a **cuckoo filter** (fast membership, snapshottable to bytes); a Bloom
  filter stands in while a restored shard is still loading its exact tier
  ("bloom fallback for cold shards").

``check_and_add`` is atomic per shard (actor = serialized mailbox), which
preserves the reference's exactly-once-enqueue discipline (SURVEY §7.4.3).
Routing is ``md5-hash(url) % n_shards`` — stable across waves, restarts and
cluster sizes as long as ``n_shards`` is kept in the checkpoint manifest.
"""

from __future__ import annotations

import numpy as np

from .filters import BloomFilter, CuckooFilter, _hash64

__all__ = ["SeenShard", "ShardedSeenSet", "route_shards"]


def route_shards(urls: list[str], n_shards: int) -> np.ndarray:
    return (_hash64(urls) % np.uint64(n_shards)).astype(np.int64)


class SeenShard:
    """One shard. Wrap with ``ray.remote`` for the actor pool."""

    def __init__(self, shard_id: int, capacity: int = 1 << 16):
        self.shard_id = shard_id
        self.exact: set[str] = set()
        self.cuckoo = CuckooFilter(capacity)
        self.bloom_fallback: BloomFilter | None = None  # cold-start answers

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
        return new

    def contains(self, urls: list[str]) -> np.ndarray:
        return np.fromiter((u in self.exact for u in urls), bool, len(urls))

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


class ShardedSeenSet:
    """Driver-side handle over the shard actor pool."""

    def __init__(self, n_shards: int = 8, capacity_per_shard: int = 1 << 16):
        import ray
        self.n_shards = n_shards
        actor_cls = ray.remote(num_cpus=0.05)(SeenShard)
        self.shards = [actor_cls.remote(i, capacity_per_shard)
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
