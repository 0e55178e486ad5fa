"""Bloom/cuckoo filter properties + seen-shard semantics (no Ray needed)."""

import numpy as np
import pytest

from vyntr_ray.state.filters import BloomFilter, CuckooFilter
from vyntr_ray.state.seen import SeenShard, route_shards


def _urls(n, prefix="https://h.example/p/"):
    return [f"{prefix}{i}" for i in range(n)]


class TestBloom:
    def test_no_false_negatives(self):
        bf = BloomFilter(capacity=5000)
        items = _urls(3000)
        bf.add(items)
        assert bf.contains(items).all()

    def test_false_positive_rate_bounded(self):
        bf = BloomFilter(capacity=5000, fp_rate=1e-3)
        bf.add(_urls(5000))
        probes = [f"https://other.example/q/{i}" for i in range(20000)]
        fp = bf.contains(probes).mean()
        assert fp < 0.01

    def test_snapshot_roundtrip(self):
        bf = BloomFilter(capacity=100)
        bf.add(_urls(50))
        bf2 = BloomFilter.from_bytes(bf.to_bytes())
        assert bf2.contains(_urls(50)).all()
        assert bf2.n_bits == bf.n_bits and bf2.k == bf.k


class TestCuckoo:
    def test_no_false_negatives(self):
        cf = CuckooFilter(capacity=10000)
        items = _urls(6000)
        assert cf.add(items) == 6000
        assert cf.contains(items).all()

    def test_false_positive_rate_bounded(self):
        cf = CuckooFilter(capacity=20000)
        cf.add(_urls(10000))
        probes = [f"https://other.example/q/{i}" for i in range(20000)]
        assert cf.contains(probes).mean() < 0.005  # 16-bit fp, 2 buckets

    def test_snapshot_roundtrip(self):
        cf = CuckooFilter(capacity=1000)
        cf.add(_urls(400))
        cf2 = CuckooFilter.from_bytes(cf.to_bytes())
        assert cf2.contains(_urls(400)).all()
        assert cf2.count == cf.count


class TestSeenShard:
    def test_exactness_vs_oracle(self):
        shard = SeenShard(0, capacity=1 << 12)
        oracle = set()
        rng = np.random.default_rng(7)
        for _ in range(30):
            batch = [f"https://h.example/p/{int(i)}"
                     for i in rng.integers(0, 500, size=50)]
            expected = []
            for u in batch:
                expected.append(u not in oracle)
                oracle.add(u)
            got = shard.check_and_add(batch)
            assert got.tolist() == expected
        assert shard.exact == oracle

    def test_within_batch_duplicate(self):
        shard = SeenShard(0)
        got = shard.check_and_add(["a", "b", "a"])
        assert got.tolist() == [True, True, False]

    def test_snapshot_restore(self):
        shard = SeenShard(3)
        shard.check_and_add(_urls(100))
        snap = shard.snapshot()
        fresh = SeenShard(0)
        assert fresh.restore(snap) == 100
        assert not fresh.check_and_add(_urls(100)).any()
        assert fresh.shard_id == 3


class TestSeenProbe:
    def test_probe_agrees_with_check_and_add_and_is_readonly(self):
        """probe must equal 'check_and_add would say not-new' — with NO
        false drops of new urls (warm cuckoo FPs must NOT read as seen)
        and no mutation."""
        shard = SeenShard(0, capacity=1 << 12)
        urls = _urls(500)
        shard.check_and_add(urls)
        n_before = len(shard.exact)
        # all crawled urls are definitely-seen
        assert shard.probe(urls).all()
        # fresh urls never read seen on a warm shard, even if the cuckoo
        # happens to false-positive (probe consults the exact tier only)
        fresh = [f"http://probe{i}.example/x" for i in range(2000)]
        assert not shard.probe(fresh).any()
        assert len(shard.exact) == n_before          # read-only
        assert shard.check_and_add(fresh).all()      # still all-new after

    def test_probe_cold_mirrors_check_and_add(self):
        from vyntr_ray.state.filters import BloomFilter
        warm = SeenShard(0, capacity=1 << 12)
        urls = _urls(500)
        warm.check_and_add(urls)
        bloom = BloomFilter(capacity=1000)
        bloom.add(urls)
        cold = SeenShard(0, capacity=1 << 12)
        cold.restore_cold(warm.cuckoo.to_bytes(), bloom.to_bytes())
        # cold rule: filter-positive => seen (exactly-once enqueue)
        assert cold.probe(urls).all()
        fresh = [f"http://coldprobe{i}.example/x" for i in range(500)]
        probe_seen = cold.probe(fresh)
        added_new = cold.check_and_add(fresh)
        # the probe's verdict must match what check_and_add then decides
        assert (~probe_seen == added_new).all()


class TestColdRestore:
    def test_filters_only_restore_no_false_negatives(self):
        # scale path: a shard restored from cuckoo blob + bloom fallback
        # answers membership with no false negatives while the exact tier
        # streams in (SeenShard.restore_cold)
        from vyntr_ray.state.filters import BloomFilter
        warm = SeenShard(0, capacity=1 << 12)
        urls = _urls(500)
        warm.check_and_add(urls)
        bloom = BloomFilter(capacity=1000)
        bloom.add(urls)
        cold = SeenShard(0, capacity=1 << 12)
        cold.restore_cold(warm.cuckoo.to_bytes(), bloom.to_bytes())
        # exactly-once enqueue: every previously-seen url must be reported
        # SEEN (filter-positive is trusted while the exact tier is absent —
        # re-reporting history as new would re-enqueue the whole crawl)
        assert not cold.check_and_add(urls).any()
        # genuinely-new urls still come back new, modulo the filters'
        # bounded FP rate (<2% here)
        fresh = [f"http://cold{i}.example/x" for i in range(500)]
        got = cold.check_and_add(fresh)
        assert got.sum() >= 490


def test_route_shards_stable():
    urls = _urls(100)
    a = route_shards(urls, 8)
    b = route_shards(urls, 8)
    assert (a == b).all()
    assert set(np.unique(a)) <= set(range(8))


@pytest.mark.usefixtures("ray_session")
def test_sharded_seen_set_parity():
    from vyntr_ray.state.seen import ShardedSeenSet
    sset = ShardedSeenSet(n_shards=4)
    oracle = set()
    rng = np.random.default_rng(11)
    for _ in range(10):
        batch = list(dict.fromkeys(          # wave-deduped, like the pipeline
            f"https://h{int(i) % 7}.example/p/{int(i)}"
            for i in rng.integers(0, 300, size=80)))
        got = sset.check_and_add(batch)
        expected = []
        for u in batch:
            expected.append(u not in oracle)
            oracle.add(u)
        assert got.tolist() == expected
    assert sset.all_urls() == oracle
