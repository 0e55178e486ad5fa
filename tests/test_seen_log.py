"""Per-shard append-only seen log: flush/restore round-trip + crawl resume.

The log replaces driver-side delta replay with a distributed exact restore
(each shard reads only its own partition) and removes the cold path's
bloom-fallback bounded-FP compromise (see ADVICE round 1, seen.py:56).
"""

import glob
import os

import pandas as pd
import pytest

from vyntr_ray.pipelines.crawl import run_crawl
from vyntr_ray.state.seen import ShardedSeenSet

from test_crawl import BUDGET, _read_schedule, _sim_result


def _urls(tag, n):
    return [f"https://{tag}.example/{i}" for i in range(n)]


class TestShardLog:
    def test_flush_restore_roundtrip(self, ray_session, tmp_path):
        log = str(tmp_path / "log")
        s1 = ShardedSeenSet(4, log_dir=log)
        for gen, tag in enumerate(["a", "b", "c"]):
            s1.check_and_add(_urls(tag, 50))
            s1.flush_log(gen)
        expect = s1.all_urls()
        assert len(expect) == 150

        s2 = ShardedSeenSet(4, log_dir=log)
        assert s2.restore_from_log(upto_gen=2) == 150
        assert s2.all_urls() == expect
        # restored membership is exact: nothing re-reports as new
        assert not s2.check_and_add(_urls("a", 50)).any()
        assert s2.check_and_add(_urls("d", 5)).all()

    def test_restore_ignores_later_generations(self, ray_session, tmp_path):
        # a flushed part whose checkpoint manifest never completed must not
        # leak into the restored state
        log = str(tmp_path / "log")
        s1 = ShardedSeenSet(4, log_dir=log)
        s1.check_and_add(_urls("a", 40))
        s1.flush_log(0)
        s1.check_and_add(_urls("b", 40))
        s1.flush_log(1)   # pretend wave 1's manifest was lost

        s2 = ShardedSeenSet(4, log_dir=log)
        assert s2.restore_from_log(upto_gen=0) == 40
        assert s2.check_and_add(_urls("b", 40)).all()   # b is new again

    def test_flush_is_o_delta_and_rerun_idempotent(self, ray_session,
                                                   tmp_path):
        log = str(tmp_path / "log")
        s1 = ShardedSeenSet(2, log_dir=log)
        s1.check_and_add(_urls("a", 30))
        assert s1.flush_log(0) == 30
        s1.check_and_add(_urls("a", 30))        # duplicates: no transition
        s1.check_and_add(_urls("b", 10))
        assert s1.flush_log(1) == 10            # only the delta
        # crash-rerun of wave 1: FRESH actors restore from gen 0, then the
        # deterministic wave re-discovers "b" and overwrites its own part
        # with identical content (no duplication)
        s1b = ShardedSeenSet(2, log_dir=log)
        assert s1b.restore_from_log(upto_gen=0) == 30
        s1b.check_and_add(_urls("b", 10))
        assert s1b.flush_log(1) == 10
        s2 = ShardedSeenSet(2, log_dir=log)
        assert s2.restore_from_log(upto_gen=1) == 40

    def test_log_requires_configuration(self, ray_session):
        import ray
        s = ShardedSeenSet(2)
        with pytest.raises(ray.exceptions.RayTaskError):
            s.flush_log(0)


class TestCrawlResumeViaLog:
    def _interrupt_budget(self, small_pages):
        sim = _sim_result(small_pages)
        cut = sum(1 for (w, _p, _u, _s) in sim.schedule if w < 2)
        assert 0 < cut < sim.scheduled
        return cut, sim

    def test_resume_restores_from_shard_log(self, ray_session,
                                            small_pages_file, small_pages,
                                            tmp_path):
        pages_path, seeds = small_pages_file
        cut, sim = self._interrupt_budget(small_pages)
        w = str(tmp_path / "run")
        run_crawl(pages_path, seeds, w, max_pages=cut, seed=42, n_shards=4)
        # the checkpointed run wrote one part per shard per wave
        parts = glob.glob(os.path.join(w, "seen_log", "shard=*",
                                       "gen=*.parquet"))
        assert len(parts) == 4 * 2          # 4 shards x 2 completed waves
        run_crawl(pages_path, seeds, w, max_pages=BUDGET, seed=42,
                  n_shards=4, resume=True)
        resumed = _read_schedule(w)
        exp = pd.DataFrame(sim.schedule,
                           columns=["wave", "position", "url", "status"])
        exp = exp.sort_values(["wave", "position"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            resumed.astype({"wave": "int64", "position": "int64"}), exp)

    def test_resume_fallback_migrates_logless_checkpoint(
            self, ray_session, small_pages_file, small_pages, tmp_path):
        # deleting seen_log simulates a checkpoint from before the log
        # existed: resume must fall back to delta replay AND flush the
        # replayed history so the log is complete again afterwards
        import shutil
        pages_path, seeds = small_pages_file
        cut, sim = self._interrupt_budget(small_pages)
        w = str(tmp_path / "run")
        run_crawl(pages_path, seeds, w, max_pages=cut, seed=42, n_shards=4)
        shutil.rmtree(os.path.join(w, "seen_log"))
        run_crawl(pages_path, seeds, w, max_pages=BUDGET, seed=42,
                  n_shards=4, resume=True)
        resumed = _read_schedule(w)
        exp = pd.DataFrame(sim.schedule,
                           columns=["wave", "position", "url", "status"])
        exp = exp.sort_values(["wave", "position"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            resumed.astype({"wave": "int64", "position": "int64"}), exp)
        # migration: the replayed history was flushed as the manifest wave
        migrated = glob.glob(os.path.join(w, "seen_log", "shard=*",
                                          "gen=000000001.parquet"))
        assert len(migrated) == 4


def test_fresh_run_clears_stale_workdir_state(ray_session, small_pages_file,
                                              small_pages, tmp_path):
    # run to full budget, then start a FRESH (resume=False) shorter run in
    # the same workdir: stale higher-wave checkpoints / schedule parts /
    # seen-log generations must be gone, and a subsequent resume must
    # reproduce the reference schedule exactly
    pages_path, seeds = small_pages_file
    sim = _sim_result(small_pages)
    w = str(tmp_path / "run")
    run_crawl(pages_path, seeds, w, max_pages=BUDGET, seed=42, n_shards=4)
    n_full_waves = len(glob.glob(os.path.join(w, "ckpt", "wave=*")))

    cut = sum(1 for (wv, _p, _u, _s) in sim.schedule if wv < 2)
    run_crawl(pages_path, seeds, w, max_pages=cut, seed=42, n_shards=4)
    assert len(glob.glob(os.path.join(w, "ckpt", "wave=*"))) == 2
    assert len(glob.glob(os.path.join(w, "schedule", "*.parquet"))) == 2
    gens = glob.glob(os.path.join(w, "seen_log", "shard=*", "gen=*.parquet"))
    assert len(gens) == 4 * 2 and n_full_waves > 2

    run_crawl(pages_path, seeds, w, max_pages=BUDGET, seed=42, n_shards=4,
              resume=True)
    resumed = _read_schedule(w)
    exp = pd.DataFrame(sim.schedule,
                       columns=["wave", "position", "url", "status"])
    exp = exp.sort_values(["wave", "position"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        resumed.astype({"wave": "int64", "position": "int64"}), exp)


class TestLogCompaction:
    def test_compact_preserves_exact_restore(self, ray_session, tmp_path):
        log = str(tmp_path / "clog")
        s1 = ShardedSeenSet(4, log_dir=log)
        for gen, tag in enumerate(["a", "b", "c", "d"]):
            s1.check_and_add(_urls(tag, 40))
            s1.flush_log(gen)
        expect = s1.all_urls()
        before = len(glob.glob(os.path.join(log, "*", "gen=*.parquet")))
        assert before == 16                       # 4 gens x 4 shards

        removed = s1.compact_log(upto_gen=3)
        after = glob.glob(os.path.join(log, "*", "gen=*.parquet"))
        assert removed == 12 and len(after) == 4  # one part per shard
        # surviving part keeps the max generation name per shard
        assert all(p.endswith("gen=000000003.parquet") for p in after)

        s2 = ShardedSeenSet(4, log_dir=log)
        assert s2.restore_from_log(upto_gen=3) == 160
        assert s2.all_urls() == expect
        assert not s2.check_and_add(_urls("c", 40)).any()

    def test_compact_respects_upto_gen(self, ray_session, tmp_path):
        log = str(tmp_path / "clog2")
        s1 = ShardedSeenSet(2, log_dir=log)
        for gen, tag in enumerate(["a", "b", "c"]):
            s1.check_and_add(_urls(tag, 30))
            s1.flush_log(gen)
        # compact only gens 0-1; gen 2 (uncommitted wave) must survive
        s1.compact_log(upto_gen=1)
        names = sorted(os.path.basename(p) for p in
                       glob.glob(os.path.join(log, "*", "gen=*.parquet")))
        assert names == ["gen=000000001.parquet"] * 2 + \
                        ["gen=000000002.parquet"] * 2
        # a restore that excludes the lost wave sees exactly gens 0-1
        s2 = ShardedSeenSet(2, log_dir=log)
        assert s2.restore_from_log(upto_gen=1) == 60

    def test_compact_crash_window_duplicates_harmless(self, ray_session,
                                                      tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        # simulate a crash after the merged replace but before deletes:
        # the merged max-gen part coexists with an already-merged part
        log = str(tmp_path / "clog3")
        s1 = ShardedSeenSet(1, log_dir=log)
        s1.check_and_add(_urls("a", 20)); s1.flush_log(0)
        s1.check_and_add(_urls("b", 20)); s1.flush_log(1)
        shard_dir = glob.glob(os.path.join(log, "*"))[0]
        all_urls = set()
        for p in glob.glob(os.path.join(shard_dir, "gen=*.parquet")):
            all_urls.update(pq.read_table(p)["url"].to_pylist())
        pq.write_table(pa.table({"url": pa.array(sorted(all_urls))}),
                       os.path.join(shard_dir, "gen=000000001.parquet"))
        # gen=0 still present -> urls duplicated across parts
        s2 = ShardedSeenSet(1, log_dir=log)
        assert s2.restore_from_log(upto_gen=1) == 40
        assert not s2.check_and_add(_urls("a", 20)).any()
        # a later compact converges to one part
        s2.compact_log(upto_gen=1)
        assert len(glob.glob(os.path.join(shard_dir,
                                          "gen=*.parquet"))) == 1

    def test_compacted_run_resumes_identically(self, ray_session,
                                               small_pages_file,
                                               small_pages, tmp_path):
        # compaction mid-run + resume after it must reproduce the exact
        # uninterrupted schedule (membership is untouched by merging)
        pages_path, seeds = small_pages_file
        sim = _sim_result(small_pages)
        cut = sum(1 for (wv, _p, _u, _s) in sim.schedule if wv < 2)
        w = str(tmp_path / "run")
        run_crawl(pages_path, seeds, w, max_pages=cut, seed=42, n_shards=4,
                  compact_seen_every=1)
        parts = glob.glob(os.path.join(w, "seen_log", "shard=*",
                                       "gen=*.parquet"))
        assert len(parts) == 4              # every wave compacted to one
        run_crawl(pages_path, seeds, w, max_pages=BUDGET, seed=42,
                  n_shards=4, resume=True)
        resumed = _read_schedule(w)
        exp = pd.DataFrame(sim.schedule,
                           columns=["wave", "position", "url", "status"])
        exp = exp.sort_values(["wave", "position"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            resumed.astype({"wave": "int64", "position": "int64"}), exp)
