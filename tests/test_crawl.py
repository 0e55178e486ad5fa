"""End-to-end crawl parity: Ray pipeline vs the reference-semantics simulator.

SURVEY.md §5.3-5.4: (a) final URL-seen set matches exactly, (b) wave-by-wave
dispatch order matches under the seeded-shuffle contract, (c) analyses match
row-for-row (byte-identical extracted text), (d) kill-and-resume reproduces
the identical remainder, (e) politeness/no-refetch invariants hold.
"""

import glob
import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

from vyntr_ray.pipelines.crawl import run_crawl
from vyntr_ray.sim import CrawlConfig, simulate_crawl

BUDGET = 300


def _sim_result(small_pages, robots=None):
    tab, seeds = small_pages
    pages = dict(zip(tab["url"].to_pylist(), tab["html"].to_pylist()))
    return simulate_crawl(pages, seeds,
                          CrawlConfig(max_pages=BUDGET, seed=42, robots=robots))


def _read_schedule(workdir, lineage=False):
    files = sorted(glob.glob(os.path.join(workdir, "schedule", "*.parquet")))
    df = pd.concat([pq.read_table(f).to_pandas() for f in files],
                   ignore_index=True)
    if not lineage:  # sim parity compares the reference-visible columns
        df = df[["wave", "position", "url", "status"]]
    return df.sort_values(["wave", "position"]).reset_index(drop=True)


def _read_analyses(workdir):
    df = pq.read_table(os.path.join(workdir, "analyses")).to_pandas()
    return df.sort_values(["wave", "pos"]).reset_index(drop=True)


@pytest.fixture(scope="module")
def crawl_run(ray_session, small_pages_file, tmp_path_factory):
    pages_path, seeds = small_pages_file
    workdir = str(tmp_path_factory.mktemp("crawl"))
    stats = run_crawl(pages_path, seeds, workdir, max_pages=BUDGET,
                      seed=42, n_shards=4)
    return workdir, stats


class TestCrawlParity:
    def test_seen_set_matches_oracle(self, crawl_run, small_pages):
        from vyntr_ray.pipelines.crawl import read_seen_from_checkpoints
        workdir, stats = crawl_run
        sim = _sim_result(small_pages)
        # reconstruct the pipeline's seen set from the checkpoint delta log
        urls = set(read_seen_from_checkpoints(
            os.path.join(workdir, "ckpt"), 10**9))
        assert urls == sim.seen
        assert stats.seen_total == len(sim.seen)

    def test_schedule_order_matches_oracle(self, crawl_run, small_pages):
        workdir, _ = crawl_run
        sim = _sim_result(small_pages)
        got = _read_schedule(workdir)
        exp = pd.DataFrame(sim.schedule,
                           columns=["wave", "position", "url", "status"])
        exp = exp.sort_values(["wave", "position"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got.astype({"wave": "int64", "position": "int64"}), exp)

    def test_metrics_match_oracle(self, crawl_run, small_pages):
        _, stats = crawl_run
        sim = _sim_result(small_pages)
        assert stats.scheduled == sim.scheduled
        assert stats.fetched == sim.fetched
        assert stats.failed == sim.failed
        assert stats.discovered == sim.discovered
        assert stats.waves == sim.waves

    def test_analyses_match_row_for_row(self, crawl_run, small_pages):
        workdir, _ = crawl_run
        sim = _sim_result(small_pages)
        got = _read_analyses(workdir)
        assert len(got) == len(sim.analyses)
        for i, exp in enumerate(sim.analyses):
            row = got.iloc[i]
            assert row["url"] == exp["url"]
            assert row["content_text"] == exp["content_text"]  # byte-identical
            assert row["title"] == exp["title"]
            assert row["language"] == exp["language"]
            assert (row["canonical_url"] or None) == exp["canonical_url"]
            assert row["partition"] == exp["partition"]
            got_meta = [{"name": m["name"], "content": m["content"]}
                        for m in row["meta_tags"]]
            assert got_meta == exp["meta_tags"]

    def test_extraction_invariant_vs_text_column(self, crawl_run, small_pages):
        # analyses.content_text must equal the page table's `text` column
        # (sanitizer is a no-op on the synthetic corpus) — the per-row
        # byte-identical invariant of BASELINE.json input_hint.
        workdir, _ = crawl_run
        tab, _seeds = small_pages
        text_of = dict(zip(tab["url"].to_pylist(), tab["text"].to_pylist()))
        got = _read_analyses(workdir)
        assert len(got) > 50
        for _, row in got.iterrows():
            assert row["content_text"] == text_of[row["url"]]

    def test_politeness_invariant(self, crawl_run):
        # ≤5 urls per domain per wave among scheduled entries
        workdir, _ = crawl_run
        sched = _read_schedule(workdir)
        sched["domain"] = sched["url"].str.extract(r"://([^/]+)/")[0]
        per = sched.groupby(["wave", "domain"]).size()
        assert (per <= 5).all()

    def test_checkpoint_lineage_metrics_reconcile(self, crawl_run):
        # Every wave checkpoint carries METRICS.parquet — per-frontier-
        # partition lineage (scheduled/fetched/failed/cut/enqueued/backlog).
        # The invariant _bucket_metrics promises: bucket totals reconcile
        # EXACTLY with the manifest's per_wave entry, per-bucket counts
        # reconcile with the schedule log's bucket column, and the flow
        # equation frontier_after[b,w] = frontier_after[b,w-1]
        # - scheduled[b,w] + enqueued[b,w] holds for every partition.
        import json
        workdir, stats = crawl_run
        sched = _read_schedule(workdir, lineage=True)
        wave_dirs = sorted(glob.glob(os.path.join(workdir, "ckpt", "wave=*")))
        assert len(wave_dirs) == stats.waves
        prev_after = {}
        for wdir in wave_dirs:
            with open(os.path.join(wdir, "MANIFEST.json")) as f:
                manifest = json.load(f)
            wave = manifest["wave"]
            pw = manifest["per_wave"][-1]
            assert pw["wave"] == wave
            m = pq.read_table(
                os.path.join(wdir, "METRICS.parquet")).to_pandas()
            assert m["bucket"].is_unique
            # wave totals reconcile with the manifest entry
            assert int(m["scheduled"].sum()) == pw["scheduled"]
            assert int(m["fetched"].sum()) == pw["fetched"]
            assert int(m["failed"].sum()) == pw["failed"]
            assert int(m["frontier_after"].sum()) == pw["frontier_after"]
            # per-bucket status split is internally consistent
            assert (m["scheduled"]
                    == m["fetched"] + m["failed"] + m["cut"]).all()
            # per-bucket counts reconcile with the schedule log's lineage
            ws = sched[sched["wave"] == wave]
            by_bucket = ws.groupby("bucket")["status"].value_counts()
            for _, row in m.iterrows():
                b = row["bucket"]
                assert row["fetched"] == by_bucket.get((b, "fetched"), 0)
                assert row["failed"] == by_bucket.get((b, "miss"), 0)
                assert row["cut"] == by_bucket.get((b, "cut"), 0)
            # flow conservation per partition (wave 0 starts from seeds,
            # whose bucket split isn't recorded — check waves >= 1)
            after = dict(zip(m["bucket"], m["frontier_after"]))
            if wave >= 1:
                touched = (set(after) | set(prev_after)
                           | set(m["bucket"]))
                mb = m.set_index("bucket")
                for b in touched:
                    schd = int(mb["scheduled"].get(b, 0))
                    enq = int(mb["enqueued"].get(b, 0))
                    assert after.get(b, 0) == \
                        prev_after.get(b, 0) - schd + enq, \
                        f"wave {wave} bucket {b} flow mismatch"
            prev_after = after
        # the final wave's seen-shard metrics reconcile with stats
        last = wave_dirs[-1]
        filt = pq.read_table(os.path.join(last, "filters.parquet")).to_pandas()
        assert int(filt["n_urls"].sum()) == stats.seen_total
        assert (filt["cuckoo_count"] >= 0).all()

    def test_no_url_fetched_twice(self, crawl_run, small_pages):
        # Reference nuance (genesis/src/main.rs:216-225): seeds enter the
        # visited set RAW, so a seed whose raw form differs from its
        # normalized form can legitimately be re-crawled when rediscovered
        # as a normalized link. Every other url is fetched at most once.
        from vyntr_ray.urls import normalize_url
        workdir, _ = crawl_run
        _, seeds = small_pages
        renormalized_seeds = {normalize_url(s) for s in seeds
                              if normalize_url(s) != s}
        sched = _read_schedule(workdir)
        fetched = sched[sched["status"] == "fetched"]["url"]
        dupes = set(fetched[fetched.duplicated()])
        assert dupes <= renormalized_seeds
        assert fetched[~fetched.isin(renormalized_seeds)].is_unique


def test_resume_reproduces_identical_remainder(ray_session, small_pages_file,
                                               small_pages, tmp_path):
    pages_path, seeds = small_pages_file
    sim = _sim_result(small_pages)
    # interrupt exactly at a wave boundary (no budget truncation mid-wave):
    # budget = cumulative scheduled after the first two waves
    cut_budget = sim.schedule and sum(
        1 for (w, _p, _u, _s) in sim.schedule if w < 2)
    assert 0 < cut_budget < sim.scheduled
    w1 = str(tmp_path / "interrupted")
    run_crawl(pages_path, seeds, w1, max_pages=cut_budget, seed=42, n_shards=4)
    # raise the budget and resume from the checkpoint
    run_crawl(pages_path, seeds, w1, max_pages=BUDGET, seed=42, n_shards=4,
              resume=True)
    resumed = _read_schedule(w1)
    exp = pd.DataFrame(sim.schedule,
                       columns=["wave", "position", "url", "status"])
    exp = exp.sort_values(["wave", "position"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        resumed.astype({"wave": "int64", "position": "int64"}), exp)


def test_distributed_links_path_parity(ray_session, small_pages_file,
                                       small_pages, tmp_path):
    # the big-wave groupby+actor-filter dedup path must agree with the
    # driver-combine path (and hence with the oracle)
    pages_path, seeds = small_pages_file
    w = str(tmp_path / "dist")
    run_crawl(pages_path, seeds, w, max_pages=BUDGET, seed=42, n_shards=4,
              checkpoint=False, distributed_links_threshold=0)
    sim = _sim_result(small_pages)
    got = _read_schedule(w)
    exp = pd.DataFrame(sim.schedule,
                       columns=["wave", "position", "url", "status"])
    exp = exp.sort_values(["wave", "position"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"wave": "int64", "position": "int64"}), exp)


def test_priority_frontier_parity_and_effect(ray_session, small_pages_file,
                                             small_pages, tmp_path):
    # priority mode: highest-priority urls selected first per host; Ray
    # pipeline and oracle agree; ordering differs from FIFO mode
    def prio(url: str) -> float:
        return float(int(url.rsplit("/", 1)[-1]) % 97)  # deterministic

    pages_path, seeds = small_pages_file
    tab, _ = small_pages
    w = str(tmp_path / "prio")
    run_crawl(pages_path, seeds, w, max_pages=BUDGET, seed=42, n_shards=4,
              checkpoint=False, priority_fn=prio)
    pages = dict(zip(tab["url"].to_pylist(), tab["html"].to_pylist()))
    sim = simulate_crawl(pages, seeds,
                         CrawlConfig(max_pages=BUDGET, seed=42,
                                     priority_fn=prio))
    got = _read_schedule(w)
    exp = pd.DataFrame(sim.schedule,
                       columns=["wave", "position", "url", "status"])
    exp = exp.sort_values(["wave", "position"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"wave": "int64", "position": "int64"}), exp)
    # and the ordering genuinely differs from the FIFO run
    fifo = _sim_result(small_pages)
    fifo_urls = [u for (_w, _p, u, _s) in fifo.schedule]
    prio_urls = [u for (_w, _p, u, _s) in sim.schedule]
    assert fifo_urls != prio_urls


def test_distributed_select_crawl_parity(ray_session, small_pages_file,
                                         small_pages, tmp_path):
    # per-bucket Ray-task politeness selection must match the oracle
    pages_path, seeds = small_pages_file
    w = str(tmp_path / "distsel")
    run_crawl(pages_path, seeds, w, max_pages=BUDGET, seed=42, n_shards=4,
              checkpoint=False, distributed_select=True)
    sim = _sim_result(small_pages)
    got = _read_schedule(w)
    exp = pd.DataFrame(sim.schedule,
                       columns=["wave", "position", "url", "status"])
    exp = exp.sort_values(["wave", "position"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"wave": "int64", "position": "int64"}), exp)


def test_distributed_select_stateful_tokens_parity(ray_session,
                                                   small_pages_file,
                                                   tmp_path):
    # token balances ride with the bucket tasks: a throttled (refill <
    # capacity) crawl must be identical run distributed vs driver-side
    pages_path, seeds = small_pages_file
    w1 = str(tmp_path / "tok_driver")
    w2 = str(tmp_path / "tok_dist")
    s1 = run_crawl(pages_path, seeds, w1, max_pages=BUDGET, seed=42,
                   n_shards=4, checkpoint=False, refill=2.0)
    s2 = run_crawl(pages_path, seeds, w2, max_pages=BUDGET, seed=42,
                   n_shards=4, checkpoint=False, refill=2.0,
                   distributed_select=True)
    pd.testing.assert_frame_equal(_read_schedule(w1), _read_schedule(w2))
    assert (s1.scheduled, s1.fetched, s1.waves) == \
        (s2.scheduled, s2.fetched, s2.waves)
    # throttling actually engaged: more waves than the memoryless run
    w3 = str(tmp_path / "memless")
    s3 = run_crawl(pages_path, seeds, w3, max_pages=BUDGET, seed=42,
                   n_shards=4, checkpoint=False)
    assert s1.waves > s3.waves


def test_retry_ladder_unit():
    from vyntr_ray.functions.fetch import HashFlaky, RetryLadder

    # no fail_fn: first tunnel attempt succeeds
    assert RetryLadder().outcome("http://a.ex/") == (True, 1, "tunnel")
    # tunnel always fails, first proxy succeeds
    lad = RetryLadder(fail_fn=lambda u, ch, a: ch == "tunnel")
    assert lad.outcome("http://a.ex/") == (True, 3, "proxy-0")
    # everything fails: 2 tunnel + 3 proxies = 5 attempts, exhausted
    lad = RetryLadder(fail_fn=lambda u, ch, a: True)
    assert lad.outcome("http://a.ex/") == (False, 5, "exhausted")
    # HashFlaky is deterministic and actually exercises the rungs
    flaky = HashFlaky(tunnel_rate=0.9, proxy_rate=0.3)
    lad = RetryLadder(fail_fn=flaky)
    outs = [lad.outcome(f"http://h{i}.ex/p") for i in range(200)]
    assert outs == [lad.outcome(f"http://h{i}.ex/p") for i in range(200)]
    vias = {v for _, _, v in outs}
    assert "tunnel" in vias and any(v.startswith("proxy") for v in vias)
    assert any(not ok for ok, _, _ in outs)   # some urls exhaust the ladder


def test_flaky_fetch_crawl_parity(ray_session, small_pages_file,
                                  small_pages, tmp_path):
    # transport failures injected through the retry ladder must produce the
    # identical schedule (miss rows included) and retry count on both sides
    from vyntr_ray.functions.fetch import HashFlaky, RetryLadder

    ladder = RetryLadder(fail_fn=HashFlaky(tunnel_rate=0.7, proxy_rate=0.5))
    pages_path, seeds = small_pages_file
    w = str(tmp_path / "flaky")
    stats = run_crawl(pages_path, seeds, w, max_pages=BUDGET, seed=42,
                      n_shards=4, checkpoint=False, fetch_ladder=ladder)
    tab, _ = small_pages
    pages = dict(zip(tab["url"].to_pylist(), tab["html"].to_pylist()))
    sim = simulate_crawl(pages, seeds,
                         CrawlConfig(max_pages=BUDGET, seed=42,
                                     fetch_ladder=ladder))
    got = _read_schedule(w)
    exp = pd.DataFrame(sim.schedule,
                       columns=["wave", "position", "url", "status"])
    exp = exp.sort_values(["wave", "position"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"wave": "int64", "position": "int64"}), exp)
    assert stats.retried == sim.retried > 0
    assert stats.fetched == sim.fetched
    # the ladder really dropped some store-present pages
    assert stats.failed > 0


def test_frontier_spill_crawl_parity(ray_session, small_pages_file,
                                     small_pages, tmp_path):
    # forced frontier spilling must not change crawl order
    pages_path, seeds = small_pages_file
    w = str(tmp_path / "spillrun")
    run_crawl(pages_path, seeds, w, max_pages=BUDGET, seed=42, n_shards=4,
              checkpoint=False, frontier_buckets=3, frontier_mem_rows=40)
    sim = _sim_result(small_pages)
    got = _read_schedule(w)
    exp = pd.DataFrame(sim.schedule,
                       columns=["wave", "position", "url", "status"])
    exp = exp.sort_values(["wave", "position"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"wave": "int64", "position": "int64"}), exp)


def test_hot_host_skew_parity(ray_session, tmp_path):
    # two hosts only: giant per-host frontier queues, politeness throttles
    # to 10/wave total — the skew shape of SURVEY §7.4.5
    import pyarrow.parquet as pq_

    from vyntr_ray.sources.pages import gen_pages_table
    from vyntr_ray.sim import CrawlConfig, simulate_crawl
    n = 400
    tab = gen_pages_table(range(n), n, n_hosts=2, seed=9)
    pf = str(tmp_path / "skew.parquet")
    pq_.write_table(tab, pf)
    seeds = tab["url"].to_pylist()[:2]
    w = str(tmp_path / "skewrun")
    stats = run_crawl(pf, seeds, w, max_pages=120, seed=9, n_shards=4,
                      checkpoint=False)
    pages = dict(zip(tab["url"].to_pylist(), tab["html"].to_pylist()))
    sim = simulate_crawl(pages, seeds, CrawlConfig(max_pages=120, seed=9))
    got = _read_schedule(w)
    exp = pd.DataFrame(sim.schedule,
                       columns=["wave", "position", "url", "status"])
    exp = exp.sort_values(["wave", "position"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"wave": "int64", "position": "int64"}), exp)
    # throttle really bit: ≥ 12 waves for 120 pages over 2 hosts
    assert stats.waves >= 12


def test_ipv6_userinfo_host_parity(ray_session, tmp_path):
    # the enqueue fast path extracts hosts with a regex; bracketed IPv6
    # literals and multi-@ userinfo must land in the SAME politeness bucket
    # as sim.py's extract_domain or wave composition diverges
    import pyarrow as pa_
    import pyarrow.parquet as pq_

    links = []
    for h in ("[2001:db8::1]", "[2001:db8::2]"):  # shared pre-':' prefix
        links += [f"http://{h}/p{i}" for i in range(6)]
    links += ["http://u:p@dup.example/a", "http://x@y@dup.example/b",
              "http://dup.example/c", "http://dup.example/d",
              "http://dup.example/e", "http://dup.example/f"]
    html = ("<html><head><title>t</title></head><body>"
            + "".join(f'<a href="{u}">l</a>' for u in links)
            + "</body></html>").encode()
    seed_url = "http://seed.example/"
    pf = str(tmp_path / "v6.parquet")
    pq_.write_table(pa_.table({"url": [seed_url], "html": [html]}), pf)
    w = str(tmp_path / "v6run")
    run_crawl(pf, [seed_url], w, max_pages=50, max_per_domain=2, seed=3,
              n_shards=2, checkpoint=False)
    sim = simulate_crawl({seed_url: html}, [seed_url],
                         CrawlConfig(max_pages=50, max_per_domain=2, seed=3))
    got = _read_schedule(w)
    exp = pd.DataFrame(sim.schedule,
                       columns=["wave", "position", "url", "status"])
    exp = exp.sort_values(["wave", "position"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"wave": "int64", "position": "int64"}), exp)
    # the two IPv6 hosts are distinct domains: 2/wave each + 2 from
    # dup.example = 6 scheduled in the second wave
    assert (exp[exp["wave"] == 1]).shape[0] == 6


def test_hot_host_salted_spill_parity(ray_session, tmp_path):
    # mega-host corpus with spill + hot-host split forced on: crawl order
    # must still match the simulator row-for-row
    import pyarrow.parquet as pq_

    from vyntr_ray.sources.pages import gen_pages_table

    n = 400
    tab = gen_pages_table(range(n), n, n_hosts=2, seed=9)
    pf = str(tmp_path / "hot.parquet")
    pq_.write_table(tab, pf)
    seeds = tab["url"].to_pylist()[:2]
    w = str(tmp_path / "hotrun")
    run_crawl(pf, seeds, w, max_pages=120, seed=9, n_shards=4,
              checkpoint=False, frontier_buckets=2, frontier_mem_rows=30,
              frontier_hot_rows=25)
    pages = dict(zip(tab["url"].to_pylist(), tab["html"].to_pylist()))
    sim = simulate_crawl(pages, seeds, CrawlConfig(max_pages=120, seed=9))
    got = _read_schedule(w)
    exp = pd.DataFrame(sim.schedule,
                       columns=["wave", "position", "url", "status"])
    exp = exp.sort_values(["wave", "position"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"wave": "int64", "position": "int64"}), exp)
    # the split really engaged: host-salted spill dirs were created (their
    # files are consumed by refills, but the dirs persist)
    import glob as g
    assert g.glob(os.path.join(w, "frontier_spill", "bucket=*", "host-*"))


def test_preload_fetch_path_parity(ray_session, small_pages_file,
                                   small_pages, tmp_path):
    # the object-store-resident fetch path must agree with the oracle
    pages_path, seeds = small_pages_file
    w = str(tmp_path / "preload")
    run_crawl(pages_path, seeds, w, max_pages=BUDGET, seed=42, n_shards=4,
              checkpoint=False, preload_pages=True)
    sim = _sim_result(small_pages)
    got = _read_schedule(w)
    exp = pd.DataFrame(sim.schedule,
                       columns=["wave", "position", "url", "status"])
    exp = exp.sort_values(["wave", "position"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"wave": "int64", "position": "int64"}), exp)


def test_robots_rules_respected(ray_session, small_pages_file, small_pages,
                                tmp_path):
    pages_path, seeds = small_pages_file
    tab, _ = small_pages
    # block one busy host's /p/ entirely
    host = "host0.example"
    robots = {host: ["/p/"]}
    w = str(tmp_path / "robots")
    run_crawl(pages_path, seeds, w, max_pages=BUDGET, seed=42, n_shards=4,
              robots=robots, checkpoint=False)
    sched = _read_schedule(w)
    assert not sched["url"].str.contains(f"https://{host}/p/").any()
    # and the oracle agrees wave-for-wave
    sim = _sim_result(small_pages, robots=robots)
    exp = pd.DataFrame(sim.schedule,
                       columns=["wave", "position", "url", "status"])
    exp = exp.sort_values(["wave", "position"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        sched.astype({"wave": "int64", "position": "int64"}), exp)


def test_actor_frontier_crawl_parity(ray_session, small_pages_file,
                                     small_pages, tmp_path):
    """r3: bucket-owning frontier actors + fully distributed link feedback
    (enqueue_distributed) must reproduce the oracle schedule exactly —
    including the checkpointed seen set (delta parts written by tasks)."""
    from vyntr_ray.pipelines.crawl import read_seen_from_checkpoints

    pages_path, seeds = small_pages_file
    w = str(tmp_path / "actorfr")
    run_crawl(pages_path, seeds, w, max_pages=BUDGET, seed=42, n_shards=4,
              distributed_links_threshold=0, frontier_actors=3)
    sim = _sim_result(small_pages)
    got = _read_schedule(w)
    exp = pd.DataFrame(sim.schedule,
                       columns=["wave", "position", "url", "status"])
    exp = exp.sort_values(["wave", "position"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"wave": "int64", "position": "int64"}), exp)
    urls = set(read_seen_from_checkpoints(os.path.join(w, "ckpt"), 10**9))
    assert urls == sim.seen


def test_actor_frontier_resume_parity(ray_session, small_pages_file,
                                      small_pages, tmp_path):
    """Resume from an actor-frontier checkpoint (per-worker frontier parts
    + task-written delta parts) reproduces the identical remainder."""
    pages_path, seeds = small_pages_file
    sim = _sim_result(small_pages)
    cut_budget = sum(1 for (w_, _p, _u, _s) in sim.schedule if w_ < 2)
    assert 0 < cut_budget < sim.scheduled
    w1 = str(tmp_path / "actor_interrupted")
    run_crawl(pages_path, seeds, w1, max_pages=cut_budget, seed=42,
              n_shards=4, distributed_links_threshold=0, frontier_actors=3)
    run_crawl(pages_path, seeds, w1, max_pages=BUDGET, seed=42, n_shards=4,
              distributed_links_threshold=0, frontier_actors=3, resume=True)
    resumed = _read_schedule(w1)
    exp = pd.DataFrame(sim.schedule,
                       columns=["wave", "position", "url", "status"])
    exp = exp.sort_values(["wave", "position"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        resumed.astype({"wave": "int64", "position": "int64"}), exp)


def test_actor_frontier_resume_across_topologies(ray_session,
                                                 small_pages_file,
                                                 small_pages, tmp_path):
    """r3 late: `restore_parts` re-derives bucket ownership from the domain
    hash, so a resume is correct when n_actors CHANGES between runs and
    when adopting a legacy driver-frontier (single-file) checkpoint into
    actor mode.  Both remainders must match the oracle schedule."""
    pages_path, seeds = small_pages_file
    sim = _sim_result(small_pages)
    cut_budget = sum(1 for (w_, _p, _u, _s) in sim.schedule if w_ < 2)
    assert 0 < cut_budget < sim.scheduled
    exp = pd.DataFrame(sim.schedule,
                       columns=["wave", "position", "url", "status"])
    exp = exp.sort_values(["wave", "position"]).reset_index(drop=True)

    # interrupted with 3 workers, resumed with 2
    w1 = str(tmp_path / "actor_retopo")
    run_crawl(pages_path, seeds, w1, max_pages=cut_budget, seed=42,
              n_shards=4, distributed_links_threshold=0, frontier_actors=3)
    run_crawl(pages_path, seeds, w1, max_pages=BUDGET, seed=42, n_shards=4,
              distributed_links_threshold=0, frontier_actors=2, resume=True)
    pd.testing.assert_frame_equal(
        _read_schedule(w1).astype({"wave": "int64", "position": "int64"}),
        exp)

    # interrupted on the driver-frontier path (frontier.parquet), resumed
    # under the actor tier (restore_parts on the legacy single file)
    w2 = str(tmp_path / "actor_adopt")
    run_crawl(pages_path, seeds, w2, max_pages=cut_budget, seed=42,
              n_shards=4, distributed_links_threshold=0)
    run_crawl(pages_path, seeds, w2, max_pages=BUDGET, seed=42, n_shards=4,
              distributed_links_threshold=0, frontier_actors=3, resume=True)
    pd.testing.assert_frame_equal(
        _read_schedule(w2).astype({"wave": "int64", "position": "int64"}),
        exp)


def test_actor_frontier_stateful_and_priority_parity(ray_session,
                                                     small_pages_file,
                                                     small_pages, tmp_path):
    """Worker-resident token buckets and in-dataflow priority_fn both
    match their driver-path equivalents."""
    pages_path, seeds = small_pages_file
    tab, _ = small_pages
    pages = dict(zip(tab["url"].to_pylist(), tab["html"].to_pylist()))
    # stateful refill
    w1 = str(tmp_path / "actor_tok")
    run_crawl(pages_path, seeds, w1, max_pages=BUDGET, seed=42, n_shards=4,
              checkpoint=False, refill=2.0, distributed_links_threshold=0,
              frontier_actors=3)
    w2 = str(tmp_path / "driver_tok")
    run_crawl(pages_path, seeds, w2, max_pages=BUDGET, seed=42, n_shards=4,
              checkpoint=False, refill=2.0)
    pd.testing.assert_frame_equal(_read_schedule(w1), _read_schedule(w2))
    # priority mode through the distributed filter tasks
    def prio(url: str) -> float:
        return float(int(url.rsplit("/", 1)[-1]) % 97)

    w3 = str(tmp_path / "actor_prio")
    run_crawl(pages_path, seeds, w3, max_pages=BUDGET, seed=42, n_shards=4,
              checkpoint=False, priority_fn=prio,
              distributed_links_threshold=0, frontier_actors=3)
    simp = simulate_crawl(pages, seeds,
                          CrawlConfig(max_pages=BUDGET, seed=42,
                                      priority_fn=prio))
    got = _read_schedule(w3)
    exp = pd.DataFrame(simp.schedule,
                       columns=["wave", "position", "url", "status"])
    exp = exp.sort_values(["wave", "position"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"wave": "int64", "position": "int64"}), exp)


def test_actor_frontier_robots_parity(ray_session, small_pages_file,
                                      small_pages, tmp_path):
    """Robots rules applied inside the distributed filter tasks match the
    oracle (dict-rule path)."""
    pages_path, seeds = small_pages_file
    host = "host0.example"
    robots = {host: ["/p/"]}
    w = str(tmp_path / "actor_robots")
    run_crawl(pages_path, seeds, w, max_pages=BUDGET, seed=42, n_shards=4,
              robots=robots, checkpoint=False,
              distributed_links_threshold=0, frontier_actors=3)
    sched = _read_schedule(w)
    assert not sched["url"].str.contains(f"https://{host}/p/").any()
    sim = _sim_result(small_pages, robots=robots)
    exp = pd.DataFrame(sim.schedule,
                       columns=["wave", "position", "url", "status"])
    exp = exp.sort_values(["wave", "position"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        sched.astype({"wave": "int64", "position": "int64"}), exp)


def test_bucketed_store_fused_fetch_parity(ray_session, small_pages,
                                           tmp_path):
    """r3: the disk-resident bucketed-store path now runs the FUSED
    raw-task fetch+parse kernel (url-first pruned row-group reads, no
    per-wave Dataset job) — it must reproduce the oracle schedule AND
    byte-identical analyses, including through the distributed-links and
    actor-frontier paths."""
    import json

    import pyarrow as pa

    from vyntr_ray.urls import url_bucket

    tab, seeds = small_pages
    store = str(tmp_path / "store")
    n_buckets = 8
    buckets = [url_bucket(u, n_buckets) for u in tab["url"].to_pylist()]
    for b in sorted(set(buckets)):
        d = os.path.join(store, f"bucket={b}")
        os.makedirs(d, exist_ok=True)
        mask = pa.array([x == b for x in buckets])
        pq.write_table(tab.filter(mask), os.path.join(d, "part.parquet"),
                       row_group_size=32)
    with open(os.path.join(store, "store_meta.json"), "w") as f:
        json.dump({"n_buckets": n_buckets}, f)

    sim = _sim_result(small_pages)
    exp = pd.DataFrame(sim.schedule,
                       columns=["wave", "position", "url", "status"])
    exp = exp.sort_values(["wave", "position"]).reset_index(drop=True)
    for tag, extra in [("plain", {}),
                       ("preload", {"preload_pages": True}),
                       ("dist", {"distributed_links_threshold": 0,
                                 "frontier_actors": 2})]:
        w = str(tmp_path / f"fused_{tag}")
        run_crawl(store, seeds, w, max_pages=BUDGET, seed=42, n_shards=4,
                  checkpoint=False, **extra)
        got = _read_schedule(w)
        pd.testing.assert_frame_equal(
            got.astype({"wave": "int64", "position": "int64"}), exp)
        # analyses parity: same fetched urls, same per-wave positions
        adf = _read_analyses(w)
        fetched = exp[exp["status"] == "fetched"]
        assert sorted(adf["url"]) == sorted(fetched["url"])


def test_actor_frontier_forced_spill_parity(ray_session, small_pages_file,
                                            small_pages, tmp_path):
    """Worker-resident BucketedFrontier spill (mem_rows forced tiny) under
    the actor tier + distributed link feedback must not change crawl
    order."""
    pages_path, seeds = small_pages_file
    w = str(tmp_path / "actor_spill")
    run_crawl(pages_path, seeds, w, max_pages=BUDGET, seed=42, n_shards=4,
              checkpoint=False, frontier_buckets=3, frontier_mem_rows=40,
              distributed_links_threshold=0, frontier_actors=2)
    sim = _sim_result(small_pages)
    got = _read_schedule(w)
    exp = pd.DataFrame(sim.schedule,
                       columns=["wave", "position", "url", "status"])
    exp = exp.sort_values(["wave", "position"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"wave": "int64", "position": "int64"}), exp)


def test_actor_frontier_all_miss_and_garbage_seeds(ray_session,
                                                   small_pages_file,
                                                   tmp_path):
    """Actor mode + forced distributed links on degenerate inputs: seeds
    that all miss the page table (empty fetch wave, no links → the
    delta-staging dir is never created) and garbage seed lines must
    complete, not crash (r3 regression: FileNotFoundError / KeyError)."""
    pages_path, seeds = small_pages_file
    w = str(tmp_path / "allmiss")
    s = run_crawl(pages_path, ["https://nosuch.example/a"], w,
                  max_pages=50, seed=1, n_shards=2,
                  distributed_links_threshold=0, frontier_actors=2)
    assert (s.waves, s.fetched, s.failed) == (1, 0, 1)
    real = pq.read_table(pages_path, columns=["url"])["url"].to_pylist()[0]
    w2 = str(tmp_path / "garb")
    s2 = run_crawl(pages_path, ["   ", ":::", real], w2, max_pages=40,
                   seed=1, n_shards=2, distributed_links_threshold=0,
                   frontier_actors=2)
    assert s2.fetched > 0 and s2.waves >= 1
