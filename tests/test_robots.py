"""robots.txt component: parser, distributed loader, sharded cache pool."""

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from vyntr_ray.functions.robots import load_robots_rules, parse_robots_txt


class TestParser:
    def test_star_group(self):
        txt = "User-agent: *\nDisallow: /private/\nDisallow: /tmp/\n"
        assert parse_robots_txt(txt) == ["/private/", "/tmp/"]

    def test_other_agent_ignored(self):
        txt = "User-agent: other-bot\nDisallow: /\n\nUser-agent: *\nDisallow: /x/\n"
        assert parse_robots_txt(txt) == ["/x/"]

    def test_grouped_agents(self):
        txt = "User-agent: a\nUser-agent: *\nDisallow: /y/\n"
        assert parse_robots_txt(txt) == ["/y/"]

    def test_empty_disallow_allows_all(self):
        assert parse_robots_txt("User-agent: *\nDisallow:\n") == []

    def test_comments_and_blank(self):
        txt = "# hi\nUser-agent: * # star\nDisallow: /a # tail\n"
        assert parse_robots_txt(txt) == ["/a"]


@pytest.fixture(scope="module")
def robots_pages_file(tmp_path_factory):
    from vyntr_ray.sources.pages import gen_pages_table, gen_robots_table, make_seed_list
    n = 600
    tab = gen_pages_table(range(n), n, seed=42)
    robots = gen_robots_table(n, seed=42)
    full = pa.concat_tables([tab, robots])
    path = tmp_path_factory.mktemp("rp") / "pages.parquet"
    pq.write_table(full, path)
    return str(path), make_seed_list(n, seed=42), full


@pytest.mark.usefixtures("ray_session")
def test_load_rules_from_store(robots_pages_file):
    path, _seeds, full = robots_pages_file
    rules = load_robots_rules(path)
    # every 5th host has a robots page with one Disallow for UA *
    assert rules, "no rules loaded"
    for host, prefixes in rules.items():
        h = int(host.removeprefix("host").removesuffix(".example"))
        assert h % 5 == 0
        assert prefixes == [f"/p/{h % 10}"]


@pytest.mark.usefixtures("ray_session")
def test_crawl_respects_corpus_robots_and_matches_oracle(
        robots_pages_file, tmp_path):
    from vyntr_ray.pipelines.crawl import run_crawl
    from vyntr_ray.sim import CrawlConfig, simulate_crawl

    path, seeds, full = robots_pages_file
    rules = load_robots_rules(path)
    w = str(tmp_path / "robots_corpus")
    run_crawl(path, seeds, w, max_pages=300, seed=42, n_shards=4,
              robots=rules, checkpoint=False)
    import glob
    files = sorted(glob.glob(os.path.join(w, "schedule", "*.parquet")))
    sched = pd.concat([pq.read_table(f).to_pandas() for f in files])
    sched = sched.sort_values(["wave", "position"]).reset_index(drop=True)
    # no scheduled url violates its host's rules
    for _, row in sched.iterrows():
        host_part = row["url"].split("://")[1].split("/")[0]
        if host_part in rules:
            path_part = "/" + row["url"].split("://")[1].split("/", 1)[1]
            assert not any(path_part.startswith(p)
                           for p in rules[host_part]), row["url"]
    # oracle parity under the same rules
    pages = dict(zip(full["url"].to_pylist(), full["html"].to_pylist()))
    sim = simulate_crawl(pages, seeds,
                         CrawlConfig(max_pages=300, seed=42, robots=rules))
    exp = pd.DataFrame(sim.schedule,
                       columns=["wave", "position", "url", "status"])
    exp = exp.sort_values(["wave", "position"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        sched[["wave", "position", "url", "status"]]
        .astype({"wave": "int64", "position": "int64"}), exp)


@pytest.mark.usefixtures("ray_session")
def test_sharded_robots_pool_matches_dict(robots_pages_file, tmp_path):
    from vyntr_ray.functions.robots import ShardedRobots
    from vyntr_ray.pipelines.crawl import run_crawl

    path, seeds, _full = robots_pages_file
    rules = load_robots_rules(path)
    pool = ShardedRobots(rules, n_shards=3)
    # direct parity of the check API
    hosts = list(rules)[:3] + ["host1.example"]
    paths = [rules[h][0] + "99" for h in hosts[:3]] + ["/p/1"]
    assert pool.allowed(hosts, paths) == [False, False, False, True]
    # full-crawl parity: actor-pool path == broadcast-dict path
    w1 = str(tmp_path / "dictpath")
    w2 = str(tmp_path / "poolpath")
    run_crawl(path, seeds, w1, max_pages=200, seed=42, n_shards=4,
              robots=rules, checkpoint=False)
    run_crawl(path, seeds, w2, max_pages=200, seed=42, n_shards=4,
              robots=pool, checkpoint=False)
    import glob
    read = lambda w: pd.concat(  # noqa: E731
        [pq.read_table(f).to_pandas() for f in
         sorted(glob.glob(os.path.join(w, "schedule", "*.parquet")))]
    ).sort_values(["wave", "position"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(read(w1), read(w2))


class TestCrawlDelay:
    def test_parse_robots_delay(self):
        from vyntr_ray.functions.robots import parse_robots_delay
        t = ("User-agent: other\nCrawl-delay: 9\n\n"
             "User-agent: *\nDisallow: /x\nCrawl-delay: 2.5\n")
        assert parse_robots_delay(t) == 2.5
        assert parse_robots_delay("User-agent: *\nDisallow: /") is None
        assert parse_robots_delay("User-agent: *\nCrawl-delay: soon") is None

    def test_caps_from_delays(self):
        from vyntr_ray.state.politeness import caps_from_delays
        caps = caps_from_delays({"a": 5.0, "b": 1.0, "c": 100.0,
                                 "d": 0.1, "e": 0.0}, capacity=5)
        assert caps == {"a": 1, "b": 5, "c": 1, "d": 5}   # 0 delay ignored

    def test_select_frame_with_caps(self):
        import pandas as pd

        from vyntr_ray.state.politeness import PolitenessPolicy
        rows = [{"seq": i, "url": f"https://{d}/p/{i}", "domain": d}
                for i, d in enumerate(["a"] * 6 + ["b"] * 6)]
        f = pd.DataFrame(rows)
        got, rest, _ = PolitenessPolicy.select_frame(
            f, capacity=5, refill=5, tokens=None, domain_caps={"a": 2})
        per = got.groupby("domain").size().to_dict()
        assert per == {"a": 2, "b": 5}
        # token mode honors the per-domain cap as the bucket size too
        got2, _, upd = PolitenessPolicy.select_frame(
            f, capacity=5, refill=1, tokens={}, domain_caps={"a": 2})
        assert got2.groupby("domain").size().to_dict() == {"a": 2, "b": 5}
        assert upd["a"] == 0.0 and upd["b"] == 0.0

    def test_crawl_sim_parity_with_domain_caps(self, ray_session,
                                               small_pages_file,
                                               small_pages, tmp_path):
        import pandas as pd

        from test_crawl import BUDGET, _read_schedule, _sim_result
        from vyntr_ray.pipelines.crawl import run_crawl
        from vyntr_ray.sim import CrawlConfig, simulate_crawl

        caps = {"host0.example": 1, "host3.example": 2}
        pages_path, seeds = small_pages_file
        tab, _ = small_pages
        pages = dict(zip(tab["url"].to_pylist(), tab["html"].to_pylist()))
        sim = simulate_crawl(pages, seeds,
                             CrawlConfig(max_pages=BUDGET, seed=42,
                                         domain_caps=caps))
        base = _sim_result(small_pages)
        assert sim.schedule != base.schedule   # the caps actually bite

        for dist in (False, True):
            w = str(tmp_path / f"capped{dist}")
            run_crawl(pages_path, seeds, w, max_pages=BUDGET, seed=42,
                      n_shards=4, checkpoint=False, domain_caps=caps,
                      distributed_select=dist)
            got = _read_schedule(w)
            exp = pd.DataFrame(sim.schedule,
                               columns=["wave", "position", "url", "status"])
            exp = exp.sort_values(["wave", "position"]) \
                     .reset_index(drop=True)
            pd.testing.assert_frame_equal(
                got.astype({"wave": "int64", "position": "int64"}), exp)
