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
        sched.astype({"wave": "int64", "position": "int64"}), exp)


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
