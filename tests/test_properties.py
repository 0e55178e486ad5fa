"""Property tests (SURVEY §5.4): invariants over generated inputs."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from vyntr_ray.sim import CrawlConfig, simulate_crawl
from vyntr_ray.state.filters import BloomFilter, CuckooFilter
from vyntr_ray.state.politeness import PolitenessPolicy
from vyntr_ray.urls import UrlParseError, extract_domain, normalize_url

# --- URL algebra -----------------------------------------------------------

_hosty = st.from_regex(r"[a-z][a-z0-9\-]{0,10}(\.[a-z]{2,5}){1,2}",
                       fullmatch=True)
_pathy = st.from_regex(r"(/[A-Za-z0-9._~\-]{0,8}){0,4}/?", fullmatch=True)


@given(scheme=st.sampled_from(["http", "https", "HTTP", "Https"]),
       host=_hosty, path=_pathy,
       port=st.one_of(st.none(), st.integers(1, 65535)))
@settings(max_examples=200, deadline=None)
def test_normalize_idempotent_and_parses(scheme, host, path, port):
    raw = f"{scheme}://{host}" + (f":{port}" if port else "") + path
    out = normalize_url(raw)
    assert normalize_url(out) == out          # idempotent
    assert extract_domain(out) == host.lower()
    assert out.startswith(scheme.lower() + "://")


@given(st.text(max_size=40))
@settings(max_examples=300, deadline=None)
def test_normalize_total_function(s):
    # any input either normalizes to an idempotent form or raises cleanly
    try:
        out = normalize_url(s)
    except UrlParseError:
        return
    assert normalize_url(out) == out


# --- extractor robustness --------------------------------------------------

_soup = st.text(
    alphabet=st.sampled_from(list("<>/ab c=\"'&;#!-p1hli" + "\n\t")),
    max_size=300)


@given(_soup)
@settings(max_examples=200, deadline=None)
def test_extractor_total_and_deterministic(soup):
    from vyntr_ray.extract import parse_html
    r1 = parse_html(soup, "https://h.example/")
    r2 = parse_html(soup, "https://h.example/")
    assert r1.content_text == r2.content_text
    assert r1.links == r2.links == sorted(set(r1.links))
    assert r1.title == r2.title


# --- membership filters ----------------------------------------------------

@given(st.lists(st.text(min_size=1, max_size=30), min_size=1, max_size=300,
                unique=True))
@settings(max_examples=50, deadline=None)
def test_filters_no_false_negatives(items):
    cf = CuckooFilter(capacity=4 * len(items) + 64)
    bf = BloomFilter(capacity=len(items) + 16)
    assert cf.add(items) == len(items)
    bf.add(items)
    assert cf.contains(items).all()
    assert bf.contains(items).all()


# --- politeness ------------------------------------------------------------

@given(st.lists(st.tuples(st.sampled_from("abcdef"), st.integers(0, 10**6)),
                min_size=0, max_size=200),
       st.integers(1, 7))
@settings(max_examples=100, deadline=None)
def test_politeness_partition_and_cap(entries, cap):
    seqs = {}
    rows = []
    for i, (d, _) in enumerate(entries):
        rows.append({"seq": i, "url": f"https://{d}.x/p/{i}", "domain": d})
    f = pd.DataFrame(rows, columns=["seq", "url", "domain"])
    pol = PolitenessPolicy(max_per_domain=cap)
    got, rest = pol.select(f)
    # partition: nothing lost, nothing duplicated
    assert len(got) + len(rest) == len(f)
    assert set(got["seq"]).isdisjoint(set(rest["seq"]))
    # cap per domain
    if len(got):
        assert got.groupby("domain").size().max() <= cap
    # FIFO: every selected seq is smaller than every rest seq of same domain
    for d in set(f["domain"]):
        g = got[got["domain"] == d]["seq"]
        r = rest[rest["domain"] == d]["seq"]
        if len(g) and len(r):
            assert g.max() < r.min()
    _ = seqs


# --- crawl conservation (deterministic random graphs) ----------------------

@pytest.mark.parametrize("seed", [1, 2, 3])
def test_sim_conservation_invariants(seed):
    rng = np.random.default_rng(seed)
    n = 120
    urls = [f"https://h{i % 7}.ex/p/{i}" for i in range(n)]
    pages = {}
    for i, u in enumerate(urls):
        targets = rng.choice(n, size=4)
        links = "".join(f'<a href="{urls[int(t)]}">x</a>' for t in targets)
        pages[u] = f"<html><p>t{i}</p>{links}</html>".encode()
    seeds = [urls[0], urls[5]]
    budget = int(rng.integers(20, 100))
    res = simulate_crawl(pages, seeds, CrawlConfig(max_pages=budget,
                                                   seed=seed))
    by_status = {}
    for (_w, _p, _u, s) in res.schedule:
        by_status[s] = by_status.get(s, 0) + 1
    # scheduled = fetched + missed + cut
    assert res.scheduled == sum(by_status.values())
    assert by_status.get("fetched", 0) == res.fetched
    assert by_status.get("miss", 0) == res.failed
    assert res.scheduled <= budget + by_status.get("cut", 0)
    # seen = seeds + discovered (all seeds distinct, all discovered new)
    assert len(res.seen) == len(set(seeds)) + res.discovered
    # politeness: ≤5 per domain per wave
    per = {}
    for (w, _p, u, _s) in res.schedule:
        d = u.split("://")[1].split("/")[0]
        per[(w, d)] = per.get((w, d), 0) + 1
    assert max(per.values()) <= 5
    # no url scheduled twice (seeds here are already normalized)
    sched_urls = [u for (_w, _p, u, _s) in res.schedule]
    assert len(sched_urls) == len(set(sched_urls))
