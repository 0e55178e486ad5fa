"""Reference-semantics crawl simulator — the parity oracle.

Pure-Python, single-threaded restatement of the Genesis crawl loop
(`genesis/src/main.rs:63-318`) under the **deterministic wave contract** of
SURVEY.md §7.4.  The reference crawl is racy (5000 concurrent fetch slots,
OS-seeded shuffle, HashSet link order); this contract replaces each source of
nondeterminism with a pinned rule so the Ray pipeline and this oracle are
comparable row-for-row:

1. *Wave-synchronous BFS*: one frontier collection (`DomainQueues
   .collect_batch`, `genesis/src/crawler.rs:28-48`) = one wave; all fetches
   of a wave complete before the next collection.
2. *Politeness*: per wave each domain contributes at most
   ``max_per_domain`` urls, FIFO by enqueue sequence
   (`genesis/src/main.rs:175,191`).  Optional robots disallow-prefix rules
   (north-rule addition; the reference has none — SURVEY §2.3 T9) drop urls
   at enqueue time, after they are marked seen.
3. *Seeded shuffle*: the collected batch, ordered by enqueue seq, is
   permuted with ``PCG64(seed ^ wave)`` — replacing
   ``StdRng::from_os_rng`` (`genesis/src/main.rs:173,192-193`).
4. *Sorted link emission*: per-page extracted links are deduplicated and
   sorted (replacing HashSet iteration order, `genesis/src/html_parser.rs:97`).
5. *Budget*: ``max_pages`` counts scheduled fetch attempts; a wave whose
   batch crosses the budget is truncated in shuffled order, and the cut urls
   are consumed (not re-queued) — exactly the reference's
   ``pages_count > MAX_PAGES`` abort (`genesis/src/main.rs:243-246`).
6. *Visited-set discipline*: seeds are inserted raw
   (`genesis/src/main.rs:216-225`); child links are inserted as the
   parser-emitted absolute urls at discovery time, first occurrence wins
   (`genesis/src/main.rs:272-279`).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .extract import parse_html, sanitize_text
from .urls import UrlParseError, extract_domain, md5_partition, normalize_url

__all__ = ["CrawlConfig", "CrawlResult", "simulate_crawl", "wave_permutation",
           "robots_allowed"]


@dataclass(frozen=True)
class CrawlConfig:
    max_pages: int = 50_000          # genesis/src/main.rs:34
    max_per_domain: int = 5          # genesis/src/main.rs:175
    domain_caps: dict | None = None  # per-host overrides (Crawl-delay)
    seed: int = 42
    robots: dict | None = None       # host -> list of disallowed path prefixes
    priority_fn: object = None       # url -> float; None = FIFO (reference)
    fetch_ladder: object = None      # RetryLadder transport model (S4);
    # None = every fetch attempt succeeds (the reference's happy path)


@dataclass
class CrawlResult:
    seen: set = field(default_factory=set)
    # analyses rows in fetch order: dicts with url/language/title/meta_tags/
    # canonical_url/content_text/partition
    analyses: list = field(default_factory=list)
    # schedule log: (wave, position, url, status) status ∈ fetched|miss|cut
    schedule: list = field(default_factory=list)
    waves: int = 0
    scheduled: int = 0
    fetched: int = 0
    failed: int = 0
    discovered: int = 0
    retried: int = 0     # extra transport attempts beyond the first


def wave_permutation(n: int, seed: int, wave: int) -> np.ndarray:
    """The pinned per-wave shuffle: PCG64 keyed by (seed, wave)."""
    rng = np.random.Generator(np.random.PCG64((seed << 20) ^ wave))
    return rng.permutation(n)


def robots_allowed(url: str, robots: dict | None) -> bool:
    """Disallow-prefix check against the joined url's host + path."""
    if not robots:
        return True
    try:
        host = extract_domain(url)
    except UrlParseError:
        return True
    rules = robots.get(host)
    if not rules:
        return True
    path = "/" + url.split("://", 1)[1].split("/", 1)[1] if "/" in url.split("://", 1)[1] else "/"
    return not any(path.startswith(p) for p in rules)


def simulate_crawl(pages: dict[str, bytes], seeds: list[str],
                   config: CrawlConfig = CrawlConfig()) -> CrawlResult:
    """Run the deterministic crawl over an in-memory {url: html} table."""
    res = CrawlResult()
    # frontier: per-domain FIFO (or priority) with global enqueue sequence
    frontier: dict[str, list[tuple[int, str, float]]] = {}
    next_seq = 0

    def enqueue(raw_url: str) -> None:
        nonlocal next_seq
        try:
            url = normalize_url(raw_url)
            domain = extract_domain(url)
        except UrlParseError:
            return
        if not robots_allowed(url, config.robots):
            return
        prio = float(config.priority_fn(url)) if config.priority_fn else 0.0
        frontier.setdefault(domain, []).append((next_seq, url, prio))
        next_seq += 1

    for seed_url in seeds:
        if seed_url not in res.seen:
            res.seen.add(seed_url)          # raw, as the reference does
            enqueue(seed_url)

    wave = 0
    while res.scheduled < config.max_pages and any(frontier.values()):
        # --- politeness collection: ≤k per domain; FIFO by seq, or
        # highest-priority-first (seq tiebreak) in priority mode
        collected: list[tuple[int, str, float]] = []
        for domain in list(frontier):
            q = frontier[domain]
            if config.priority_fn:
                q = sorted(q, key=lambda t: (-t[2], t[0]))
            cap = (config.domain_caps or {}).get(domain,
                                                 config.max_per_domain)
            take, rest = q[:cap], q[cap:]
            collected.extend(take)
            if rest:
                frontier[domain] = rest
            else:
                del frontier[domain]
        collected.sort(key=lambda t: (-t[2], t[0]))
        batch = [u for _, u, _p in collected]
        # --- seeded shuffle + budget truncation
        perm = wave_permutation(len(batch), config.seed, wave)
        batch = [batch[i] for i in perm]
        res.scheduled += len(batch)
        cut = max(0, res.scheduled - config.max_pages)
        if cut:
            for pos, url in enumerate(batch[len(batch) - cut:]):
                res.schedule.append((wave, len(batch) - cut + pos, url, "cut"))
            batch = batch[: len(batch) - cut]
        # --- fetch + parse + discover
        for pos, url in enumerate(batch):
            # transport ladder first (tunnel retries → proxy fallback);
            # store presence models content, the ladder models transport
            if config.fetch_ladder is not None:
                ok, attempts, _via = config.fetch_ladder.outcome(url)
                res.retried += attempts - 1
                if not ok:
                    res.failed += 1
                    res.schedule.append((wave, pos, url, "miss"))
                    continue
            html = pages.get(url)
            if html is None:
                res.failed += 1
                res.schedule.append((wave, pos, url, "miss"))
                continue
            parsed = parse_html(html, url)
            res.fetched += 1
            res.schedule.append((wave, pos, url, "fetched"))
            res.analyses.append({
                "url": sanitize_text(url),
                "language": sanitize_text(parsed.language),
                "title": sanitize_text(parsed.title),
                "meta_tags": [
                    {"name": sanitize_text(m["name"]),
                     "content": sanitize_text(m["content"])}
                    for m in parsed.meta_tags],
                "canonical_url": (sanitize_text(parsed.canonical_url)
                                  if parsed.canonical_url is not None else None),
                "content_text": sanitize_text(parsed.content_text),
                "partition": md5_partition(url),
            })
            for link in parsed.links:       # sorted by contract
                if link not in res.seen:
                    res.seen.add(link)
                    res.discovered += 1
                    enqueue(link)
        res.waves = wave + 1
        wave += 1
    return res
