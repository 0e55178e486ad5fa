"""robots.txt parsing + distributed rules loading (T9 north-rule component).

The reference has NO robots handling (verified, SURVEY §2.3 T9); this
implements the standard public semantics (RFC 9309 subset): collect
``Disallow`` path prefixes from ``User-agent: *`` groups; an empty
``Disallow:`` value allows everything; other user-agent groups are ignored.

``load_robots_rules`` resolves every host's rules up-front from the page
store (the closed-world sandbox analog of fetching ``/robots.txt`` per
host); a live deployment fetches lazily into the same sharded cache.
"""

from __future__ import annotations

__all__ = ["parse_robots_txt", "parse_robots_delay", "load_robots",
           "load_robots_rules", "RobotsShard",
           "ShardedRobots"]


def parse_robots_txt(text: str) -> list[str]:
    """Disallow prefixes applying to ``User-agent: *``.

    Standard grouping: consecutive ``User-agent`` lines open a group; its
    rule lines apply when any of the group's agents is ``*``.
    """
    rules: list[str] = []
    group_agents: list[str] = []
    in_rules = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if in_rules:          # a rule line ended the previous group
                group_agents = []
                in_rules = False
            group_agents.append(val)
        elif key in ("disallow", "allow", "crawl-delay"):
            in_rules = True
            if key == "disallow" and val and "*" in group_agents:
                rules.append(val)
    return rules


def parse_robots_delay(text: str) -> float | None:
    """``Crawl-delay`` seconds for ``User-agent: *`` (last one wins)."""
    delay: float | None = None
    group_agents: list[str] = []
    in_rules = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if in_rules:
                group_agents = []
                in_rules = False
            group_agents.append(val)
        elif key in ("disallow", "allow", "crawl-delay"):
            in_rules = True
            if key == "crawl-delay" and "*" in group_agents:
                try:
                    delay = float(val)
                except ValueError:
                    pass
    return delay


def load_robots(pages_path: str
                ) -> tuple[dict[str, list[str]], dict[str, float]]:
    """Scan the page store for ``*/robots.txt`` rows → (host → disallow
    prefixes, host → Crawl-delay seconds).

    One distributed pass at crawl start (rows with the robots path are rare,
    so the scan is read-bound on the url column plus the few html bodies).
    """
    import glob as _glob
    import os

    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from ..urls import extract_domain

    if os.path.isdir(pages_path) and os.path.exists(
            os.path.join(pages_path, "store_meta.json")):
        files = sorted(_glob.glob(
            os.path.join(pages_path, "bucket=*", "*.parquet")))
        ds = rd.read_parquet(files, columns=["url", "html"])
    else:
        ds = rd.read_parquet(pages_path, columns=["url", "html"])

    def only_robots(t: pa.Table) -> pa.Table:
        return t.filter(pc.ends_with(t["url"], "/robots.txt"))

    rows = ds.map_batches(only_robots, batch_format="pyarrow").take_all()
    rules: dict[str, list[str]] = {}
    delays: dict[str, float] = {}
    for r in rows:
        try:
            host = extract_domain(r["url"])
        except Exception:
            continue
        body = r["html"]
        if isinstance(body, (bytes, bytearray, memoryview)):
            body = bytes(body).decode("utf-8", errors="replace")
        prefixes = parse_robots_txt(body)
        if prefixes:
            rules[host] = prefixes
        delay = parse_robots_delay(body)
        if delay is not None:
            delays[host] = delay
    return rules, delays


def load_robots_rules(pages_path: str) -> dict[str, list[str]]:
    """Back-compat wrapper: disallow prefixes only."""
    return load_robots(pages_path)[0]


class RobotsShard:
    """One shard of the robots cache (wrap with ``ray.remote``).

    Holds the rules for hosts hashing to this shard; at 10^8 hosts the full
    dict cannot be broadcast, so checks route here by host-hash — the
    "robots.txt caches as stateful actors" piece of the north star.
    """

    def __init__(self, shard_id: int, rules: dict[str, list[str]]):
        self.shard_id = shard_id
        self.rules = rules

    def allowed(self, hosts: list[str], paths: list[str]) -> list[bool]:
        out = []
        for h, p in zip(hosts, paths):
            rs = self.rules.get(h)
            out.append(not rs or not any(p.startswith(r) for r in rs))
        return out

    def update(self, rules: dict[str, list[str]]) -> None:
        self.rules.update(rules)


class ShardedRobots:
    """Driver-side handle over the robots shard pool (host-hash routing)."""

    def __init__(self, rules: dict[str, list[str]], n_shards: int = 4):
        import ray

        from ..state.filters import _hash64

        self.n_shards = n_shards
        self._hash = _hash64
        parts: list[dict] = [{} for _ in range(n_shards)]
        hosts = list(rules)
        if hosts:
            shard_of = (self._hash(hosts) % n_shards).astype(int)
            for h, s in zip(hosts, shard_of):
                parts[s][h] = rules[h]
        actor_cls = ray.remote(num_cpus=0.1)(RobotsShard)
        self.shards = [actor_cls.remote(i, parts[i])
                       for i in range(n_shards)]

    def allowed(self, hosts: list[str], paths: list[str]) -> list[bool]:
        import ray
        if not hosts:
            return []
        shard_of = (self._hash(hosts) % self.n_shards).astype(int)
        futs, idxs = [], []
        for s in range(self.n_shards):
            idx = [i for i, sh in enumerate(shard_of) if sh == s]
            if idx:
                futs.append(self.shards[s].allowed.remote(
                    [hosts[i] for i in idx], [paths[i] for i in idx]))
                idxs.append(idx)
        out = [True] * len(hosts)
        for idx, res in zip(idxs, ray.get(futs)):
            for i, v in zip(idx, res):
                out[i] = v
        return out
