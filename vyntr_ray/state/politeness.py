"""Per-host politeness: token buckets + robots.txt disallow rules (T9).

The reference's only politeness is ``MAX_PER_DOMAIN = 5`` per frontier
collection (`genesis/src/main.rs:175`, `genesis/src/crawler.rs:28-41`); it has
no robots handling (verified — SURVEY.md §2.3 T9).  This north-rule component
generalizes both:

- **Token bucket per host**: capacity ``max_per_domain``, refill ``refill``
  tokens per wave.  The default ``refill == capacity`` makes the bucket
  memoryless, which reproduces the reference's ≤5-per-domain-per-batch
  behavior exactly; a smaller refill throttles hot hosts across waves.
- **Robots rules**: host → list of disallowed path prefixes, applied at
  enqueue time (after the url is marked seen, so a disallowed url is never
  reconsidered).  Default empty = allow-all = reference behavior.

State is a per-host float (token balance) — sharded by host-hash alongside
the frontier buckets at scale; held as a dict keyed by domain here, updated
once per wave (driver-side, politeness-bounded size).
"""

from __future__ import annotations

import pandas as pd

from ..sim import robots_allowed

__all__ = ["PolitenessPolicy"]


class PolitenessPolicy:
    def __init__(self, max_per_domain: int = 5, refill: float | None = None,
                 robots: dict | None = None,
                 domain_caps: dict[str, int] | None = None):
        self.capacity = max_per_domain
        self.refill = refill if refill is not None else max_per_domain
        self.robots = robots or {}
        # per-host cap overrides (e.g. robots Crawl-delay -> caps via
        # caps_from_delays); config-derived like robots, NOT snapshotted
        self.domain_caps = domain_caps or {}
        self._tokens: dict[str, float] = {}   # only tracked when refill < cap
        self._stateless = self.refill >= self.capacity

    # --- robots ----------------------------------------------------------
    def allowed(self, url: str) -> bool:
        return robots_allowed(url, self.robots)

    # --- selection -------------------------------------------------------
    def budget_of(self, domain: str) -> int:
        cap = self.domain_caps.get(domain, self.capacity)
        if self._stateless:
            return cap
        bal = min(cap, self._tokens.get(domain, cap) + self.refill)
        return int(bal)

    @staticmethod
    def select_frame(frontier: pd.DataFrame, capacity: int, refill: float,
                     tokens: dict[str, float] | None,
                     domain_caps: dict[str, int] | None = None
                     ) -> tuple[pd.DataFrame, pd.DataFrame,
                                dict[str, float] | None]:
        """Pure vectorized politeness selection over one frame.

        Returns (collected, rest, updated-token-balances for the frame's
        domains — None in stateless mode).  Pure so the same kernel runs
        driver-side (:meth:`select`) and as a per-bucket Ray task
        (``BucketedFrontier.select_distributed`` — token balances ride with
        the bucket and come back with the result).
        """
        stateless = refill >= capacity
        if len(frontier) == 0:
            return frontier, frontier, (None if stateless else {})
        if "priority" in frontier.columns:
            f = frontier.sort_values(["priority", "seq"],
                                     ascending=[False, True], kind="stable")
        else:
            f = frontier.sort_values("seq", kind="stable")
        caps = domain_caps or {}

        def cap_of(d):
            return caps.get(d, capacity)

        rank = f.groupby("domain", sort=False).cumcount()
        if stateless:
            if caps:
                mask = rank < f["domain"].map(cap_of)
            else:
                mask = rank < capacity
            collected = f[mask]
            return collected, f[~mask], None
        tokens = tokens or {}
        budgets = {d: int(min(cap_of(d), tokens.get(d, cap_of(d)) + refill))
                   for d in f["domain"].unique()}
        mask = rank < f["domain"].map(budgets)
        collected = f[mask]
        spent = collected.groupby("domain", sort=False).size()
        updated = {}
        for d in f["domain"].unique():
            bal = min(cap_of(d), tokens.get(d, cap_of(d)) + refill)
            updated[d] = bal - float(spent.get(d, 0))
        return collected, f[~mask], updated

    def select(self, frontier: pd.DataFrame) -> tuple[pd.DataFrame, pd.DataFrame]:
        """Split a (seq, url, domain[, priority]) frame into (collected, rest).

        FIFO by ``seq`` within each domain — or, when a ``priority`` column
        is present, highest priority first with seq as the tiebreak (the
        priority-frontier mode; the reference's DomainQueues are the
        priority≡0 special case).  At most the domain's current token
        balance per wave; vectorized (groupby-cumcount, no Python loop over
        rows).  At scale this runs independently per host-hash bucket — a
        domain never spans buckets.
        """
        collected, rest, updated = self.select_frame(
            frontier, self.capacity, self.refill,
            None if self._stateless else self._tokens, self.domain_caps)
        if updated:
            self._tokens.update(updated)
        return collected, rest

    # --- checkpoint ------------------------------------------------------
    def snapshot(self) -> dict:
        return {"capacity": self.capacity, "refill": self.refill,
                "tokens": dict(self._tokens)}

    def restore(self, snap: dict) -> None:
        self.capacity = snap["capacity"]
        self.refill = snap["refill"]
        self._tokens = dict(snap["tokens"])
        self._stateless = self.refill >= self.capacity


def caps_from_delays(delays: dict[str, float], capacity: int,
                     wave_seconds: float = 1.0) -> dict[str, int]:
    """Map robots ``Crawl-delay`` seconds to per-wave cap overrides.

    A wave models one politeness tick of ``wave_seconds``; a host asking
    for delay ``d`` gets ``floor(capacity * wave_seconds / d)`` fetch
    slots per wave, floored at 1 (never starve a host entirely) and
    capped at ``capacity`` (a delay shorter than the tick grants nothing
    extra).
    """
    out = {}
    for host, d in delays.items():
        if d and d > 0:
            out[host] = max(1, min(capacity,
                                   int(capacity * wave_seconds / d)))
    return out
