"""Fetch retry ladder: tunnel retries → proxy-rotation fallback (S4).

The reference fetches through a tunnel client and, on failure, retries up
to ``FETCH_RETRIES`` times before falling back to a rotating proxy client
(`genesis/src/main.rs:329-383`, `genesis/src/proxy.rs:27-76`).  The sandbox
has no network, so the *transport* is modeled: a deterministic
``fail_fn(url, channel, attempt) -> bool`` decides whether one attempt
fails, and :class:`RetryLadder` walks the reference's ladder over it.  The
ladder object is picklable and pure — the same outcomes compute inside Ray
fetch tasks and inside the parity simulator.

``HashFlaky`` is the standard failure injection: attempt-level failures
from an md5 over (url, channel, attempt), so a url that fails the tunnel
deterministically may still succeed via a proxy — exercising every rung.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

__all__ = ["RetryLadder", "HashFlaky"]


@dataclass(frozen=True)
class HashFlaky:
    """Deterministic attempt-failure injection.

    ``tunnel_rate`` / ``proxy_rate`` are per-attempt failure probabilities
    realized by hashing (url, channel, attempt) — stable across processes.
    """
    tunnel_rate: float = 0.5
    proxy_rate: float = 0.2

    def __call__(self, url: str, channel: str, attempt: int) -> bool:
        rate = self.tunnel_rate if channel == "tunnel" else self.proxy_rate
        h = hashlib.md5(f"{url}|{channel}|{attempt}".encode()).digest()
        return int.from_bytes(h[:4], "big") / 2**32 < rate


@dataclass(frozen=True)
class RetryLadder:
    """`main.rs:329-383` semantics: N tunnel tries, then the proxy rotation.

    ``outcome(url) -> (ok, attempts, via)``; with no ``fail_fn`` every url
    succeeds on the first tunnel attempt (the reference's happy path).
    """
    tunnel_attempts: int = 2
    proxies: tuple = ("proxy-0", "proxy-1", "proxy-2")
    fail_fn: object = None   # (url, channel, attempt) -> failed?

    def outcome(self, url: str) -> tuple[bool, int, str]:
        attempts = 0
        for a in range(1, self.tunnel_attempts + 1):
            attempts += 1
            if self.fail_fn is None or not self.fail_fn(url, "tunnel", a):
                return True, attempts, "tunnel"
        for p in self.proxies:
            attempts += 1
            if not self.fail_fn(url, p, 1):
                return True, attempts, p
        return False, attempts, "exhausted"

    def ok(self, url: str) -> bool:
        return self.outcome(url)[0]
