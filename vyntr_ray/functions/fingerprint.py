"""Deterministic per-proxy request fingerprint (M14).

Re-implements the observable behavior of `genesis/src/fingerprint.rs:9-88`:
a per-proxy-IP *seeded* RNG picks a user agent from weighted desktop/mobile
tables (57.4% / 42.6%, `fingerprint.rs:57-66`) and a referrer — the origin
of the target url, dropped 10% of the time and never for the root path
(`fingerprint.rs:68-85`).  The exact UA strings are data; a representative
public table stands in (the reference's long tables are not copied).
Determinism contract: same (ip, url) → same fingerprint, across processes.
"""

from __future__ import annotations

import hashlib

import numpy as np

__all__ = ["RequestFingerprint", "DESKTOP_AGENTS", "MOBILE_AGENTS"]

DESKTOP_AGENTS: list[tuple[str, float]] = [
    ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) Chrome/124.0", 0.55),
    ("Mozilla/5.0 (Macintosh; Intel Mac OS X 14_4) Safari/605.1.15", 0.20),
    ("Mozilla/5.0 (X11; Linux x86_64) Firefox/125.0", 0.15),
    ("Mozilla/5.0 (Windows NT 10.0; Win64; x64) Edg/124.0", 0.10),
]
MOBILE_AGENTS: list[tuple[str, float]] = [
    ("Mozilla/5.0 (iPhone; CPU iPhone OS 17_4 like Mac OS X) Safari", 0.5),
    ("Mozilla/5.0 (Linux; Android 14) Chrome/124.0 Mobile", 0.4),
    ("Mozilla/5.0 (iPad; CPU OS 17_4 like Mac OS X) Safari", 0.1),
]
_DESKTOP_SHARE = 0.574  # fingerprint.rs:59


def _weighted_pick(rng: np.random.Generator,
                   table: list[tuple[str, float]]) -> str:
    weights = np.array([w for _, w in table])
    idx = rng.choice(len(table), p=weights / weights.sum())
    return table[int(idx)][0]


class RequestFingerprint:
    """Deterministic given (ip, url) — the reference seeds its RNG from the
    proxy ip so each proxy presents a stable identity."""

    def __init__(self, ip: str, url: str):
        seed = int.from_bytes(
            hashlib.md5(ip.encode("utf-8")).digest()[:8], "little")
        rng = np.random.Generator(np.random.PCG64(seed))
        if rng.random() < _DESKTOP_SHARE:
            self.user_agent = _weighted_pick(rng, DESKTOP_AGENTS)
        else:
            self.user_agent = _weighted_pick(rng, MOBILE_AGENTS)
        self.referrer: str | None = None
        after = url.split("://", 1)
        if len(after) == 2:
            scheme, rest = after[0], after[1]
            host = rest.split("/", 1)[0]
            path = rest[len(host):]
            is_root = path in ("", "/")
            if not is_root and rng.random() >= 0.10:  # 10% dropped
                self.referrer = f"{scheme}://{host}/"
