"""Proxy list parsing + round-robin rotation (S2/T6).

Mirrors the observable behavior of `genesis/src/proxy.rs:33-90`: lines of
``host:port:user:pass`` become proxy configs (malformed lines are skipped),
and rotation is a monotonically increasing counter modulo the pool size.
The per-proxy HTTP client of the reference is out of scope in the sandbox
(no network); the rotation state is what the fetch actor pool would hold.
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass

__all__ = ["Proxy", "parse_proxy_list", "read_proxy_file", "ProxyRotation"]


@dataclass(frozen=True)
class Proxy:
    host: str
    port: int
    user: str
    password: str

    @property
    def ip(self) -> str:
        return self.host

    @property
    def url(self) -> str:
        return f"http://{self.user}:{self.password}@{self.host}:{self.port}"


def parse_proxy_list(lines: list[str]) -> list[Proxy]:
    out = []
    for line in lines:
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        parts = line.split(":")
        if len(parts) != 4 or not parts[1].isdigit():
            continue  # reference skips malformed entries
        out.append(Proxy(parts[0], int(parts[1]), parts[2], parts[3]))
    return out


def read_proxy_file(path: str) -> list[Proxy]:
    with open(path, encoding="utf-8") as f:
        return parse_proxy_list(f.readlines())


class ProxyRotation:
    """Round-robin over the pool (`genesis/src/proxy.rs:83-90`)."""

    def __init__(self, proxies: list[Proxy]):
        self.proxies = list(proxies)
        self._counter = itertools.count()

    def get_next_proxy(self) -> Proxy | None:
        if not self.proxies:
            return None
        return self.proxies[next(self._counter) % len(self.proxies)]
