"""Seed-list reader (S1).

Mirrors `genesis/src/main.rs:142-153`: read the sites file, trim each line,
drop empties, keep raw strings (normalization happens at enqueue).
"""

from __future__ import annotations

__all__ = ["read_seed_file"]


def read_seed_file(path: str) -> list[str]:
    with open(path, encoding="utf-8") as f:
        return [s for s in (line.strip() for line in f) if s]
