"""Approximate-membership filters for the URL-seen set (north-rule components).

The reference keeps one exact in-process ``HashSet`` (`genesis/src/main.rs:159`);
at the 10^10-URL target that is ~TBs of strings, so the rebuild layers:

- ``CuckooFilter`` — 16-bit fingerprints, 4-slot buckets, partial-key cuckoo
  hashing (Fan et al., "Cuckoo Filter: Practically Better Than Bloom",
  CoNEXT 2014): ~2.4 GB per 10^9 urls at <0.1% FP, supports deletion and
  cheap binary snapshots.  One per seen shard (hot path).
- ``BloomFilter`` — classic k-hash bitset; used as the *cold-shard fallback*
  and as the driver-broadcast pre-filter that drops already-seen candidate
  links inside ``map_batches`` before they reach the shard actors.

Both are numpy-backed, vectorized for batch lookups, and serialize to bytes
for the per-wave checkpoint manifest.
"""

from __future__ import annotations

import hashlib

import numpy as np

__all__ = ["BloomFilter", "CuckooFilter"]

_SEED1 = np.uint64(0x9E3779B97F4A7C15)
_SEED2 = np.uint64(0xC2B2AE3D27D4EB4F)


def _hash64(items: list[str] | np.ndarray) -> np.ndarray:
    """Stable 64-bit hashes (md5-derived — deterministic across processes)."""
    out = np.empty(len(items), dtype=np.uint64)
    for i, s in enumerate(items):
        out[i] = int.from_bytes(
            hashlib.md5(s.encode("utf-8")).digest()[:8], "little")
    return out


def _mix(h: np.ndarray, seed: np.uint64) -> np.ndarray:
    h = (h ^ (h >> np.uint64(33))) * seed
    return h ^ (h >> np.uint64(29))


class BloomFilter:
    """k-hash bitset; double hashing g_i = h1 + i*h2 (Kirsch–Mitzenmacher)."""

    def __init__(self, capacity: int, fp_rate: float = 1e-3):
        n_bits = int(-capacity * np.log(fp_rate) / (np.log(2) ** 2))
        self.n_bits = max(64, 1 << int(np.ceil(np.log2(max(64, n_bits)))))
        self.k = max(1, int(round(np.log(2) * self.n_bits / max(1, capacity))))
        self.k = min(self.k, 12)
        self.bits = np.zeros(self.n_bits // 64, dtype=np.uint64)
        self.count = 0

    def _positions(self, h64: np.ndarray) -> np.ndarray:
        h1 = _mix(h64, _SEED1)
        h2 = _mix(h64, _SEED2) | np.uint64(1)
        i = np.arange(self.k, dtype=np.uint64)[None, :]
        return (h1[:, None] + i * h2[:, None]) & np.uint64(self.n_bits - 1)

    def add_hashes(self, h64: np.ndarray) -> None:
        pos = self._positions(h64).ravel()
        np.bitwise_or.at(self.bits, (pos >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (pos & np.uint64(63)))
        self.count += len(h64)

    def contains_hashes(self, h64: np.ndarray) -> np.ndarray:
        if len(h64) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(h64)
        words = self.bits[(pos >> np.uint64(6)).astype(np.int64)]
        hit = (words >> (pos & np.uint64(63))) & np.uint64(1)
        return hit.all(axis=1).astype(bool)

    def add(self, items: list[str]) -> None:
        self.add_hashes(_hash64(items))

    def contains(self, items: list[str]) -> np.ndarray:
        return self.contains_hashes(_hash64(items))

    # --- snapshot -------------------------------------------------------
    def to_bytes(self) -> bytes:
        head = np.array([self.n_bits, self.k, self.count], dtype=np.int64)
        return head.tobytes() + self.bits.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "BloomFilter":
        head = np.frombuffer(blob[:24], dtype=np.int64)
        obj = cls.__new__(cls)
        obj.n_bits, obj.k, obj.count = int(head[0]), int(head[1]), int(head[2])
        obj.bits = np.frombuffer(blob[24:], dtype=np.uint64).copy()
        return obj


class CuckooFilter:
    """Partial-key cuckoo filter: 4-way buckets of 16-bit fingerprints."""

    SLOTS = 4
    MAX_KICKS = 500

    def __init__(self, capacity: int):
        n_buckets = 1 << int(np.ceil(np.log2(max(8, capacity // self.SLOTS * 2))))
        self.n_buckets = n_buckets
        self.table = np.zeros((n_buckets, self.SLOTS), dtype=np.uint16)
        self.count = 0
        self._rng = np.random.Generator(np.random.PCG64(7))

    def _fp_index(self, h64: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        fp = (h64 & np.uint64(0xFFFF)).astype(np.uint16)
        fp = np.where(fp == 0, np.uint16(1), fp)  # 0 marks empty slots
        i1 = (_mix(h64, _SEED1) & np.uint64(self.n_buckets - 1)).astype(np.int64)
        i2 = self._alt_index(i1, fp)
        return fp, i1, i2

    def _alt_index(self, idx: np.ndarray, fp: np.ndarray) -> np.ndarray:
        fph = _mix(fp.astype(np.uint64), _SEED2)
        return ((idx.astype(np.uint64) ^ fph) & np.uint64(self.n_buckets - 1)
                ).astype(np.int64)

    def contains_hashes(self, h64: np.ndarray) -> np.ndarray:
        if len(h64) == 0:
            return np.zeros(0, dtype=bool)
        fp, i1, i2 = self._fp_index(h64)
        hit1 = (self.table[i1] == fp[:, None]).any(axis=1)
        hit2 = (self.table[i2] == fp[:, None]).any(axis=1)
        return hit1 | hit2

    def add_hashes(self, h64: np.ndarray) -> int:
        """Insert each hash; returns number successfully inserted."""
        fp_arr, i1_arr, i2_arr = self._fp_index(h64)
        ok = 0
        for fp, i1, i2 in zip(fp_arr, i1_arr, i2_arr):
            if self._insert_one(np.uint16(fp), int(i1), int(i2)):
                ok += 1
        return ok

    def _insert_one(self, fp: np.uint16, i1: int, i2: int) -> bool:
        for idx in (i1, i2):
            row = self.table[idx]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                self.count += 1
                return True
        idx = i1 if self._rng.random() < 0.5 else i2
        for _ in range(self.MAX_KICKS):
            slot = int(self._rng.integers(0, self.SLOTS))
            fp, self.table[idx, slot] = self.table[idx, slot], fp
            idx = int(self._alt_index(np.array([idx]), np.array([fp]))[0])
            row = self.table[idx]
            empty = np.nonzero(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                self.count += 1
                return True
        return False  # table full — caller must grow / spill

    def contains(self, items: list[str]) -> np.ndarray:
        return self.contains_hashes(_hash64(items))

    def add(self, items: list[str]) -> int:
        return self.add_hashes(_hash64(items))

    # --- snapshot -------------------------------------------------------
    def to_bytes(self) -> bytes:
        head = np.array([self.n_buckets, self.count], dtype=np.int64)
        return head.tobytes() + self.table.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "CuckooFilter":
        head = np.frombuffer(blob[:16], dtype=np.int64)
        obj = cls.__new__(cls)
        obj.n_buckets, obj.count = int(head[0]), int(head[1])
        obj.table = np.frombuffer(blob[16:], dtype=np.uint16).reshape(
            obj.n_buckets, cls.SLOTS).copy()
        obj._rng = np.random.Generator(np.random.PCG64(7))
        return obj
