"""Bucketed, spillable URL frontier (the 10^10-URL scale tier).

The frontier is partitioned by **host-hash bucket** — a domain never spans
buckets, so politeness selection (``PolitenessPolicy.select``) runs
independently and vectorized per bucket; at cluster scale each bucket (or a
range of buckets) is owned by a worker and the same kernel runs sharded.

Memory discipline: a politeness wave takes at most ``cap`` entries per
domain, FIFO by seq — so only each domain's *oldest* ``head_per_domain``
rows need to stay resident.  When a bucket's frame exceeds ``mem_rows``,
every domain's tail beyond ``head_per_domain`` spills to Parquet
generations under ``spill_dir``; a bucket refills (merge + re-split) when
any spilled domain's resident head runs low.  RAM is therefore
O(domains × head_per_domain) per bucket regardless of total frontier size,
and wave semantics are *identical* to the all-in-memory frontier
(equivalence- and parity-tested, including with spilling forced on).
Priority mode spills too: the resident head keeps each domain's top
``head_per_domain`` rows by (-priority, seq), and the refill guard
generalizes from min-spilled-seq to the best spilled ordering key, so
selection still sees every domain's true top-k.

The reference holds the whole frontier in one process's RAM
(`genesis/src/crawler.rs:4-8`, unbounded `genesis/src/main.rs:164-165`);
this replaces it without changing observable behavior.
"""

from __future__ import annotations

import os
import shutil

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from .filters import _hash64

__all__ = ["BucketedFrontier"]

_COLS = ["seq", "url", "domain"]


class BucketedFrontier:
    def __init__(self, n_buckets: int = 16, spill_dir: str | None = None,
                 mem_rows: int = 1_000_000, head_per_domain: int = 32,
                 cap_hint: int = 5, hot_rows: int = 50_000):
        assert head_per_domain >= 2 * cap_hint, \
            "resident head must cover multiple politeness waves"
        self.n_buckets = n_buckets
        self.spill_dir = spill_dir
        self.mem_rows = mem_rows
        self.head_per_domain = head_per_domain
        self.cap_hint = cap_hint
        # hot-host split (SURVEY §7.4.5): a domain spilling ≥ hot_rows in
        # one event gets its OWN (host-salted) spill files, so its refill
        # is O(domain backlog) instead of O(bucket) — a mega-host no longer
        # forces the whole bucket to merge + re-split every few waves
        self.hot_rows = hot_rows
        self.buckets: dict[int, pd.DataFrame] = {}
        self._spill_gen: dict[int, list[str]] = {}    # bucket -> file queue
        self._spilled_domains: dict[int, set] = {}    # bucket -> domains
        # best (smallest) spilled ordering key per bucket; key = (-prio, seq)
        self._spill_best: dict[int, tuple] = {}
        # per-(bucket, hot-domain) spill files + best keys
        self._dom_gen: dict[tuple[int, str], list[str]] = {}
        self._dom_best: dict[tuple[int, str], tuple] = {}
        self._gen_counter = 0
        self.total = 0
        # exact rows per bucket (resident + spilled) — the per-partition
        # "frontier cursor" metric that rides into every checkpoint
        self._rows: dict[int, int] = {}

    # -- helpers -----------------------------------------------------------
    def _bucket_of(self, domains: list[str]):
        return (_hash64(domains) % self.n_buckets).astype(int)

    def bucket_of(self, domains: list[str]):
        """Public partition function: domain -> frontier bucket id."""
        return self._bucket_of(domains)

    def bucket_sizes(self) -> dict[int, int]:
        """Rows per bucket (resident + spilled), zero entries omitted."""
        return {b: n for b, n in sorted(self._rows.items()) if n > 0}

    def _cols(self, df: pd.DataFrame) -> list[str]:
        return _COLS + (["priority"] if "priority" in df.columns else [])

    # -- API ---------------------------------------------------------------
    def add(self, df: pd.DataFrame) -> None:
        """Append frontier rows (seq, url, domain[, priority])."""
        if len(df) == 0:
            return
        b_of = self._bucket_of(df["domain"].tolist())
        for b in sorted(set(b_of)):
            part = df[b_of == b]
            cur = self.buckets.get(b)
            merged = (part if cur is None or len(cur) == 0
                      else pd.concat([cur, part], ignore_index=True))
            self.buckets[b] = merged.reset_index(drop=True)
            self._rows[b] = self._rows.get(b, 0) + len(part)
            self._maybe_spill(b)
        self.total += len(df)

    def __len__(self) -> int:
        return self.total

    def select(self, policy) -> pd.DataFrame:
        """One politeness wave across all buckets; returns the collected
        frame ordered by ([priority desc,] seq asc)."""
        collected = []
        for b in sorted(self.buckets):
            self._maybe_refill(b)
            frame = self.buckets.get(b)
            if frame is None or len(frame) == 0:
                continue
            got, rest = policy.select(frame)
            collected.append(got)
            self._rows[b] = self._rows.get(b, 0) - len(got)
            self.buckets[b] = rest.reset_index(drop=True)
        if not collected:
            return pd.DataFrame(columns=_COLS)
        out = pd.concat(collected, ignore_index=True)
        if "priority" in out.columns:
            out = out.sort_values(["priority", "seq"],
                                  ascending=[False, True], kind="stable")
        else:
            out = out.sort_values("seq", kind="stable")
        self.total -= len(out)
        return out.reset_index(drop=True)

    # -- spill -------------------------------------------------------------
    @staticmethod
    def _order(frame: pd.DataFrame) -> pd.DataFrame:
        if "priority" in frame.columns:
            return frame.sort_values(["priority", "seq"],
                                     ascending=[False, True], kind="stable")
        return frame.sort_values("seq", kind="stable")

    @staticmethod
    def _best_key(tail: pd.DataFrame) -> tuple:
        if "priority" in tail.columns:
            negp = -tail["priority"]
            best_negp = negp.min()
            best_seq = int(tail.loc[negp == best_negp, "seq"].min())
            return (float(best_negp), best_seq)
        return (0.0, int(tail["seq"].min()))

    def _write_gen(self, subdir: str, tail: pd.DataFrame) -> str:
        path = os.path.join(self.spill_dir, subdir)
        os.makedirs(path, exist_ok=True)
        fname = os.path.join(path, f"gen-{self._gen_counter:06d}.parquet")
        self._gen_counter += 1
        pq.write_table(pa.Table.from_pandas(tail[self._cols(tail)],
                                            preserve_index=False), fname)
        return fname

    def _maybe_spill(self, b: int) -> None:
        frame = self.buckets[b]
        if self.spill_dir is None or len(frame) <= self.mem_rows:
            return
        frame = self._order(frame)
        rank = frame.groupby("domain", sort=False).cumcount()
        head = frame[rank < self.head_per_domain]
        tail = frame[rank >= self.head_per_domain]
        if len(tail) == 0:
            self.buckets[b] = head.reset_index(drop=True)
            return
        # hot-host split: domains with a huge tail spill to their own files
        counts = tail["domain"].value_counts()
        hot = set(counts[counts >= self.hot_rows].index)
        if hot:
            hot_mask = tail["domain"].isin(hot)
            for d, g in tail[hot_mask].groupby("domain", sort=False):
                import hashlib as _h
                tag = _h.md5(d.encode("utf-8")).hexdigest()[:12]
                fname = self._write_gen(f"bucket={b}/host-{tag}", g)
                key = (b, d)
                self._dom_gen.setdefault(key, []).append(fname)
                tbest = self._best_key(g)
                prev = self._dom_best.get(key)
                self._dom_best[key] = (tbest if prev is None
                                       else min(prev, tbest))
            tail = tail[~hot_mask]
        if len(tail):
            fname = self._write_gen(f"bucket={b}", tail)
            self._spill_gen.setdefault(b, []).append(fname)
            self._spilled_domains.setdefault(b, set()).update(
                tail["domain"].unique())
            tbest = self._best_key(tail)
            prev = self._spill_best.get(b)
            self._spill_best[b] = tbest if prev is None else min(prev, tbest)
        self.buckets[b] = head.reset_index(drop=True)

    def _maybe_refill(self, b: int) -> None:
        """Reload spilled generations when a spilled domain's resident head
        can no longer cover the next politeness wave (FIFO correctness).

        Shared generations reload as a whole bucket merge; hot domains'
        own generations reload independently (O(domain), the §7.4.5
        frontier split)."""
        self._refill_shared(b)
        self._refill_hot(b)

    def _refill_shared(self, b: int) -> None:
        gens = self._spill_gen.get(b)
        if not gens:
            return
        frame = self.buckets.get(b)
        spilled = self._spilled_domains.get(b, set())
        if frame is not None and len(frame) and spilled:
            # ordering safety: only rows that provably outrank every spilled
            # row (key (-prio, seq) strictly smaller than the best spilled
            # key) can cover the next wave — later/lower-rank arrivals must
            # not mask better spilled entries.
            b0, b1 = self._spill_best[b]
            if "priority" in frame.columns:
                negp = -frame["priority"]
                mask = (negp < b0) | ((negp == b0) & (frame["seq"] < b1))
            else:
                # FIFO frames always spill with key (0, seq)
                mask = frame["seq"] < b1
            counts = frame[mask]["domain"].value_counts()
            low = any(counts.get(d, 0) < self.cap_hint for d in spilled)
        else:
            low = True
        if not low:
            return
        parts = [] if frame is None or len(frame) == 0 else [frame]
        for fname in gens:
            parts.append(pq.read_table(fname).to_pandas())
            os.remove(fname)
        self._spill_gen.pop(b, None)
        self._spilled_domains.pop(b, None)
        self._spill_best.pop(b, None)
        merged = (self._order(pd.concat(parts, ignore_index=True))
                  .reset_index(drop=True))
        self.buckets[b] = merged
        self._maybe_spill(b)

    def _refill_hot(self, b: int) -> None:
        """Per-hot-domain refill: load ONLY that domain's generations when
        its resident head can't cover the next wave."""
        keys = [k for k in self._dom_gen if k[0] == b]
        if not keys:
            return
        frame = self.buckets.get(b)
        to_load = []
        for key in keys:
            d = key[1]
            b0, b1 = self._dom_best[key]
            low = True
            if frame is not None and len(frame):
                fd = frame[frame["domain"] == d]
                if "priority" in fd.columns:
                    negp = -fd["priority"]
                    mask = (negp < b0) | ((negp == b0) & (fd["seq"] < b1))
                else:
                    mask = fd["seq"] < b1
                low = int(mask.sum()) < self.cap_hint
            if low:
                to_load.append(key)
        if not to_load:
            return
        parts = [] if frame is None or len(frame) == 0 else [frame]
        for key in to_load:
            for fname in self._dom_gen.pop(key):
                parts.append(pq.read_table(fname).to_pandas())
                os.remove(fname)
            self._dom_best.pop(key)
        merged = (self._order(pd.concat(parts, ignore_index=True))
                  .reset_index(drop=True))
        self.buckets[b] = merged
        self._maybe_spill(b)

    def select_distributed(self, policy) -> pd.DataFrame:
        """Politeness wave with per-bucket selection as parallel Ray tasks.

        The cluster-scale path for frontiers whose bucket count (not row
        count — politeness caps each bucket's *output*) makes driver-side
        iteration the bottleneck: each bucket's vectorized select runs as
        its own task.  Token-bucket state RIDES WITH the bucket: each task
        receives only its bucket's domains' balances (a domain never spans
        buckets, so the partition is exact) and ships the updated balances
        back with the result — semantics identical to :meth:`select`
        (equivalence- and crawl-parity-tested, stateless and stateful).
        """
        import ray

        from .politeness import PolitenessPolicy

        cap, refill = policy.capacity, policy.refill
        stateless = policy._stateless
        all_caps = policy.domain_caps

        @ray.remote(num_cpus=0.5)
        def _sel(frame: pd.DataFrame, tokens: dict | None,
                 caps: dict | None):
            got, rest, updated = PolitenessPolicy.select_frame(
                frame, cap, refill, tokens, caps)
            return got, rest.reset_index(drop=True), updated

        order = []
        futs = []
        for b in sorted(self.buckets):
            self._maybe_refill(b)
            frame = self.buckets.get(b)
            if frame is None or len(frame) == 0:
                continue
            order.append(b)
            doms = frame["domain"].unique()
            if stateless:
                toks = None
            else:  # only this bucket's domains' balances travel
                toks = {d: policy._tokens[d] for d in doms
                        if d in policy._tokens}
            # likewise only this bucket's cap overrides
            caps = ({d: all_caps[d] for d in doms if d in all_caps}
                    if all_caps else None)
            futs.append(_sel.remote(frame, toks, caps))
        collected = []
        for b, (got, rest, updated) in zip(order, ray.get(futs)):
            collected.append(got)
            self._rows[b] = self._rows.get(b, 0) - len(got)
            self.buckets[b] = rest
            if updated:
                policy._tokens.update(updated)
        if not collected:
            return pd.DataFrame(columns=_COLS)
        out = pd.concat(collected, ignore_index=True)
        if "priority" in out.columns:
            out = out.sort_values(["priority", "seq"],
                                  ascending=[False, True], kind="stable")
        else:
            out = out.sort_values("seq", kind="stable")
        self.total -= len(out)
        return out.reset_index(drop=True)

    # -- checkpoint --------------------------------------------------------
    def to_frame(self) -> pd.DataFrame:
        """Full frontier (memory + spilled) as one frame, seq-ordered."""
        parts = [f for f in self.buckets.values() if len(f)]
        for gens in self._spill_gen.values():
            parts.extend(pq.read_table(f).to_pandas() for f in gens)
        for gens in self._dom_gen.values():
            parts.extend(pq.read_table(f).to_pandas() for f in gens)
        if not parts:
            return pd.DataFrame(columns=_COLS)
        return (pd.concat(parts, ignore_index=True)
                .sort_values("seq", kind="stable").reset_index(drop=True))

    @classmethod
    def from_frame(cls, df: pd.DataFrame, **kw) -> "BucketedFrontier":
        f = cls(**kw)
        f.add(df)
        return f

    def clear_spill(self) -> None:
        if self.spill_dir and os.path.isdir(self.spill_dir):
            shutil.rmtree(self.spill_dir, ignore_errors=True)
