#!/usr/bin/env python
"""Generate a tie-boundary scale-factor dir for the strict oracle check.

The driver's round-3 ``tpch_q18ish`` red was a rounding-MODE divergence
(pyarrow half-to-even vs DuckDB half-away-from-zero) that the local
testdata can never exercise: every money/quantity column there has a zero
fractional part at its scaling grid, so no ``round`` call ever sees a tie.
This script copies an sf dir and injects EXACT binary-representable ties:

- ``l_quantity``      gains ``x.5`` values (ties at integer rounding)
- ``l_extendedprice`` / ``l_discount`` / ``*_acctbal`` / ``events.value``
  gain ``x.125`` / ``x.375`` / ``x.625`` / ``x.875`` fractional parts —
  eighths are exact in float64, so ``v * 100`` lands on an exact ``k.5``
  and centi scaling sees a true tie (a ``.005`` decimal would NOT: its
  float64 neighbour is off the tie point).

Usage:  python scripts/make_tie_sf.py [--src sf0.001] [--dst /tmp/...]
then:   python scripts/check_oracle.py --sf <dst> [names...]
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# fractional parts that are exact in float64 AND land on exact .5 ties
# after ×100 (eighths) or ×1 (halves)
EIGHTHS = np.array([0.125, 0.375, 0.625, 0.875])


def _inject(col: np.ndarray, rng: np.random.Generator,
            halves: bool) -> np.ndarray:
    """Replace the fractional part of ~half the rows with tie fractions."""
    out = col.astype(np.float64).copy()
    pick = rng.random(len(out)) < 0.5
    base = np.floor(np.abs(out))
    frac = (np.where(rng.random(len(out)) < 0.5, 0.5, 0.0) if halves
            else rng.choice(EIGHTHS, size=len(out)))
    out[pick] = (np.sign(out)[pick] * (base[pick] + frac[pick]))
    return out


def make_tie_sf(src: str, dst: str, seed: int = 7) -> str:
    os.makedirs(dst, exist_ok=True)
    rng = np.random.default_rng(seed)
    plans = {
        "lineitem": {"l_quantity": True, "l_extendedprice": False,
                     "l_discount": False, "l_tax": False},
        "events": {"value": False},
        "customer": {"c_acctbal": False},
        "supplier": {"s_acctbal": False},
    }
    for t in TABLES:
        tab = pq.read_table(os.path.join(src, f"{t}.parquet"))
        for col, halves in plans.get(t, {}).items():
            vals = _inject(tab[col].to_numpy(zero_copy_only=False),
                           rng, halves)
            i = tab.schema.get_field_index(col)
            tab = tab.set_column(i, col, pa.array(vals, pa.float64()))
        pq.write_table(tab, os.path.join(dst, f"{t}.parquet"))
    return dst


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.001")
    ap.add_argument("--dst", default="/tmp/vyntr_tie_sf")
    args = ap.parse_args()
    print(make_tie_sf(args.src, args.dst))
