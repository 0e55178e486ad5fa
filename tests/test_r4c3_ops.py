"""Randomized (seeded) brute-force parity for the round-4c operators:
token entropy, OHLC bars, IQR outlier audit, degree histogram,
Jaccard rerank.

The DuckDB oracle rows run over the generated tables; these tests hit
adversarial shapes — empty/None texts, ts ties forcing the id
tie-break, negative values, singleton groups — against row-at-a-time
references.
"""

import math
from collections import Counter

import numpy as np
import pandas as pd
import pytest

VOCAB = ["merge", "window", "spark", "hash", "sort", "join", "scan",
         "batch", "row", "key"]


def _texts(rng, n):
    out = []
    for i in range(n):
        if i % 17 == 0:
            out.append("")
        elif i % 23 == 0:
            out.append(None)
        else:
            k = int(rng.integers(1, 40))
            out.append(" ".join(rng.choice(VOCAB, k)))
    return out


@pytest.mark.usefixtures("ray_session")
def test_token_entropy_matches_bruteforce():
    import ray.data as rd

    from vyntr_ray.stages.text_analysis import _GRAM_TOKEN, token_entropy

    rng = np.random.Generator(np.random.PCG64(11))
    df = pd.DataFrame({"doc_id": np.arange(200, dtype=np.int64),
                       "text": _texts(rng, 200)})

    got = (token_entropy(rd.from_pandas(df.copy()))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))

    def ref(t):
        ws = _GRAM_TOKEN.findall((t or "").lower())
        n = len(ws)
        if n == 0:
            return 0, 0
        L = lambda k: math.floor(math.log(k) * 1_000_000)  # noqa: E731
        return n, n * L(n) - sum(c * L(c) for c in Counter(ws).values())

    exp = pd.DataFrame([(i, *ref(t)) for i, t in zip(df["doc_id"],
                                                     df["text"])],
                       columns=["doc_id", "n_tokens", "entropy_micro"])
    pd.testing.assert_frame_equal(got.astype("int64"), exp.astype("int64"))


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("seed", [3, 9])
def test_ohlc_bars_matches_bruteforce(seed):
    import ray.data as rd

    from vyntr_ray.stages.windows import ohlc_bars

    rng = np.random.Generator(np.random.PCG64(seed))
    n = 700
    # coarse ts grid -> many exact-ts ties exercising the id tie-break;
    # values signed to exercise half-away rounding on negatives
    ts = pd.to_datetime(
        rng.integers(0, 5 * 86_400, n) * 1_000_000, unit="us")
    df = pd.DataFrame({
        "event_id": rng.permutation(n).astype("int64"),
        "ts": ts,
        "event_type": rng.choice(["a", "b", "c"], n),
        "value": np.round(rng.normal(0, 50, n), 2),
    })

    got = (ohlc_bars(rd.from_pandas(df.copy()), key_col="event_type")
           .to_pandas().sort_values(["event_type", "bucket"])
           .reset_index(drop=True))

    b = df.copy()
    b["us"] = b["ts"].astype("datetime64[us]").astype("int64")
    b["bucket"] = b["us"] // 86_400_000_000
    b["vc"] = np.round(b["value"] * 100).astype("int64")  # .5 never hit
    b = b.sort_values(["us", "event_id"], kind="mergesort")
    exp = (b.groupby(["event_type", "bucket"], sort=True)
           .agg(open_centi=("vc", "first"), high_centi=("vc", "max"),
                low_centi=("vc", "min"), close_centi=("vc", "last"),
                n=("vc", "size"), sum_centi=("vc", "sum"))
           .reset_index())
    exp = exp[["event_type", "bucket", "open_centi", "high_centi",
               "low_centi", "close_centi", "n", "sum_centi"]]
    for c in exp.columns.drop("event_type"):
        exp[c] = exp[c].astype("int64")
    pd.testing.assert_frame_equal(got, exp)


@pytest.mark.usefixtures("ray_session")
def test_iqr_outliers_matches_bruteforce():
    import ray.data as rd

    from vyntr_ray.stages.dataset_tools import iqr_outliers

    rng = np.random.Generator(np.random.PCG64(5))
    n = 900
    df = pd.DataFrame({
        "lang": rng.choice(["en", "de", "fr", "xx"],
                           n, p=[0.5, 0.3, 0.198, 0.002]),
        "n_chars": rng.integers(0, 10_000, n).astype("int64"),
    })

    got = (iqr_outliers(rd.from_pandas(df.copy()), "lang", "n_chars")
           .to_pandas().sort_values("lang").reset_index(drop=True))

    rows = []
    for k, g in df.groupby("lang"):
        v = np.sort(g["n_chars"].to_numpy())
        m = len(v)
        q1 = int(v[min(m - 1, max(0, math.ceil(0.25 * m) - 1))])
        q3 = int(v[min(m - 1, max(0, math.ceil(0.75 * m) - 1))])
        lo2, hi2 = 5 * q1 - 3 * q3, 5 * q3 - 3 * q1
        v2 = 2 * g["n_chars"].to_numpy()
        rows.append((k, lo2, hi2, m, int(((v2 < lo2) | (v2 > hi2)).sum())))
    exp = pd.DataFrame(rows, columns=["lang", "lo2", "hi2", "n",
                                      "n_outliers"])
    for c in exp.columns.drop("lang"):
        exp[c] = exp[c].astype("int64")
    pd.testing.assert_frame_equal(got, exp)


@pytest.mark.usefixtures("ray_session")
def test_degree_histogram_matches_bruteforce():
    import ray.data as rd

    from vyntr_ray.stages.graph import degree_histogram

    rng = np.random.Generator(np.random.PCG64(13))
    e = {(int(a), int(b)) for a, b in rng.integers(0, 60, (500, 2))
         if a < b}
    df = pd.DataFrame(sorted(e), columns=["u", "v"]).astype("int64")

    got = (degree_histogram(rd.from_pandas(df.copy()))
           .to_pandas().sort_values("degree").reset_index(drop=True))

    deg = Counter()
    for a, b in e:
        deg[a] += 1
        deg[b] += 1
    hist = Counter(deg.values())
    exp = pd.DataFrame(sorted(hist.items()),
                       columns=["degree", "n_nodes"]).astype("int64")
    pd.testing.assert_frame_equal(got.astype("int64"), exp)


@pytest.mark.usefixtures("ray_session")
def test_jaccard_rerank_matches_bruteforce():
    import ray.data as rd

    from vyntr_ray.stages.search_query import jaccard_rerank

    rng = np.random.Generator(np.random.PCG64(21))
    df = pd.DataFrame({"doc_id": np.arange(300, dtype=np.int64),
                       "text": _texts(rng, 300)})
    terms = ["merge", "window", "hash"]

    got = (jaccard_rerank(rd.from_pandas(df.copy()), terms, k=15)
           .to_pandas().sort_values(["doc_id"]).reset_index(drop=True))

    qset = set(terms)
    cand = []
    for i, t in zip(df["doc_id"], df["text"]):
        toks = set((t or "").lower().split())
        inter = len(qset & toks)
        if inter:
            uni = len(toks) + len(qset) - inter
            cand.append((int(i), inter, uni, inter * 1_000_000 // uni))
    cand.sort(key=lambda r: (-r[3], r[0]))
    exp = (pd.DataFrame(cand[:15], columns=["doc_id", "inter", "uni",
                                            "score_micro"])
           .sort_values("doc_id").reset_index(drop=True).astype("int64"))
    pd.testing.assert_frame_equal(got.astype("int64"), exp)
