"""Text analysis for large-scale training-data pipelines.

First-class additions beyond the reference (per the build brief): language
identification, quality scoring, token counting, document fingerprinting.
Token counting generalizes the reference's tiktoken pricing pass
(`genesis/tools/embedding/price.py:21-56`, M15/A3); the rest are standard
web-corpus curation operators (C4/CCNet-style heuristics from public
literature).  All vectorized ``map_batches`` stages; language ID is an
actor-pool stage (stopword tables built once per actor).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..rounding import iround_half_away, round_half_away

__all__ = ["token_stats_batch", "token_totals", "quality_batch",
           "token_diversity",
           "fingerprint_batch", "LangId", "lang_id",
           "benchmark_ngrams", "contamination_report", "decontaminate",
           "repetition_batch", "unigram_fit", "unigram_logprob",
           "normalize_batch", "normalize_text", "dsir_weights",
           "group_zscores", "readability", "token_entropy",
           "novelty_scores", "distinctive_terms", "zipf_fit",
           "compression_ratio", "tfidf_topk", "bigram_logprob",
           "pmi_pairs"]

_WS_TOKEN = re.compile(r"\S+")
# BPE-ish word/number/symbol splitter (public GPT-2-style pattern, simplified)
_BPE_TOKEN = re.compile(r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]")


def token_stats_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Add ws_tokens (whitespace) and bpe_tokens (regex-BPE-ish) counts."""
    texts = batch[text_col].to_pylist()
    ws = [len(_WS_TOKEN.findall(t or "")) for t in texts]
    bpe = [len(_BPE_TOKEN.findall(t or "")) for t in texts]
    return (batch
            .append_column("ws_tokens", pa.array(ws, pa.int64()))
            .append_column("bpe_tokens", pa.array(bpe, pa.int64())))


def token_totals(ds, text_col: str = "text", group_col: str = "lang"):
    """A3: token totals per group (partial per batch → small groupby)."""
    counted = ds.map_batches(
        lambda b: token_stats_batch(b, text_col), batch_format="pyarrow")

    def partial(b: pa.Table) -> pa.Table:
        df = b.select([group_col, "ws_tokens", "bpe_tokens"]).to_pandas()
        agg = df.groupby(group_col, sort=False).sum().reset_index()
        return pa.Table.from_pandas(agg, preserve_index=False)

    from ray.data.aggregate import Sum
    return (counted.map_batches(partial, batch_format="pyarrow")
            .groupby(group_col)
            .aggregate(Sum("ws_tokens", alias_name="total_ws_tokens"),
                       Sum("bpe_tokens", alias_name="total_bpe_tokens")))


def quality_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """C4-style quality signals: lengths, word stats, punctuation density.

    All ratios ×1e6 and floored to int so the DuckDB oracle compares
    exactly (no float hashing).
    """
    texts = pd.Series(batch[text_col].to_pylist(), dtype="object").fillna("")
    n_chars = texts.str.len()
    words = texts.str.findall(_WS_TOKEN)
    n_words = words.map(len)
    mean_word_len = (n_words > 0) * (
        words.map(lambda w: sum(map(len, w))) * 1_000_000
        // n_words.clip(lower=1))
    n_punct = texts.str.count(r"[.,;:!?]")
    punct_ratio = n_punct * 1_000_000 // n_chars.clip(lower=1)
    upper_ratio = texts.str.count(r"[A-Z]") * 1_000_000 // n_chars.clip(lower=1)
    return (batch
            .append_column("n_chars_q", pa.array(n_chars, pa.int64()))
            .append_column("n_words", pa.array(n_words, pa.int64()))
            .append_column("mean_word_len_ppm",
                           pa.array(mean_word_len, pa.int64()))
            .append_column("punct_ppm", pa.array(punct_ratio, pa.int64()))
            .append_column("upper_ppm", pa.array(upper_ratio, pa.int64())))


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Document fingerprint: md5 of whitespace-normalized lowercased text."""
    texts = batch[text_col].to_pylist()
    fps = [hashlib.md5(re.sub(r"\s+", " ", (t or "").lower()).encode("utf-8"))
           .hexdigest() for t in texts]
    return batch.append_column("fingerprint", pa.array(fps, pa.string()))


# Tiny public stopword/function-word tables per language (heuristic lang-ID).
_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "it", "for", "with"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für"},
    "fr": {"le", "la", "les", "et", "est", "pas", "une", "pour", "dans"},
    "es": {"el", "la", "los", "y", "es", "no", "una", "para", "con", "que"},
}


class LangId:
    """Actor-pool heuristic language ID: marker-word hit ratios + CJK check.

    Tables compile once per actor (T8-style stateful stage).  Returns the
    best-scoring language or "und" when nothing matches.
    """

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.markers = {k: frozenset(v) for k, v in _LANG_MARKERS.items()}
        self.word_re = re.compile(r"[a-zA-Zäöüéèêáíóúñç]+")
        self.cjk_re = re.compile(r"[一-鿿぀-ヿ]")

    def _predict(self, text: str) -> str:
        if not text:
            return "und"
        if len(self.cjk_re.findall(text)) * 3 > len(text):
            return "zh"
        words = [w.lower() for w in self.word_re.findall(text)]
        if not words:
            return "und"
        scores = {lang: sum(w in marks for w in words)
                  for lang, marks in self.markers.items()}
        best = max(sorted(scores), key=lambda k: scores[k])
        return best if scores[best] > 0 else "und"

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = [self._predict(t or "")
                 for t in batch[self.text_col].to_pylist()]
        return batch.append_column("pred_lang", pa.array(preds, pa.string()))


def lang_id(ds, text_col: str = "text", concurrency: int = 2):
    return ds.map_batches(LangId, fn_constructor_kwargs={"text_col": text_col},
                          batch_format="pyarrow", concurrency=concurrency, num_cpus=0.5)


# --------------------------------------------------------------------------
# Benchmark decontamination (broadcast n-gram semi-join)
# --------------------------------------------------------------------------

_GRAM_TOKEN = re.compile(r"[a-z0-9]+")


def _gram_instances(texts: list, n: int) -> tuple[list[str], np.ndarray]:
    """Flattened word n-gram instances + their source-row indices."""
    grams: list[str] = []
    row_of: list[int] = []
    for i, t in enumerate(texts):
        w = _GRAM_TOKEN.findall((t or "").lower())
        for j in range(len(w) - n + 1):
            grams.append(" ".join(w[j:j + n]))
            row_of.append(i)
    return grams, np.asarray(row_of, np.int64)


def benchmark_ngrams(bench_ds, n: int = 8, text_col: str = "text") -> set:
    """Distinct word n-grams of the (small) benchmark side.

    Per-batch distinct partials union on the driver — the benchmark side
    is small by contract (the held-out eval set, not the corpus); for a
    benchmark too big for one heap, swap this for the bucketed-groupby
    join pattern used by the near-dup verify (dedup.py).
    """
    def partial(b: pa.Table) -> pa.Table:
        grams, _ = _gram_instances(b[text_col].to_pylist(), n)
        return pa.table({"gram": pa.array(sorted(set(grams)), pa.string())})

    out: set = set()
    for part in bench_ds.map_batches(
            partial, batch_format="pyarrow").take_all():
        out.add(part["gram"])
    return out


def contamination_report(ds, bench_grams: set, n: int = 8,
                         id_col: str = "doc_id", text_col: str = "text"):
    """(doc_id, n_matched) per document: count of n-gram INSTANCES that
    appear in the benchmark set.  The gram set ships ONCE as a broadcast
    Arrow array (``ray.put``); matching is a vectorized ``pc.is_in`` over
    the flattened grams + a bincount back to rows.
    """
    import pyarrow.compute as pc
    import ray

    grams_ref = ray.put(pa.array(sorted(bench_grams), pa.string()))

    def report(batch: pa.Table) -> pa.Table:
        grams, row_of = _gram_instances(batch[text_col].to_pylist(), n)
        counts = np.zeros(batch.num_rows, np.int64)
        if grams:
            hit = pc.is_in(pa.array(grams, pa.string()),
                           value_set=ray.get(grams_ref)).to_numpy(
                               zero_copy_only=False)
            counts = np.bincount(row_of[hit], minlength=batch.num_rows)
        return pa.table({id_col: batch[id_col],
                         "n_matched": pa.array(counts, pa.int64())})

    return ds.map_batches(report, batch_format="pyarrow")


def decontaminate(ds, bench_ds, n: int = 8, id_col: str = "doc_id",
                  text_col: str = "text"):
    """Drop corpus documents sharing ANY word n-gram with the benchmark.

    The standard eval-leakage guard for training corpora (public
    methodology: GPT-3 appx. C / PaLM-style n-gram overlap).  One
    streaming pass over the corpus; no shuffle.
    """
    import pyarrow.compute as pc
    import ray

    grams_ref = ray.put(pa.array(sorted(benchmark_ngrams(
        bench_ds, n, text_col)), pa.string()))

    def keep_clean(batch: pa.Table) -> pa.Table:
        grams, row_of = _gram_instances(batch[text_col].to_pylist(), n)
        bad = np.zeros(batch.num_rows, bool)
        if grams:
            hit = pc.is_in(pa.array(grams, pa.string()),
                           value_set=ray.get(grams_ref)).to_numpy(
                               zero_copy_only=False)
            bad[row_of[hit]] = True
        return batch.filter(pa.array(~bad))

    return ds.map_batches(keep_clean, batch_format="pyarrow")


# --------------------------------------------------------------------------
# Repetition signals (Gopher-style quality filter)
# --------------------------------------------------------------------------

def repetition_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Gopher-style repetition signals (Rae et al. 2021, public):

    - ``n_lines`` / ``dup_line_ppm``: non-empty newline-split lines and the
      fraction (ppm, floored) that are repeats of an earlier line;
    - ``dup_line_char_ppm``: characters in repeated line occurrences over
      all line characters;
    - ``top2gram_ppm``: chars covered by the most frequent word 2-gram
      (count x gram length over len(text); ties broken by smallest gram).

    All ratios integer-scaled so the DuckDB oracle compares exactly.
    """
    from collections import Counter as _C

    n_lines_o, dup_line_o, dup_char_o, top2_o = [], [], [], []
    for t in batch[text_col].to_pylist():
        t = t or ""
        lines = [ln for ln in t.split("\n") if ln != ""]
        lc = _C(lines)
        n_lines = len(lines)
        dup_lines = n_lines - len(lc)
        line_chars = sum(len(ln) for ln in lines)
        dup_chars = sum((c - 1) * len(ln) for ln, c in lc.items())
        words = _GRAM_TOKEN.findall(t.lower())
        grams = _C(" ".join(words[j:j + 2]) for j in range(len(words) - 1))
        if grams:
            top_gram = min(g for g, c in grams.items()
                           if c == max(grams.values()))
            top2 = grams[top_gram] * len(top_gram) * 1_000_000 // max(
                len(t), 1)
        else:
            top2 = 0
        n_lines_o.append(n_lines)
        dup_line_o.append(dup_lines * 1_000_000 // n_lines if n_lines else 0)
        dup_char_o.append(dup_chars * 1_000_000 // line_chars
                          if line_chars else 0)
        top2_o.append(top2)
    return (batch
            .append_column("n_lines", pa.array(n_lines_o, pa.int64()))
            .append_column("dup_line_ppm", pa.array(dup_line_o, pa.int64()))
            .append_column("dup_line_char_ppm",
                           pa.array(dup_char_o, pa.int64()))
            .append_column("top2gram_ppm", pa.array(top2_o, pa.int64())))


# --------------------------------------------------------------------------
# Corpus-fit unigram LM quality score (CCNet-style, Wenzek et al. 2020)
# --------------------------------------------------------------------------

def unigram_fit(ds, text_col: str = "text", vocab_size: int = 65536):
    """Fit a unigram LM on the corpus itself: top-``vocab_size`` tokens
    by (count desc, token asc) plus the grand token total.

    One pass of per-block Counter partials (each block ships its
    DISTINCT tokens, not its token stream) -> ``groupby(token).sum`` ->
    distributed ``sort().limit(vocab_size)``; only the final vocab (a
    bounded ``vocab_size`` rows) ever reaches the driver.  ``vocab_size``
    is the broadcast-size knob: at 100 TB the distinct-token tail is
    unbounded but the model stays ``O(vocab_size)`` by construction.
    Returns ``(vocab: dict[token, count], total: int)``.
    """
    from collections import Counter

    def partial(b: pa.Table) -> pa.Table:
        c = Counter()
        for t in b[text_col].to_pylist():
            c.update(_GRAM_TOKEN.findall((t or "").lower()))
        return pa.table({"t": pa.array(list(c.keys()), pa.string()),
                         "c": pa.array(list(c.values()), pa.int64())})

    counts = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("t").sum("c")
    total = int(counts.sum("sum(c)"))
    vocab_rows = (counts.sort(["sum(c)", "t"], descending=[True, False])
                  .limit(vocab_size).take_all())
    return {r["t"]: int(r["sum(c)"]) for r in vocab_rows}, total


def unigram_logprob(ds, text_col: str = "text", id_col: str = "doc_id",
                    vocab_size: int = 65536):
    """Per-document unigram log-likelihood — the CCNet perplexity-bucket
    quality signal, with the LM fit on the corpus itself (no external
    model).  Output per doc with >=1 token: ``(id, n_tok, n_oov,
    logprob_milli)`` where ``logprob_milli = round(sum ln(count/total)
    over in-vocab tokens * 1000)`` as int64 — integer-scaled so the
    DuckDB oracle (same ln over the same exact counts) hash-compares;
    OOV tokens are counted, not scored (no smoothing constant to drift).

    The fitted model broadcasts once (``ray.put``); scoring is a
    stateless ``map_batches`` with a vectorized sorted-array lookup.
    """
    import ray

    vocab, total = unigram_fit(ds, text_col, vocab_size)
    toks = np.array(sorted(vocab)) if vocab else np.array([], dtype=str)
    lps = np.array([np.log(vocab[t] / total) for t in toks], np.float64)
    model_ref = ray.put((toks, lps))

    def score(b: pa.Table) -> pa.Table:
        tk, lp = ray.get(model_ref)
        # regex extraction is per string; everything after is ONE
        # vectorized lookup + segmented reduce over the whole batch
        ids0 = b[id_col].to_pylist()
        toks = [_GRAM_TOKEN.findall((t or "").lower())
                for t in b[text_col].to_pylist()]
        lens = np.array([len(w) for w in toks], np.int64)
        keep = lens > 0
        if not keep.any():
            return pa.table({id_col: pa.array([], pa.int64()),
                             "n_tok": pa.array([], pa.int64()),
                             "n_oov": pa.array([], pa.int64()),
                             "logprob_milli": pa.array([], pa.int64())})
        flat = np.concatenate([np.array(w) for w, k in zip(toks, keep)
                               if k])
        seg = np.repeat(np.arange(int(keep.sum())), lens[keep])
        if len(tk):
            idx = np.minimum(np.searchsorted(tk, flat), len(tk) - 1)
            hit = tk[idx] == flat
            contrib = np.where(hit, lp[idx], 0.0)
        else:
            hit = np.zeros(len(flat), bool)
            contrib = np.zeros(len(flat), np.float64)
        n_docs = int(keep.sum())
        sums = np.bincount(seg, weights=contrib, minlength=n_docs)
        oov = np.bincount(seg, weights=~hit, minlength=n_docs)
        return pa.table({
            id_col: pa.array(np.array(ids0, np.int64)[keep], pa.int64()),
            "n_tok": pa.array(lens[keep], pa.int64()),
            "n_oov": pa.array(oov.astype(np.int64), pa.int64()),
            "logprob_milli": pa.array(
                round_half_away(sums * 1000).astype(np.int64), pa.int64()),
        })

    return ds.map_batches(score, batch_format="pyarrow")


# --------------------------------------------------------------------------
# Unicode text normalization
# --------------------------------------------------------------------------

_WS_RUN = re.compile(r"[ \t\n\r\f\v]+")


def normalize_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Unicode NFC + ASCII-whitespace-run collapse + edge trim.

    The canonical pre-dedup normalization pass (near-dup recall improves
    when byte-level variance is composed away).  The whitespace class is
    the explicit ASCII set — NOT ``\\s`` — because Python ``re`` and
    RE2/DuckDB disagree on Unicode whitespace, and the DuckDB oracle
    (``trim(regexp_replace(nfc_normalize(text), ...))``) must match
    byte-for-byte.  Stateless, no shuffle.
    """
    import unicodedata

    out = [
        _WS_RUN.sub(" ", unicodedata.normalize("NFC", t or "")).strip(" ")
        for t in batch[text_col].to_pylist()
    ]
    return batch.set_column(
        batch.schema.get_field_index(text_col), "norm_text",
        pa.array(out, pa.string()))


def normalize_text(ds, text_col: str = "text"):
    return ds.map_batches(
        lambda b: normalize_batch(b, text_col), batch_format="pyarrow")


# --------------------------------------------------------------------------
# DSIR importance weights (Xie et al. 2023, public: "Data Selection for
# Language Models via Importance Resampling")
# --------------------------------------------------------------------------

def _dsir_features(text: str) -> list:
    """Hashable feature stream: unigrams + space-joined bigrams of the
    [a-z0-9]+ tokens (the paper's hashed-ngram featurization)."""
    ws = _GRAM_TOKEN.findall((text or "").lower())
    return ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]


def _dsir_bucket(feats: list, n_buckets: int) -> np.ndarray:
    out = np.empty(len(feats), np.int64)
    for i, f in enumerate(feats):
        out[i] = int.from_bytes(
            hashlib.md5(f.encode("utf-8")).digest()[:8],
            "little") % n_buckets
    return out


def dsir_weights(ds, text_col: str = "text", id_col: str = "doc_id",
                 target_mod: int = 97, n_buckets: int = 8192):
    """Per-document importance weight ln p_target / p_raw under hashed
    n-gram unigram models — the DSIR data-selection score.  Docs with
    ``id % target_mod == 0`` form the target distribution (the same
    held-out convention as `decontaminate`); every other doc is scored.

    Both models are one map_batches pass of per-block bucket-count
    partials (each block ships <= 2 x n_buckets rows) merged on the
    driver into two length-``n_buckets`` vectors — the broadcast is
    O(n_buckets) ints no matter the corpus size, the DSIR design point.
    Add-one smoothing on both models keeps every bucket finite.  Output
    per raw doc with >= 1 feature: ``(id, n_feat, weight_milli)`` where
    ``weight_milli = round(sum ln((t_f+1)/(T+B) / ((r_f+1)/(R+B))) *
    1000)`` — integer-scaled for exact oracle comparison.
    """
    import ray

    def count_partial(b: pa.Table) -> pa.Table:
        tgt = np.zeros(n_buckets, np.int64)
        raw = np.zeros(n_buckets, np.int64)
        for i, t in zip(b[id_col].to_pylist(), b[text_col].to_pylist()):
            feats = _dsir_features(t)
            if not feats:
                continue
            binc = np.bincount(_dsir_bucket(feats, n_buckets),
                               minlength=n_buckets)
            if i % target_mod == 0:
                tgt += binc
            else:
                raw += binc
        nz = np.flatnonzero(tgt + raw)
        return pa.table({"bucket": pa.array(nz, pa.int64()),
                         "t": pa.array(tgt[nz], pa.int64()),
                         "r": pa.array(raw[nz], pa.int64())})

    tgt = np.zeros(n_buckets, np.int64)
    raw = np.zeros(n_buckets, np.int64)
    for row in ds.map_batches(count_partial,
                              batch_format="pyarrow").take_all():
        tgt[row["bucket"]] += row["t"]
        raw[row["bucket"]] += row["r"]
    T, R = int(tgt.sum()), int(raw.sum())
    # ln of the smoothed ratio, precomputed per bucket
    lr = (np.log((tgt + 1.0) / (T + n_buckets))
          - np.log((raw + 1.0) / (R + n_buckets)))
    lr_ref = ray.put(lr)

    def score(b: pa.Table) -> pa.Table:
        lrv = ray.get(lr_ref)
        ids, nf, wm = [], [], []
        for i, t in zip(b[id_col].to_pylist(), b[text_col].to_pylist()):
            if i % target_mod == 0:
                continue
            feats = _dsir_features(t)
            if not feats:
                continue
            bk = _dsir_bucket(feats, n_buckets)
            ids.append(i)
            nf.append(len(feats))
            wm.append(iround_half_away(float(lrv[bk].sum()) * 1000))
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "n_feat": pa.array(nf, pa.int64()),
                         "weight_milli": pa.array(wm, pa.int64())})

    return ds.map_batches(score, batch_format="pyarrow")


def group_zscores(ds, group_col: str, value_col: str, id_col: str,
                  scale: int = 1000):
    """Per-group z-score feature normalization: one pass of per-block
    (n, sum, sumsq) partials -> tiny driver merge -> broadcast moments
    -> stateless standardize pass.  No per-row shuffle at any size; the
    driver holds O(groups) floats.  Output ``z_milli = round((v - mean)
    / std * scale)`` as int64 (groups with fewer than 2 rows or zero
    variance emit 0) — the milli scaling absorbs summation-order drift
    against the oracle, which spells out the same sample-variance
    formula rather than relying on the engine's stddev kernel.
    """
    import ray

    def partial(b: pa.Table) -> pa.Table:
        import pandas as pd
        df = pd.DataFrame({"g": b[group_col].to_pylist(),
                           "v": np.asarray(b[value_col].to_pylist(),
                                           np.float64)})
        df["v2"] = df["v"] * df["v"]
        agg = df.groupby("g", sort=False).agg(
            n=("v", "size"), s=("v", "sum"), s2=("v2", "sum")).reset_index()
        return pa.Table.from_pandas(agg, preserve_index=False)

    stats: dict = {}
    for r in ds.map_batches(partial, batch_format="pyarrow").take_all():
        n, s, s2 = stats.get(r["g"], (0, 0.0, 0.0))
        stats[r["g"]] = (n + int(r["n"]), s + float(r["s"]),
                         s2 + float(r["s2"]))
    moments = {}
    for g, (n, s, s2) in stats.items():
        mean = s / n
        var = (s2 - s * s / n) / (n - 1) if n > 1 else 0.0
        moments[g] = (mean, var ** 0.5 if var > 0 else 0.0)
    mom_ref = ray.put(moments)

    def standardize(b: pa.Table) -> pa.Table:
        mom = ray.get(mom_ref)
        gs = b[group_col].to_pylist()
        vs = np.asarray(b[value_col].to_pylist(), np.float64)
        means = np.array([mom[g][0] for g in gs])
        stds = np.array([mom[g][1] for g in gs])
        z = np.where(stds > 0, (vs - means) / np.where(stds > 0, stds, 1.0),
                     0.0)
        return pa.table({
            id_col: b[id_col],
            group_col: b[group_col],
            "z_milli": pa.array(round_half_away(z * scale)
                                .astype(np.int64), pa.int64()),
        })

    return ds.map_batches(standardize, batch_format="pyarrow")


_SNIP_TOKEN = re.compile(r"[a-z0-9]+")


def search_snippets(ds, term: str, width: int = 3,
                    id_col: str = "doc_id", text_col: str = "text"):
    """Result-page snippet extraction: for every doc containing
    ``term`` (lowercase token match), the 1-based token index of the
    FIRST occurrence and a ±``width``-token context window.

    Serving-path op (the reference renders previews around matches —
    website/src/lib/server/search.ts result shaping); here as a batch
    stage.  A vectorized ``match_substring`` prefilter drops the
    non-matching majority before any per-row work; string assembly on
    the surviving rows is inherently per-document (same contract as
    extract.parse_html).  Stateless map — no shuffle at any scale.
    """
    def per_batch(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        low = pc.utf8_lower(t[text_col])
        cand = t.filter(pc.match_substring(low, term))
        ids, idxs, snips = [], [], []
        for did, txt in zip(cand[id_col].to_pylist(),
                            pc.utf8_lower(cand[text_col]).to_pylist()):
            ws = _SNIP_TOKEN.findall(txt)
            try:
                i = ws.index(term)
            except ValueError:
                continue            # substring hit, not a whole token
            lo = max(i - width, 0)
            ids.append(did)
            idxs.append(i + 1)      # 1-based (SQL list_position)
            snips.append(" ".join(ws[lo:i + width + 1]))
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "idx": pa.array(idxs, pa.int64()),
                         "snippet": pa.array(snips, pa.string())})

    return ds.map_batches(per_batch, batch_format="pyarrow")


def readability(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Flesch-Kincaid grade from EXACT integer counts: words =
    ``[A-Za-z]+`` matches, syllables = vowel-group ``[aeiouyAEIOUY]+``
    matches (the standard public heuristic), sentences =
    ``[.!?]+`` runs (floored at 1).  Counting is Arrow
    ``count_substring_regex`` — RE2, the same dialect DuckDB's
    ``regexp_extract_all`` uses, so the oracle reproduces every count
    bit-for-bit; the grade double is then a SHARED IEEE formula
    (0.39*(w/s) + 11.8*(sy/w) - 15.59, evaluated in this exact term
    order on both sides) rounded to 6.  Zero-word docs are dropped (the
    formula is undefined).  Fully streaming, no shuffle."""
    from ..rounding import round_half_away

    def per_batch(t: pa.Table) -> pa.Table:
        txt = t[text_col]
        w = pc.count_substring_regex(txt, "[A-Za-z]+")
        sy = pc.count_substring_regex(txt, "[aeiouyAEIOUY]+")
        se = pc.max_element_wise(
            pc.count_substring_regex(txt, "[.!?]+"),
            pa.scalar(1, pa.int32()))
        out = pa.table({id_col: t[id_col],
                        "n_words": pc.cast(w, pa.int64()),
                        "n_sents": pc.cast(se, pa.int64()),
                        "n_syll": pc.cast(sy, pa.int64())})
        out = out.filter(pc.greater(out["n_words"], 0))
        wf = out["n_words"].to_numpy(zero_copy_only=False).astype(np.float64)
        sf = out["n_sents"].to_numpy(zero_copy_only=False).astype(np.float64)
        syf = out["n_syll"].to_numpy(zero_copy_only=False).astype(np.float64)
        grade = 0.39 * (wf / sf) + 11.8 * (syf / wf) - 15.59
        return out.append_column(
            "fk_grade", pa.array(round_half_away(grade, 6), pa.float64()))

    return ds.map_batches(per_batch, batch_format="pyarrow")


def token_entropy(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Per-document unigram token entropy — the Shannon-diversity
    quality signal (low entropy = boilerplate/repetition, the
    complement of ``repetition_batch``'s n-gram ratios).

    Exactness contract: the float entropy ``ln(n) - (1/n)·Σ c·ln(c)``
    is order-dependent under IEEE summation, so instead both sides
    compute the INTEGER micro-nat form

        ``entropy_micro = n·L(n) - Σ_token c·L(c)``,
        ``L(k) = floor(ln(k) · 1e6)``  (int64)

    whose summation is exact and order-free; ``math.log`` here and
    DuckDB ``ln`` share the same libm doubles (the ``bigram_pmi``
    precedent), and ``floor`` needs no rounding-mode care since
    ``ln(k) >= 0``.  Tokenization is the shared ``[a-z0-9]+`` /
    ``regexp_extract_all`` contract (``ngram_counts``).  Zero-token
    docs emit (0, 0).  Stateless vectorized-per-doc map — no shuffle,
    embarrassingly parallel at any corpus size; the ``L`` memo is
    per-task, bounded by the distinct count values seen."""
    import math
    from collections import Counter

    def per_batch(t: pa.Table) -> pa.Table:
        memo: dict = {}

        def lmicro(k: int) -> int:
            v = memo.get(k)
            if v is None:
                v = math.floor(math.log(k) * 1_000_000.0)
                memo[k] = v
            return v

        ns, ents = [], []
        for txt in t[text_col].to_pylist():
            ws = _GRAM_TOKEN.findall((txt or "").lower())
            n = len(ws)
            if n == 0:
                ns.append(0)
                ents.append(0)
                continue
            s = 0
            for c in Counter(ws).values():
                s += c * lmicro(c)
            ns.append(n)
            ents.append(n * lmicro(n) - s)
        return pa.table({id_col: t[id_col],
                         "n_tokens": pa.array(ns, pa.int64()),
                         "entropy_micro": pa.array(ents, pa.int64())})

    return ds.map_batches(per_batch, batch_format="pyarrow")


def novelty_scores(ds, n: int = 3, id_col: str = "doc_id",
                   text_col: str = "text"):
    """Per-doc n-gram novelty: the fraction of a doc's DISTINCT word
    n-grams that appear in no other document — the corpus-uniqueness
    quality signal (boilerplate scores ~0, original text ~1; the
    Dolma/RefinedWeb "uniqueness" family).  ``novelty_micro =
    n_unique·1e6 // n_grams`` (floored — exact int).

    Three legitimately-wide steps, each the established shape: (1) a
    stateless flat-map to DISTINCT (doc, gram) rows (a doc is one row,
    so a per-row set IS globally distinct — no dedup shuffle); (2)
    gram document-frequency via :func:`~.dataset_tools.group_sum`
    (data-scaled string key); (3) df joined back per (doc, gram) with
    the distributed :func:`~.joins.hash_join` and folded per doc.
    Docs with no n-gram (fewer than n tokens) drop out — mirrored by
    the oracle's inner join."""
    from .dataset_tools import group_sum
    from .joins import hash_join

    def grams(t: pa.Table) -> pa.Table:
        ids, gs = [], []
        did = t[id_col].to_pylist()
        for i, txt in enumerate(t[text_col].to_pylist()):
            ws = _GRAM_TOKEN.findall((txt or "").lower())
            for g in set(" ".join(ws[j:j + n])
                         for j in range(len(ws) - n + 1)):
                ids.append(did[i])
                gs.append(g)
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "gram": pa.array(gs, pa.string()),
                         "one": pa.array(np.ones(len(ids), np.int64))})

    dg = ds.map_batches(grams, batch_format="pyarrow").materialize()
    df = group_sum(dg, "gram", ["one"], rename={"one": "df"})
    joined = hash_join(dg, df, key_col="gram",
                       left_payload=[id_col], right_payload=["df"],
                       types={"gram": pa.string(), id_col: pa.int64(),
                              "df": pa.int64()})

    def fold_prep(t: pa.Table) -> pa.Table:
        uniq = pc.cast(pc.equal(t["df"], pa.scalar(1, pa.int64())),
                       pa.int64())
        return pa.table({id_col: t[id_col],
                         "n_grams": pa.array(
                             np.ones(len(t), np.int64)),
                         "n_unique": uniq})

    per_doc = group_sum(joined.map_batches(fold_prep,
                                           batch_format="pyarrow"),
                        id_col, ["n_grams", "n_unique"])

    def ratio(t: pa.Table) -> pa.Table:
        ng = t["n_grams"].to_numpy(zero_copy_only=False)
        nu = t["n_unique"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "novelty_micro",
            pa.array(nu * 1_000_000 // ng, pa.int64()))

    return per_doc.map_batches(ratio, batch_format="pyarrow")


def distinctive_terms(ds, group_col: str = "lang", text_col: str = "text",
                      k: int = 10, n_parts: int = 64):
    """Dunning log-likelihood-ratio keywords (Dunning 1993, public
    algorithm): the ``k`` most GROUP-distinctive tokens per group —
    "which vocabulary separates this language/source from the rest",
    the corpus-comparison signal behind domain-mix audits.

    Exactness contract (the ``token_entropy`` integer micro-nat trick
    extended to the 2×2 G² statistic): with a = n(token, group),
    nt/nl/N the token/group/corpus totals,

        ``G2_micro = 2 · Σ_cells O·(L(O) + L(N) − L(row) − L(col))``,
        ``L(x) = floor(ln(x)·1e6)``  (int64; O=0 cells contribute 0)

    — an order-free integer sum both engine and DuckDB compute
    term-for-term (shared libm ``ln``).  Overflow bound: |terms| stay
    under 2⁶³ while N·ΔL < 9·10¹⁸, i.e. corpora under ~10¹⁰ tokens;
    past that the SQL side needs HUGEINT (the chi2_independence note).

    Distributed shape: per-block (group, token) partials → ONE
    token-keyed hash partition (a token's rows and therefore its total
    co-reside; group totals are bounded and broadcast) → per-partition
    vectorized G² + per-group top-k partials → driver merges
    O(parts·groups·k) rows.  Tokenization is the shared ``[a-z0-9]+``
    lowercase contract.  Returns (group, token, a, llr_micro), top-k
    per group by (llr DESC, token).
    """
    import math

    import ray

    from .windows import _by_part

    def block_counts(t: pa.Table) -> pa.Table:
        rows_g, rows_t, rows_n = [], [], []
        agg: dict = {}
        for g, txt in zip(t[group_col].to_pylist(),
                          t[text_col].to_pylist()):
            for tok in _GRAM_TOKEN.findall((txt or "").lower()):
                key = (g, tok)
                agg[key] = agg.get(key, 0) + 1
        for (g, tok), n in agg.items():
            rows_g.append(g)
            rows_t.append(tok)
            rows_n.append(n)
        return pa.table({group_col: pa.array(rows_g),
                         "token": pa.array(rows_t, pa.string()),
                         "n": pa.array(rows_n, pa.int64())})

    parts = ds.map_batches(block_counts,
                           batch_format="pyarrow").materialize()

    totals: dict = {}
    for r in parts.map_batches(
            lambda t: pa.table({group_col: t[group_col], "n": t["n"]}),
            batch_format="pyarrow").take_all():
        totals[r[group_col]] = totals.get(r[group_col], 0) + r["n"]
    big_n = sum(totals.values())
    tref = ray.put((totals, big_n))

    def llr_part(g: pd.DataFrame) -> pd.DataFrame:
        tot, N = ray.get(tref)
        c = (g.groupby([group_col, "token"], as_index=False)["n"].sum()
             .rename(columns={"n": "a"}))
        c["nt"] = c.groupby("token")["a"].transform("sum")
        memo: dict = {}

        def L(x: int) -> int:
            v = memo.get(x)
            if v is None:
                v = math.floor(math.log(x) * 1_000_000.0)
                memo[x] = v
            return v

        def term(o: int, row: int, col: int, ln_n: int) -> int:
            return o * (L(o) + ln_n - L(row) - L(col)) if o > 0 else 0

        ln_n = L(N)
        out = []
        for gname, tok, a, nt in zip(c[group_col], c["token"],
                                     c["a"], c["nt"]):
            nl = tot[gname]
            a, nt, nl = int(a), int(nt), int(nl)
            llr = 2 * (term(a, nt, nl, ln_n)
                       + term(nt - a, nt, N - nl, ln_n)
                       + term(nl - a, N - nt, nl, ln_n)
                       + term(N - nt - nl + a, N - nt, N - nl, ln_n))
            out.append((gname, tok, a, llr))
        res = pd.DataFrame(out, columns=[group_col, "token", "a",
                                         "llr_micro"])
        res = res.sort_values(["llr_micro", "token"],
                              ascending=[False, True])
        res = res.groupby(group_col, as_index=False).head(k)
        res["a"] = res["a"].astype("int64")
        res["llr_micro"] = res["llr_micro"].astype("int64")
        return res

    cand = pd.DataFrame(
        _by_part(parts, "token", n_parts=n_parts).groupby("_part")
        .map_groups(lambda g: llr_part(g.drop(columns="_part")),
                    batch_format="pandas").take_all())
    cand = cand.sort_values(["llr_micro", "token"],
                            ascending=[False, True])
    return (cand.groupby(group_col, as_index=False).head(k)
            .sort_values([group_col, "llr_micro", "token"],
                         ascending=[True, False, True])
            .reset_index(drop=True))


def zipf_fit(ds, k: int = 100, text_col: str = "text"):
    """Zipf-law fit over the corpus's top-``k`` unigram frequencies —
    the corpus-health diagnostic (natural text slopes ≈ −1; template
    spam and deduplicated boilerplate bend it): OLS of
    ``y = L(count)`` on ``x = L(rank)`` with the shared-libm micro-nat
    map ``L(v) = floor(ln(v)·1e6)``, so every sufficient statistic
    (Σx, Σy, Σxy, Σxx) is an EXACT int64-class integer and both sides
    perform the identical single IEEE division:

        ``slope = round((k·Σxy − Σx·Σy) / (k·Σxx − Σx²), 6)``
        ``intercept_micro`` — the micro-nat intercept, same contract.

    Distributed: Counter partials per block (distinct tokens cross the
    shuffle, not the token stream) → :func:`~.dataset_tools.group_sum`
    (data-scaled string key) → distributed ``sort().limit(k)``; the
    driver folds exactly ``k`` rows with Python ints (products reach
    ~k·(16e6)² — the SQL side uses HUGEINT).  Rank ties share a count
    and are broken by token ASC on BOTH sides, which leaves the fit
    invariant.  Returns one row ``(k, slope, intercept_micro)``.
    """
    import math
    from collections import Counter

    import pandas as pd

    from ..rounding import fround_half_away
    from .dataset_tools import group_sum

    def partial(t: pa.Table) -> pa.Table:
        c = Counter()
        for txt in t[text_col].to_pylist():
            c.update(_GRAM_TOKEN.findall((txt or "").lower()))
        return pa.table({"tok": pa.array(list(c.keys()), pa.string()),
                         "cnt": pa.array(list(c.values()), pa.int64())})

    counts = group_sum(ds.map_batches(partial, batch_format="pyarrow"),
                       "tok", ["cnt"], n_parts=16)
    top = (counts.sort(["cnt", "tok"], descending=[True, False])
           .limit(k).to_pandas())
    kk = len(top)

    def lmicro(v: int) -> int:
        return math.floor(math.log(float(v)) * 1_000_000.0)

    sx = sy = sxy = sxx = 0
    for i, cnt in enumerate(top["cnt"].to_numpy(), start=1):
        x = lmicro(i)
        y = lmicro(int(cnt))
        sx += x
        sy += y
        sxy += x * y
        sxx += x * x
    num = kk * sxy - sx * sy
    den = kk * sxx - sx * sx
    if den == 0:                       # fewer than 2 distinct ranks
        slope = intercept = 0.0
    else:
        slope = fround_half_away(float(num) / float(den), 6)
        intercept = fround_half_away(
            float(sy * den - num * sx) / float(kk * den), 6)
    return pd.DataFrame({
        "k": pd.array([kk], dtype="int64"),
        "slope": [slope],
        "intercept_micro": [intercept]})


def compression_ratio(ds, id_col: str = "doc_id", text_col: str = "text",
                      level: int = 6):
    """Per-document zlib compression ratio — the Gopher-style
    redundancy quality signal (Rae et al. 2021 §A1.1: highly
    compressible text is boilerplate/repetition; very incompressible
    text is often binary junk or hash dumps):

        ``ratio_micro = c_bytes·1e6 // n_bytes``  (int64, floored)

    over the UTF-8 encoding of the text.  ORACLE NOTE: rows-only by
    nature — no SQL engine exposes a compressor, and the exact byte
    count is a zlib implementation detail (deterministic within one
    zlib build; pinned by the pytest golden bounds, not a DuckDB
    oracle).  Stateless vectorized map, embarrassingly parallel; the
    per-doc Python loop is the compressor call itself (the
    token_entropy precedent — the work IS per-document)."""
    import zlib

    def per_batch(t: pa.Table) -> pa.Table:
        nb, cb, rat = [], [], []
        for txt in t[text_col].to_pylist():
            raw = (txt or "").encode("utf-8")
            n = len(raw)
            c = len(zlib.compress(raw, level)) if n else 0
            nb.append(n)
            cb.append(c)
            rat.append(c * 1_000_000 // n if n else 0)
        return pa.table({id_col: t[id_col],
                         "n_bytes": pa.array(nb, pa.int64()),
                         "c_bytes": pa.array(cb, pa.int64()),
                         "ratio_micro": pa.array(rat, pa.int64())})

    return ds.map_batches(per_batch, batch_format="pyarrow")


def tfidf_topk(ds, k: int = 3, id_col: str = "doc_id",
               text_col: str = "text", n_parts: int = 16):
    """Per-document top-``k`` TF-IDF terms in exact integer micro-nats
    — the classic keyword-extraction / sparse-retrieval weighting
    (Sparck Jones 1972), kept oracle-exact with the shared-libm trick
    from :func:`token_entropy`: ``idf_micro = floor(ln(N/df)·1e6)``
    (both numpy and DuckDB call the same libm ``log`` on the same
    IEEE-double quotient), so ``score_micro = tf · idf_micro`` is pure
    int64 on both sides.

    Shape (the :func:`novelty_scores` dataflow plus a bounded top-k):
    (1) stateless vectorized explode to (doc, token, tf) — a doc is one
    row, so block-local counts ARE global; (2) document frequency via
    :func:`~.dataset_tools.group_sum` (data-scaled token key); (3) one
    distributed :func:`~.joins.hash_join` back on token; (4) per-block
    top-k combiner (a doc's global top-k is inside the union of its
    per-block top-ks) → ONE doc-hash partition → vectorized pandas
    head(k).  Ties break token-ascending, mirrored by the oracle's
    ``row_number`` order.  Returns (doc_id, token, score_micro).
    """
    from .dataset_tools import group_sum
    from .joins import hash_join
    from .windows import _by_part

    n_docs = ds.count()

    def tf_rows(t: pa.Table) -> pa.Table:
        # null text -> '' -> [''] -> filtered: same rows as the
        # oracle's unnest-of-NULL (nothing)
        toks = pc.utf8_split_whitespace(
            pc.fill_null(t[text_col], ""))
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        ids = np.repeat(
            t[id_col].to_numpy(zero_copy_only=False), lens)
        tb = pa.table({id_col: pa.array(ids, pa.int64()),
                       "token": pc.list_flatten(toks)})
        tb = tb.filter(pc.not_equal(tb["token"], ""))
        g = tb.group_by([id_col, "token"]).aggregate([("token", "count")])
        return pa.table({
            id_col: g[id_col],
            "token": g["token"].combine_chunks().cast(pa.string()),
            "tf": g["token_count"].combine_chunks().cast(pa.int64()),
            "one": pa.array(np.ones(len(g), np.int64))})

    tf = ds.map_batches(tf_rows, batch_format="pyarrow").materialize()
    df = group_sum(tf, "token", ["one"], rename={"one": "df"})
    joined = hash_join(tf.select_columns([id_col, "token", "tf"]),
                       df, key_col="token",
                       left_payload=[id_col, "tf"], right_payload=["df"],
                       types={"token": pa.string(), id_col: pa.int64(),
                              "tf": pa.int64(), "df": pa.int64()})

    def score(t: pa.Table) -> pa.Table:
        dfv = t["df"].to_numpy(zero_copy_only=False).astype(np.float64)
        idf = np.floor(np.log(float(n_docs) / dfv) * 1e6).astype(np.int64)
        return pa.table({
            id_col: t[id_col], "token": t["token"],
            "score_micro": pa.array(
                t["tf"].to_numpy(zero_copy_only=False) * idf, pa.int64())})

    def head_k(g: "pd.DataFrame") -> "pd.DataFrame":
        if "_part" in g.columns:
            g = g.drop(columns="_part")
        g = g.sort_values([id_col, "score_micro", "token"],
                          ascending=[True, False, True], kind="mergesort")
        return g.groupby(id_col, sort=False).head(k)

    scored = (joined.map_batches(score, batch_format="pyarrow")
              .map_batches(head_k, batch_format="pandas"))
    return (_by_part(scored, id_col, n_parts=n_parts)
            .groupby("_part")
            .map_groups(head_k, batch_format="pandas")
            .sort([id_col, "score_micro", "token"],
                  descending=[False, True, False]))


def bigram_logprob(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Per-document corpus-fit bigram LM log-probability in exact
    integer micro-nats — the CCNet/KenLM-style quality signal one
    order up from :func:`unigram_logprob`: fluent text scores high,
    shuffled/boilerplate text scores low.

    MLE without smoothing (every doc bigram is in the corpus counts by
    construction, so ``c12 ≥ 1`` always): per doc,
    ``logprob_micro = Σ cnt · floor(ln(c12/c1)·1e6)`` where ``c12`` is
    the corpus count of the bigram and ``c1`` the corpus count of its
    head as a bigram-head (so the conditional sums to 1).  The floored
    shared-libm log (token_entropy trick) keeps both engine and oracle
    in pure int64.

    Dataflow = the :func:`novelty_scores` blueprint: flat-map to
    per-doc (w1, gram, cnt) rows (a doc is one row ⇒ block-local counts
    are global), corpus counts via two :func:`~.dataset_tools.group_sum`
    passes, two distributed :func:`~.joins.hash_join` attaches, one
    per-doc fold.  Docs under 2 tokens drop out (inner joins), mirrored
    by the oracle.  Returns (doc_id, n_bigrams, logprob_micro).
    """
    from .dataset_tools import group_sum
    from .joins import hash_join

    def grams(t: pa.Table) -> pa.Table:
        ids, w1s, gs, cs = [], [], [], []
        did = t[id_col].to_pylist()
        for i, txt in enumerate(t[text_col].to_pylist()):
            ws = _GRAM_TOKEN.findall((txt or "").lower())
            d: dict = {}
            for j in range(len(ws) - 1):
                key = (ws[j], ws[j] + " " + ws[j + 1])
                d[key] = d.get(key, 0) + 1
            for (w1, g), c in d.items():
                ids.append(did[i])
                w1s.append(w1)
                gs.append(g)
                cs.append(c)
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "w1": pa.array(w1s, pa.string()),
                         "gram": pa.array(gs, pa.string()),
                         "cnt": pa.array(cs, pa.int64())})

    dg = ds.map_batches(grams, batch_format="pyarrow").materialize()
    c12 = group_sum(dg.select_columns(["gram", "cnt"]), "gram", ["cnt"],
                    rename={"cnt": "c12"})
    c1 = group_sum(dg.select_columns(["w1", "cnt"]), "w1", ["cnt"],
                   rename={"cnt": "c1"})
    j1 = hash_join(dg, c12, key_col="gram",
                   left_payload=[id_col, "w1", "cnt"],
                   right_payload=["c12"],
                   types={"gram": pa.string(), id_col: pa.int64(),
                          "w1": pa.string(), "cnt": pa.int64(),
                          "c12": pa.int64()})
    j2 = hash_join(j1, c1, key_col="w1",
                   left_payload=[id_col, "cnt", "c12"],
                   right_payload=["c1"],
                   types={"w1": pa.string(), id_col: pa.int64(),
                          "cnt": pa.int64(), "c12": pa.int64(),
                          "c1": pa.int64()})

    def score(t: pa.Table) -> pa.Table:
        c12v = t["c12"].to_numpy(zero_copy_only=False).astype(np.float64)
        c1v = t["c1"].to_numpy(zero_copy_only=False).astype(np.float64)
        lp = np.floor(np.log(c12v / c1v) * 1e6).astype(np.int64)
        cnt = t["cnt"].to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: t[id_col],
            "n_bigrams": pa.array(cnt, pa.int64()),
            "logprob_micro": pa.array(cnt * lp, pa.int64())})

    out = group_sum(j2.map_batches(score, batch_format="pyarrow"),
                    id_col, ["n_bigrams", "logprob_micro"])
    return out.sort(id_col)


def pmi_pairs(ds, k: int = 20, min_pair: int = 5, df_frac: int = 20,
              id_col: str = "doc_id", text_col: str = "text"):
    """Top-``k`` collocations by pointwise mutual information (Church &
    Hanks 1990) among FREQUENT terms, in exact integer micro-nats:
    ``pmi_micro = floor(ln((c_ab·N)/(c_a·c_b))·1e6)`` — one double
    division of exact int64 products (all < 2^53) + the shared-libm
    log, so engine and oracle match bit-for-bit.

    The frequent-terms gate (df·``df_frac`` ≥ N, i.e. df ≥ N/20) is
    what bounds the pair explosion: the kept vocabulary is at most
    ``df_frac × (avg distinct tokens per doc)`` — a corpus-shape
    constant, not data-scaled — so the broadcast kept-set and each
    doc's pair fan-out stay bounded at any corpus size.  Distinct
    (doc, token) rows → df via :func:`~.dataset_tools.group_sum` →
    kept set broadcast (``ray.put`` once) → per-doc pair explode →
    pair counts via group_sum → the tiny PMI head sorts out.
    Pairs under ``min_pair`` co-occurrences drop (noise floor).
    Returns (tok_a, tok_b, c_ab, pmi_micro) top-k by (pmi desc, pair).
    """
    import ray

    from .dataset_tools import group_sum

    n_docs = ds.count()

    def tok_rows(t: pa.Table) -> pa.Table:
        ids, toks = [], []
        did = t[id_col].to_pylist()
        for i, txt in enumerate(t[text_col].to_pylist()):
            for w in set(_GRAM_TOKEN.findall((txt or "").lower())):
                ids.append(did[i])
                toks.append(w)
        return pa.table({id_col: pa.array(ids, pa.int64()),
                         "token": pa.array(toks, pa.string()),
                         "one": pa.array(np.ones(len(ids), np.int64))})

    dt = ds.map_batches(tok_rows, batch_format="pyarrow").materialize()
    dfc = group_sum(dt.select_columns(["token", "one"]), "token", ["one"],
                    rename={"one": "df"})
    kept_tbl = dfc.map_batches(
        lambda t: t.filter(pc.greater_equal(
            pc.multiply(t["df"], pa.scalar(df_frac, pa.int64())),
            pa.scalar(n_docs, pa.int64()))),
        batch_format="pyarrow").take_all()
    kept = {r["token"]: r["df"] for r in kept_tbl}
    kept_ref = ray.put(kept)

    def pair_rows(t: pa.Table) -> pa.Table:
        kp = ray.get(kept_ref)
        # rows arrive (doc, token) — group per doc within the block
        # (a doc's rows never split: tok_rows emits per input row)
        a_out, b_out = [], []
        did = t[id_col].to_numpy(zero_copy_only=False)
        tok = t["token"].to_pylist()
        i = 0
        n = len(did)
        while i < n:
            j = i
            while j < n and did[j] == did[i]:
                j += 1
            ts = sorted(w for w in tok[i:j] if w in kp)
            for x in range(len(ts)):
                for y in range(x + 1, len(ts)):
                    a_out.append(ts[x])
                    b_out.append(ts[y])
            i = j
        return pa.table({"pair": pa.array(
            [a + " " + b for a, b in zip(a_out, b_out)], pa.string()),
            "one": pa.array(np.ones(len(a_out), np.int64))})

    pc_tbl = group_sum(dt.map_batches(pair_rows, batch_format="pyarrow"),
                       "pair", ["one"], rename={"one": "c_ab"})
    cand = pc_tbl.map_batches(
        lambda t: t.filter(pc.greater_equal(
            t["c_ab"], pa.scalar(min_pair, pa.int64()))),
        batch_format="pyarrow").take_all()

    rows = []
    for r in cand:
        a, b = r["pair"].split(" ")
        num = float(r["c_ab"] * n_docs)
        den = float(kept[a] * kept[b])
        pmi = int(np.floor(np.log(num / den) * 1e6))
        rows.append((a, b, int(r["c_ab"]), pmi))
    rows.sort(key=lambda t: (-t[3], t[0], t[1]))
    rows = rows[:k]
    return pd.DataFrame({
        "tok_a": [r[0] for r in rows],
        "tok_b": [r[1] for r in rows],
        "c_ab": pd.array([r[2] for r in rows], dtype="int64"),
        "pmi_micro": pd.array([r[3] for r in rows], dtype="int64")})


def token_diversity(ds, group_col: str = "source", text_col: str = "text",
                    n_parts: int = 64) -> pd.DataFrame:
    """Simpson lexical diversity per group: ``1 − Σ p_i²`` over the
    group's token distribution (Simpson 1949's diversity index — the
    curation signal for template/boilerplate-dominated sources: a source
    stuck on one phrase scores near 0, a diverse one near 1).

    Exact floored micro units by cross-multiplication — ``1e6 −
    Σcnt²·1e6 // total²`` — no division until the final fold.  Dataflow:
    per-block (group, term, c) partials → one (group, term) hash
    partition (complete term groups ⇒ exact global counts) → each
    partition pre-folds per-group (Σcnt, Σcnt²) with Σcnt² carried as a
    DECIMAL STRING (squares of corpus-scale counts pass 2⁶³ — the
    group_moments HUGEINT-class convention) → constant-bounded driver
    fold in pure-Python int.  Returns (source, n_tokens,
    diversity_micro) sorted by source.
    """
    import hashlib

    tok_re = re.compile(r"[a-z0-9]+")

    def partial(t: pa.Table) -> pa.Table:
        gs, ts = [], []
        for g, txt in zip(t[group_col].to_pylist(),
                          t[text_col].to_pylist()):
            toks = tok_re.findall((txt or "").lower())
            gs.extend([g] * len(toks))
            ts.extend(toks)
        df = (pd.DataFrame({"g": gs, "t": ts})
              .groupby(["g", "t"], as_index=False).size())
        return pa.table({"g": pa.array(df["g"], pa.string()),
                         "t": pa.array(df["t"], pa.string()),
                         "c": pa.array(df["size"].to_numpy(np.int64))})

    def addp(t: pa.Table) -> pa.Table:
        part = np.fromiter(
            (int(hashlib.md5(f"{g}\x00{s}".encode()).hexdigest()[:8], 16)
             % n_parts
             for g, s in zip(t["g"].to_pylist(), t["t"].to_pylist())),
            np.int32, count=t.num_rows)
        return t.append_column("_part", pa.array(part, pa.int32()))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        cnt = g.groupby(["g", "t"], as_index=False)["c"].sum()
        out = []
        for src, sub in cnt.groupby("g"):
            cs = sub["c"].to_numpy(np.int64)
            sq = sum(int(c) * int(c) for c in cs)     # python int — exact
            out.append((src, int(cs.sum()), str(sq)))
        return pd.DataFrame(out, columns=["g", "n", "sq"])

    parts = (ds.map_batches(partial, batch_format="pyarrow")
             .map_batches(addp, batch_format="pyarrow")
             .groupby("_part")
             .map_groups(lambda g: fold(g.drop(columns="_part")),
                         batch_format="pandas")
             .to_pandas())
    rows = []
    for src, sub in parts.groupby("g"):
        n = int(sub["n"].sum())
        sq = sum(int(s) for s in sub["sq"])
        rows.append((src, n, 1_000_000 - sq * 1_000_000 // (n * n)))
    out = pd.DataFrame(rows, columns=["source", "n_tokens",
                                      "diversity_micro"])
    out["n_tokens"] = out["n_tokens"].astype("int64")
    out["diversity_micro"] = out["diversity_micro"].astype("int64")
    return out.sort_values("source").reset_index(drop=True)
