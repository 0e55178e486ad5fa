"""Unit tests for downstream operator stages (golden fixtures, FIXTURES.md §5)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from vyntr_ray.functions.fingerprint import RequestFingerprint
from vyntr_ray.functions.project import extract_relevant_text
from vyntr_ray.sources.seeds import read_seed_file
from vyntr_ray.stages.clean import clean_batch, clean_text
from vyntr_ray.stages.dedup import jaccard, word_shingles
from vyntr_ray.stages.embed import CHUNK_DEFAULTS, Chunker, StubEncoder, chunk_tokens
from vyntr_ray.stages.index_prep import generate_preview, prep_batch
from vyntr_ray.stages.multimodal import (FrameSampler, ImageDecoder,
                                         make_fake_image, make_fake_video)
from vyntr_ray.state.politeness import PolitenessPolicy


class TestCleaner:
    # content_cleaner.js:20-37 in/out pairs, order-sensitive
    @pytest.mark.parametrize("raw,cleaned", [
        ("a  \t b　c", "a b c"),                       # spaces incl ideographic
        ("x <b>y</b> z", "x y z"),
        ("a &amp; b &#169; &#x1f4a9; c", "a  b   c"),  # entities (no re-collapse: spaces pass ran first)
        ("a\x01b\x0bc\x7fd", "abcd"),                  # control chars
        ("a�b", "ab"),
        ("see [label](http://x) end", "see label end"),
        ('path?query=1&x="2 tail', 'path"2 tail'),   # ?query strip stops at quote
        ("a\n\n\n\n\nb", "a\n\nb"),                    # ≥3 newlines → 2
        ("  trimmed  ", "trimmed"),
        # chain order: tags first produce text that spaces already collapsed
        ("<p>a</p>   <p>b</p>", "a b"),
    ])
    def test_golden(self, raw, cleaned):
        assert clean_text(raw) == cleaned

    def test_drop_rule_and_passthrough(self):
        t = pa.table({
            "text": ["keep", "   ", "<i></i>"],
            "meta": [None, [], [{"name": "a", "content": "b"}]],
        })
        out = clean_batch(t, "text", "meta")
        # row 1: cleans to "" + empty meta → dropped; row 2: "" but meta → kept
        assert out["text"].to_pylist() == ["keep", ""]

    def test_non_string_passthrough(self):
        t = pa.table({"text": pa.array([None, "x  y"], pa.string())})
        out = clean_batch(t, "text")
        assert out["text"].to_pylist() == [None, "x y"]

    def test_stats_accumulate(self):
        stats = {}
        clean_text("a  b <i>c</i>", stats)
        assert stats["spaces"] == 1 and stats["tags"] == 7


class TestChunker:
    def test_single_chunk(self):
        assert chunk_tokens(100) == [100]
        assert chunk_tokens(0) == []

    def test_multi_chunk_windows(self):
        # eff = 512-2-15 = 495, stride 445
        eff, stride = 495, 445
        n = 1000
        out = chunk_tokens(n)
        assert out == [eff, eff, n - 2 * stride]
        assert len(out) == -(-n // stride)

    def test_chunker_batch_matches_chunk_tokens(self):
        text_long = " ".join(f"t{i}" for i in range(1000))
        t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                      "text": ["short text here", text_long]})
        out = Chunker()(t)
        df = out.to_pandas()
        assert df[df.doc_id == 1]["n_tokens"].tolist() == [3]
        assert df[df.doc_id == 2]["n_tokens"].tolist() == chunk_tokens(1000)
        assert df[df.doc_id == 2]["chunk_id"].tolist() == [0, 1, 2]
        # overlap: chunk 1 starts stride tokens in
        c0, c1 = df[df.doc_id == 2]["chunk_text"].iloc[:2]
        assert c0.split()[445] == c1.split()[0]

    def test_defaults_match_reference_config(self):
        # generate_embeddings.py:39-41: 512 tokens, 50 overlap
        assert CHUNK_DEFAULTS["max_tokens"] == 512
        assert CHUNK_DEFAULTS["overlap"] == 50


class TestStubEncoder:
    def test_deterministic_across_instances(self):
        a = StubEncoder(dim=8).encode(["hello world"])
        b = StubEncoder(dim=8).encode(["hello world"])
        np.testing.assert_array_equal(a, b)

    def test_mean_pool_semantics(self):
        enc = StubEncoder(dim=8)
        hw = enc.encode(["hello world"])[0]
        h = enc.encode(["hello"])[0]
        w = enc.encode(["world"])[0]
        np.testing.assert_allclose(hw, (h + w) / 2, rtol=1e-6)


class TestIndexPrep:
    def test_preview_rust_semantics(self):
        # pulse/src/main.rs:24-33: trim; chars (not bytes); "..." suffix
        assert generate_preview("  short  ") == "short"
        long = "é" * 600
        out = generate_preview(long)
        assert out == "é" * 500 + "..."

    def test_prep_batch(self):
        t = pa.table({"text": ["  hi  ", "x" * 501],
                      "lang": [None, ""]})
        out = prep_batch(t)
        assert out["preview"].to_pylist() == ["hi", "x" * 500 + "..."]
        assert out["lang"].to_pylist() == ["en", "en"]


class TestPoliteness:
    def _frontier(self, n_per_domain):
        rows = []
        seq = 0
        for d, n in n_per_domain.items():
            for _ in range(n):
                rows.append({"seq": seq, "url": f"https://{d}/p/{seq}",
                             "domain": d})
                seq += 1
        return pd.DataFrame(rows)

    def test_stateless_cap(self):
        pol = PolitenessPolicy(max_per_domain=5)
        f = self._frontier({"a": 8, "b": 3})
        got, rest = pol.select(f)
        assert got.groupby("domain").size().to_dict() == {"a": 5, "b": 3}
        assert len(rest) == 3
        # FIFO: lowest seqs selected
        assert got[got.domain == "a"]["seq"].tolist() == list(range(5))

    def test_token_bucket_refill(self):
        pol = PolitenessPolicy(max_per_domain=4, refill=2)
        f = self._frontier({"a": 20})
        got1, rest = pol.select(f)      # fresh bucket: full capacity 4
        assert len(got1) == 4
        got2, rest = pol.select(rest)   # refill 2 → only 2
        assert len(got2) == 2
        got3, rest = pol.select(rest)
        assert len(got3) == 2

    def test_robots(self):
        pol = PolitenessPolicy(robots={"h.example": ["/private/"]})
        assert not pol.allowed("https://h.example/private/x")
        assert pol.allowed("https://h.example/public/x")
        assert pol.allowed("https://other.example/private/x")

    def test_snapshot_roundtrip(self):
        pol = PolitenessPolicy(max_per_domain=4, refill=1)
        pol.select(self._frontier({"a": 10}))
        snap = pol.snapshot()
        pol2 = PolitenessPolicy()
        pol2.restore(snap)
        assert pol2.budget_of("a") == pol.budget_of("a")


class TestDedupPrimitives:
    def test_shingles_and_jaccard(self):
        s1 = set(word_shingles("a b c d e", 3))
        assert s1 == {"a b c", "b c d", "c d e"}
        s2 = set(word_shingles("a b c d x", 3))
        assert jaccard(s1, s2) == pytest.approx(2 / 4)
        assert jaccard(set(), set()) == 1.0

    def test_minhash_similarity_estimate(self):
        from vyntr_ray.stages.dedup import MinHasher
        mh = MinHasher(n_perm=128)
        t1 = " ".join(f"w{i}" for i in range(100))
        t2 = " ".join(f"w{i}" for i in range(95)) + " x1 x2 x3 x4 x5"
        sig1, sig2 = mh.signature(t1), mh.signature(t2)
        est = (sig1 == sig2).mean()
        true = jaccard(set(word_shingles(t1)), set(word_shingles(t2)))
        assert abs(est - true) < 0.15

    def test_simhash_similar_texts_close(self):
        from vyntr_ray.stages.dedup import simhash_batch
        t = pa.table({
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": ["the quick brown fox jumps over the lazy dog " * 5,
                     "the quick brown fox jumps over the lazy cat " * 5,
                     "completely different words entirely unrelated here"],
        })
        fps = simhash_batch(t)["simhash"].to_pylist()
        ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
        assert ham(fps[0], fps[1]) < ham(fps[0], fps[2])


class TestMultimodal:
    def test_image_decode_golden(self):
        blob = make_fake_image(8, 4, seed=3)
        dec = ImageDecoder()
        t = pa.table({"doc_id": pa.array([7], pa.int64()),
                      "image": pa.array([blob], pa.binary())})
        out = dec(t)
        assert out["width"].to_pylist() == [8]
        assert out["height"].to_pylist() == [4]
        assert "image" not in out.schema.names       # blob dropped
        feats = out["features"].to_pylist()[0]
        assert len(feats) == 16
        assert abs(sum(feats) - 1.0) < 1e-5
        # determinism
        assert dec(t)["pixel_md5"].to_pylist() == out["pixel_md5"].to_pylist()

    def test_image_unknown_codec_raises(self):
        dec = ImageDecoder()
        if dec._pil is None:
            t = pa.table({"image": pa.array([b"JUNKDATA"], pa.binary())})
            with pytest.raises(NotImplementedError):
                dec(t)

    def test_frame_sampler(self):
        blob = make_fake_video(6, 4, 4, seed=1)
        t = pa.table({"doc_id": pa.array([1], pa.int64()),
                      "video": pa.array([blob], pa.binary())})
        out = FrameSampler(every=2)(t)
        assert out["frame"].to_pylist() == [0, 2, 4]


class TestFingerprint:
    def test_deterministic_per_ip(self):
        a = RequestFingerprint("10.0.0.1", "https://h.example/a/b")
        b = RequestFingerprint("10.0.0.1", "https://h.example/a/b")
        assert a.user_agent == b.user_agent
        assert a.referrer == b.referrer

    def test_root_path_never_referrer(self):
        for ip in (f"10.0.0.{i}" for i in range(30)):
            fp = RequestFingerprint(ip, "https://h.example/")
            assert fp.referrer is None

    def test_referrer_is_origin(self):
        hits = [RequestFingerprint(f"ip-{i}-x", "https://h.example/deep/x")
                .referrer for i in range(1000)]
        non_null = [r for r in hits if r is not None]
        assert non_null and all(r == "https://h.example/" for r in non_null)
        drop_rate = 1 - len(non_null) / 1000
        assert 0.05 < drop_rate < 0.20  # ~10% dropped


def test_extract_relevant_text_golden():
    # generate_embeddings.py:90-105
    entry = {"title": "T", "content_text": "C",
             "meta_tags": [{"name": "keywords", "content": "k"},
                           {"name": "description", "content": "D1"},
                           {"name": "description", "content": "D2"}]}
    assert extract_relevant_text(entry) == "Title: T\nDescription: D1\nContent: C"
    assert extract_relevant_text({}) == "Title: \nDescription: \nContent:"


def test_read_seed_file(tmp_path):
    p = tmp_path / "sites.txt"
    p.write_text("  https://a.example \n\n host.b \n")
    assert read_seed_file(str(p)) == ["https://a.example", "host.b"]


@pytest.mark.usefixtures("ray_session")
class TestDistributedStages:
    def test_minhash_pairs_find_planted_dups(self):
        import ray.data as rd

        from vyntr_ray.stages.dedup import minhash_lsh_pairs
        base = [" ".join(f"w{i}_{d}" for i in range(60)) for d in range(10)]
        rows = [{"doc_id": d, "text": t} for d, t in enumerate(base)]
        # planted near-dups: drop the last 3 words
        rows += [{"doc_id": 100 + d, "text": " ".join(t.split()[:-3])}
                 for d, t in enumerate(base[:4])]
        pairs = minhash_lsh_pairs(rd.from_items(rows),
                                  threshold=0.7).to_pandas()
        got = set(zip(pairs["a"], pairs["b"]))
        assert {(d, 100 + d) for d in range(4)} <= got
        # no cross-document false positives (disjoint vocabularies)
        assert all(b - a == 100 for a, b in got)

    def test_simhash_pairs_find_planted_dups(self):
        import ray.data as rd

        from vyntr_ray.stages.dedup import simhash_pairs
        base = [" ".join(f"tok{i}_{d}" for i in range(80)) for d in range(6)]
        rows = [{"doc_id": d, "text": t} for d, t in enumerate(base)]
        rows += [{"doc_id": 100, "text": base[0].replace("tok3_0", "zzz")}]
        pairs = simhash_pairs(rd.from_items(rows), max_hamming=8).to_pandas()
        got = set(zip(pairs["a"], pairs["b"]))
        assert (0, 100) in got

    def test_ivf_recall_vs_brute_force(self):
        import ray.data as rd

        from vyntr_ray.stages.similarity import cosine_topk, ivf_topk, query_vector
        rng = np.random.default_rng(5)
        centers = rng.standard_normal((4, 16)) * 3
        rows = []
        for i in range(200):
            label = i % 4
            v = centers[label] + rng.standard_normal(16) * 0.5
            rows.append({"vec_id": i, "label": label,
                         "embedding": v.astype(np.float32).tolist()})
        ds = rd.from_items(rows)
        q = query_vector(16, seed=3)
        brute = [r["vec_id"] for r in cosine_topk(ds, q, k=10).take_all()]
        approx = [r["vec_id"] for r in
                  ivf_topk(rd.from_items(rows), q, k=10, nprobe=2).take_all()]
        recall = len(set(brute) & set(approx)) / 10
        assert recall >= 0.7

    def test_bm25_index_build_and_ranked_search(self, tmp_path):
        import ray.data as rd

        from vyntr_ray.stages.search_index import (bm25_topk,
                                                   build_text_index,
                                                   index_summary)
        rows = [
            {"doc_id": 0, "text": "apple apple apple banana"},
            {"doc_id": 1, "text": "apple banana cherry"},
            {"doc_id": 2, "text": "cherry cherry date date date"},
            {"doc_id": 3, "text": "banana date elderberry fig grape"},
        ]
        idx = build_text_index(rd.from_items(rows), cache_key="t",
                               cache_root=str(tmp_path))
        summ = index_summary(idx).to_pandas().set_index("term")
        assert summ.loc["apple", "df"] == 2
        assert summ.loc["apple", "total_tf"] == 4
        assert summ.loc["date", "df"] == 2
        top = bm25_topk(idx, ["apple"], k=2).to_pandas()
        # doc 0 has tf=3 of 'apple' in a 4-token doc — must outrank doc 1
        assert list(top["doc_id"]) == [0, 1]
        # rebuild is a no-op (idempotent _SUCCESS contract)
        assert build_text_index(rd.from_items(rows), cache_key="t",
                                cache_root=str(tmp_path)) == idx

    def test_bm25_hot_term_block_split(self, tmp_path):
        # a stop-word-grade term's postings must split into (term,
        # doc-block) sub-lists — bounded rows — while summary and BM25
        # results stay identical to the unsplit index
        import pyarrow.parquet as _pq
        import ray.data as rd

        from vyntr_ray.stages.search_index import (bm25_topk,
                                                   build_text_index,
                                                   index_summary)
        rows = [{"doc_id": i,
                 "text": "the common word " + (f"rare{i} " * (i % 3 + 1))}
                for i in range(40)]
        idx1 = build_text_index(rd.from_items(rows), cache_key="whole",
                                cache_root=str(tmp_path))
        idx2 = build_text_index(rd.from_items(rows), cache_key="split",
                                cache_root=str(tmp_path), block_span=8)

        split_tab = _pq.read_table(idx2, columns=["term", "block", "df"])
        hot = split_tab.to_pandas().query("term == 'common'")
        assert len(hot) == 5                      # 40 docs / span 8
        assert (hot["df"] == 8).all()             # block-level df
        assert sorted(hot["block"]) == [0, 1, 2, 3, 4]

        s1 = index_summary(idx1).to_pandas().sort_values("term") \
                                .reset_index(drop=True)
        s2 = index_summary(idx2).to_pandas().sort_values("term") \
                                .reset_index(drop=True)
        pd.testing.assert_frame_equal(s1, s2)
        assert int(s2.set_index("term").loc["common", "df"]) == 40

        t1 = bm25_topk(idx1, ["common", "rare7"], k=5).to_pandas()
        t2 = bm25_topk(idx2, ["common", "rare7"], k=5).to_pandas()
        pd.testing.assert_frame_equal(t1, t2)

    def test_kmeans_ivf_recall_and_pruned_read(self):
        import os

        import ray.data as rd

        from vyntr_ray.stages.similarity import (CACHE_DIR, assign_cells,
                                                 cosine_topk, ivf_topk,
                                                 kmeans_cells, query_vector)
        rng = np.random.default_rng(11)
        centers = rng.standard_normal((6, 16)) * 3
        rows = [{"vec_id": i,
                 "embedding": (centers[i % 6]
                               + rng.standard_normal(16) * 0.5)
                 .astype(np.float32).tolist()}
                for i in range(300)]
        ds = rd.from_items(rows)
        cen = kmeans_cells(ds, n_cells=6, iters=5)
        assert cen.shape == (6, 16)
        celled = assign_cells(ds, cen)
        q = query_vector(16, seed=3)
        key = "test_kmeans_pruned"
        approx = [r["vec_id"] for r in
                  ivf_topk(celled, q, k=10, nprobe=3, cell_col="cell",
                           cache_key=key).take_all()]
        brute = [r["vec_id"] for r in cosine_topk(ds, q, k=10).take_all()]
        assert len(set(brute) & set(approx)) / 10 >= 0.7
        # pruned-read evidence: the layout holds every cell, yet the probe
        # touched only nprobe of the cell dirs' bytes
        layout = os.path.join(CACHE_DIR, key)
        dirs = [d for d in os.listdir(layout) if d.startswith("cell=")]
        assert len(dirs) >= 5  # all learned cells materialized

        def dir_bytes(d):
            p = os.path.join(layout, d)
            return sum(os.path.getsize(os.path.join(p, f))
                       for f in os.listdir(p))

        total = sum(dir_bytes(d) for d in dirs)
        # the probe reads exactly 3 cell dirs; even the 3 LARGEST dirs are
        # well under the full layout, bounding scanned bytes < 75% of index
        probed_upper = sum(sorted(dir_bytes(d) for d in dirs)[-3:])
        assert probed_upper < 0.75 * total

    def test_cleaning_stats_pipeline(self):
        import ray.data as rd

        from vyntr_ray.stages.clean import cleaning_stats
        ds = rd.from_items([{"doc_id": 1, "text": "a  b <i>c</i>"},
                            {"doc_id": 2, "text": "x &amp; y"}])
        res = cleaning_stats(ds)
        assert res["sum(red_spaces)"] == 1
        assert res["sum(red_tags)"] == 7
        assert res["sum(red_entities)"] == 5

    def test_decontaminate_drops_ngram_overlap(self):
        import ray.data as rd

        from vyntr_ray.stages.text_analysis import (benchmark_ngrams,
                                                    contamination_report,
                                                    decontaminate)
        bench = rd.from_items([
            {"doc_id": 100, "text": "the quick brown fox jumps"}])
        corpus = rd.from_items([
            # shares the 3-gram "quick brown fox" twice
            {"doc_id": 1, "text": "a quick brown fox and a quick brown "
                                  "fox again"},
            {"doc_id": 2, "text": "completely unrelated words here"},
            {"doc_id": 3, "text": "Punctuation! The QUICK, brown fox"},
        ])
        grams = benchmark_ngrams(bench, n=3)
        assert "quick brown fox" in grams and len(grams) == 3

        rep = {r["doc_id"]: r["n_matched"] for r in contamination_report(
            corpus, grams, n=3).take_all()}
        # doc 1: two instances; doc 3: tokenizer lowercases + strips
        # punctuation so "the quick brown" and "quick brown fox" both hit
        assert rep == {1: 2, 2: 0, 3: 2}

        clean = decontaminate(corpus, bench, n=3).take_all()
        assert [r["doc_id"] for r in clean] == [2]

    def test_repetition_signals(self):
        from vyntr_ray.stages.text_analysis import repetition_batch
        t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                      "text": ["aa\nbb\naa\n\ncc",       # 1 dup of 4 lines
                               "x y x y z",             # top 2-gram "x y" x2
                               ""]})
        out = repetition_batch(t).to_pandas().set_index("doc_id")
        assert out.loc[1, "n_lines"] == 4
        assert out.loc[1, "dup_line_ppm"] == 250_000
        assert out.loc[1, "dup_line_char_ppm"] == 2 * 1_000_000 // 8
        assert out.loc[2, "n_lines"] == 1 and out.loc[2, "dup_line_ppm"] == 0
        # "x y" count 2, len 3, text len 9
        assert out.loc[2, "top2gram_ppm"] == 2 * 3 * 1_000_000 // 9
        assert (out.loc[3].drop("text") == 0).all()

    def test_knn_join_exact_across_blocks(self):
        import ray.data as rd

        from vyntr_ray.stages.similarity import knn_join
        rng = np.random.Generator(np.random.PCG64(11))
        vecs = rng.standard_normal((120, 8))
        rows = [{"vec_id": i, "embedding": vecs[i].tolist()}
                for i in range(120)]
        q_ids = np.array([0, 50], np.int64)
        # many small blocks: partial top-k + merge must equal brute force
        ds = rd.from_items(rows, override_num_blocks=10)
        got = knn_join(ds, vecs[q_ids], q_ids, k=3).to_pandas()

        sims = np.round(
            (vecs / np.linalg.norm(vecs, axis=1, keepdims=True))
            @ (vecs[q_ids] / np.linalg.norm(vecs[q_ids], axis=1,
                                            keepdims=True)).T, 4)
        for ci, qid in enumerate(q_ids):
            order = np.lexsort((np.arange(120), -sims[:, ci]))
            expect = [i for i in order if i != qid][:3]
            sub = got[got.query_id == qid].sort_values(
                ["score", "vec_id"], ascending=[False, True])
            assert sub["vec_id"].tolist() == expect
            assert qid not in sub["vec_id"].tolist()

    def test_sampling_operators(self):
        import hashlib

        import ray.data as rd

        from vyntr_ray.stages.sampling import hash_sample, token_budget_sample
        rows = [{"doc_id": i, "text": " ".join(["w"] * (i % 7 + 1))}
                for i in range(200)]
        ds = rd.from_items(rows, override_num_blocks=8)

        got = sorted(r["doc_id"] for r in
                     hash_sample(ds, rate_ppm=250_000).take_all())
        exp = [i for i in range(200)
               if hashlib.md5(str(i).encode()).hexdigest()[:8] < "40000000"]
        assert got == exp and 20 < len(got) < 80

        budget = 150
        got2 = sorted(r["doc_id"] for r in
                      token_budget_sample(ds, budget,
                                          n_buckets=16).take_all())
        order = sorted(range(200),
                       key=lambda i: (hashlib.md5(str(i).encode())
                                      .hexdigest(), i))
        acc, exp2 = 0, []
        for i in order:
            tok = i % 7 + 1
            if acc + tok > budget:
                break
            acc += tok
            exp2.append(i)
        assert got2 == sorted(exp2)

    def test_token_budget_sample_edges(self):
        import ray.data as rd

        from vyntr_ray.stages.sampling import token_budget_sample
        rows = [{"doc_id": i, "text": "a b c"} for i in range(30)]
        ds = rd.from_items(rows, override_num_blocks=4)
        assert token_budget_sample(ds, 0, n_buckets=16).count() == 0
        assert token_budget_sample(ds, 2, n_buckets=16).count() == 0
        assert token_budget_sample(ds, 10**9, n_buckets=16).count() == 30
        assert token_budget_sample(ds, 3 * 7, n_buckets=16).count() == 7

    def test_shuffle_export(self, tmp_path):
        import hashlib
        import os

        import pyarrow.parquet as pq
        import ray.data as rd

        from vyntr_ray.stages.sampling import shuffle_export

        rows = [{"doc_id": i, "text": " ".join(["w"] * (i % 5 + 1))}
                for i in range(120)]
        ds = rd.from_items(rows, override_num_blocks=6)
        out = str(tmp_path / "export")
        man = {r["shard"]: (r["n_docs"], r["n_tokens"])
               for r in shuffle_export(ds, out, n_shards=8).take_all()}

        hx = {i: hashlib.md5(str(i).encode()).hexdigest()
              for i in range(120)}
        exp_shard = {i: int(hx[i][:8], 16) % 8 for i in range(120)}

        seen = []
        for s in sorted(man):
            t = pq.read_table(os.path.join(out, f"shard-{s:05d}.parquet"))
            ids = t["doc_id"].to_pylist()
            # within-shard order is (md5 hex, doc_id) — the shuffle
            exp_ids = sorted((i for i in range(120)
                              if exp_shard[i] == s),
                             key=lambda i: (hx[i], i))
            assert ids == exp_ids
            assert man[s] == (len(ids),
                              sum(i % 5 + 1 for i in ids))
            seen += ids
        assert sorted(seen) == list(range(120))
        # atomic writes: no temp files survive
        assert not [f for f in os.listdir(out) if f.endswith(".tmp")]
        assert sum(d for d, _ in man.values()) == 120

    def test_weighted_mix_rates(self):
        import ray.data as rd

        from vyntr_ray.stages.sampling import hash_sample, weighted_mix
        rows = [{"doc_id": i, "source": f"s{i % 2}"} for i in range(300)]
        ds = rd.from_items(rows, override_num_blocks=6)
        got = weighted_mix(ds, {"s0": 1_000_000, "s1": 200_000}).take_all()
        s0 = [r["doc_id"] for r in got if r["source"] == "s0"]
        s1 = sorted(r["doc_id"] for r in got if r["source"] == "s1")
        assert len(s0) == 150            # 100% rate keeps every s0 row
        # s1 must equal a plain hash_sample at the same rate
        only_s1 = rd.from_items([r for r in rows if r["source"] == "s1"])
        exp = sorted(r["doc_id"] for r in
                     hash_sample(only_s1, 200_000).take_all())
        assert s1 == exp and 0 < len(s1) < 150

    def test_hf_encoder_seam_gated(self):
        # the real-model drop-in must exist and fail CLEANLY without torch
        import pytest as _pytest

        from vyntr_ray.stages.embed import HFEncoder
        with _pytest.raises(ImportError, match="torch"):
            HFEncoder()

    def test_asof_join_semantics(self):
        import datetime as dt

        import ray.data as rd

        from vyntr_ray.stages.joins import asof_join
        base = dt.datetime(2024, 1, 1)
        clicks = [{"user_id": u, "ts": base + dt.timedelta(seconds=s),
                   "event_id": i}
                  for i, (u, s) in enumerate([(1, 10), (1, 20), (2, 5),
                                              (3, 7)])]
        views = [{"user_id": u, "ts": base + dt.timedelta(seconds=s),
                  "event_id": 100 + i}
                 for i, (u, s) in enumerate([(1, 8), (1, 15), (2, 50),
                                             (4, 1)])]
        out = asof_join(rd.from_items(clicks), rd.from_items(views),
                        "user_id", "ts", ["event_id"],
                        ["event_id"]).to_pandas()
        out = out.sort_values("event_id").reset_index(drop=True)
        # click 0 (t=10) -> view 100 (t=8); click 1 (t=20) -> view 101
        # (t=15); user 2's only view is later (inner: dropped); user 3
        # has no views; user 4 has no clicks
        assert out["event_id"].tolist() == [0, 1]
        assert out["r_event_id"].tolist() == [100, 101]
        assert str(out["event_id"].dtype) == "int64"   # no float upcast

    def test_range_count_join(self):
        import datetime as dt

        import ray.data as rd

        from vyntr_ray.stages.joins import range_count_join
        base = dt.datetime(2024, 1, 1)
        left = [{"user_id": 1, "ts": base + dt.timedelta(seconds=100),
                 "event_id": 0},
                {"user_id": 2, "ts": base + dt.timedelta(seconds=100),
                 "event_id": 1}]
        # user 1: clicks at 40 (outside 50s window), 50 (boundary: in),
        # 100 (boundary: in), 101 (after: out); user 2: none
        right = [{"user_id": 1, "ts": base + dt.timedelta(seconds=s),
                  "event_id": 10 + i}
                 for i, s in enumerate([40, 50, 100, 101])]
        out = range_count_join(
            rd.from_items(left), rd.from_items(right), "user_id", "ts",
            ["event_id"], window_us=50,   # from_items ts unit = seconds
            count_name="n").to_pandas().sort_values("event_id")
        assert out["n"].tolist() == [2, 0]
        assert str(out["n"].dtype) == "int64"

    def test_group_quantiles_disc_convention(self):
        import ray.data as rd

        from vyntr_ray.stages.dataset_tools import group_quantiles
        rows = [{"g": "a", "v": float(i)} for i in range(1, 11)]  # 1..10
        rows += [{"g": "b", "v": float(i)} for i in range(1, 5)]  # 1..4
        out = group_quantiles(rd.from_items(rows, override_num_blocks=3),
                              "g", "v").to_pandas().set_index("g")
        # ceil(q*n)-1 selection (DuckDB quantile_disc)
        assert out.loc["a"].tolist() == [3.0, 5.0, 10.0]
        assert out.loc["b"].tolist() == [1.0, 2.0, 4.0]

    def test_group_topk_across_blocks(self):
        import ray.data as rd

        from vyntr_ray.stages.dataset_tools import group_topk
        rows = [{"g": f"g{i % 3}", "id": i, "v": float((i * 7) % 50)}
                for i in range(90)]
        ds = rd.from_items(rows, override_num_blocks=9)
        got = group_topk(ds, "g", "v", "id", k=2).to_pandas()
        for g in ("g0", "g1", "g2"):
            exp = sorted([r for r in rows if r["g"] == g],
                         key=lambda r: (-r["v"], r["id"]))[:2]
            sub = got[got.g == g].sort_values(["v", "id"],
                                             ascending=[False, True])
            assert sub["id"].tolist() == [r["id"] for r in exp]

    def test_group_quantiles_approx_within_bin_width(self):
        import ray.data as rd

        from vyntr_ray.stages.dataset_tools import (group_quantiles,
                                                    group_quantiles_approx)
        rng = np.random.Generator(np.random.PCG64(5))
        rows = [{"g": f"g{i % 2}", "v": float(rng.uniform(0, 100))}
                for i in range(4000)]
        ds = rd.from_items(rows, override_num_blocks=8)
        exact = group_quantiles(ds, "g", "v").to_pandas().set_index("g")
        approx = group_quantiles_approx(
            rd.from_items(rows, override_num_blocks=8), "g", "v",
            n_bins=1000).to_pandas().set_index("g")
        width = 100.0 / 1000
        for g in ("g0", "g1"):
            for q in ("q25", "q50", "q95"):
                assert abs(approx.loc[g, q] - exact.loc[g, q]) <= \
                    2 * width + 1e-9

    def test_pivot_counts_discovers_categories(self):
        import ray.data as rd

        from vyntr_ray.stages.dataset_tools import pivot_counts
        rows = [{"k": i % 4, "c": ["x", "y", "x", "z"][i % 4]}
                for i in range(80)]
        ds = rd.from_items(rows, override_num_blocks=5)
        out = pivot_counts(ds, "k", "c").to_pandas() \
            .sort_values("k").reset_index(drop=True)
        assert list(out.columns) == ["k", "n_x", "n_y", "n_z"]
        assert out["n_x"].tolist() == [20, 0, 20, 0]
        assert out["n_y"].tolist() == [0, 20, 0, 0]
        assert out["n_z"].tolist() == [0, 0, 0, 20]

    def test_rolling_sum_window_frame(self):
        import datetime as dt

        import ray.data as rd

        from vyntr_ray.stages.windows import rolling_sum
        base = dt.datetime(2024, 1, 1)
        rows = [{"event_id": i, "user_id": 1,
                 "ts": base + dt.timedelta(seconds=i),
                 "value": float(i + 1)}           # 1.0, 2.0, ...
                for i in range(6)]
        out = rolling_sum(rd.from_items(rows, override_num_blocks=3),
                          k=3).to_pandas().sort_values("event_id")
        # windows: [1], [1,2], [1,2,3], [2,3,4], [3,4,5], [4,5,6]
        assert out["roll_centi"].tolist() == [100, 300, 600, 900,
                                              1200, 1500]

    def test_hll_and_exact_distinct(self):
        import ray.data as rd

        from vyntr_ray.stages.sketches import (group_count_distinct,
                                               hll_count_distinct)
        rows = [{"g": f"g{i % 2}", "v": f"u{i % 500}"} for i in range(5000)]
        ds = rd.from_items(rows, override_num_blocks=8)
        exact = {r["g"]: r["n_distinct"] for r in
                 group_count_distinct(ds, "g", "v").take_all()}
        assert exact == {"g0": 250, "g1": 250}
        approx = {r["g"]: r["approx_distinct"] for r in
                  hll_count_distinct(
                      rd.from_items(rows, override_num_blocks=8),
                      "g", "v").take_all()}
        for g in ("g0", "g1"):
            assert abs(approx[g] - 250) / 250 < 0.05
        # determinism: same input, different blocking -> same estimate
        approx2 = {r["g"]: r["approx_distinct"] for r in
                   hll_count_distinct(
                       rd.from_items(rows, override_num_blocks=3),
                       "g", "v").take_all()}
        assert approx == approx2

    def test_pagerank_matches_dense_reference(self):
        import ray.data as rd

        from vyntr_ray.stages.graph import pagerank
        # deterministic sparse digraph incl. a dangling node (7) and a
        # node with no in-links (1)
        rng = np.random.Generator(np.random.PCG64(3))
        n = 60
        edges = sorted({(int(u), int(v))
                        for u, v in rng.integers(0, n, (400, 2))
                        if u != v and u != 7})
        ds = rd.from_items([{"u": u, "v": v} for u, v in edges],
                           override_num_blocks=7)
        got = {r["node"]: r["rank"]
               for r in pagerank(ds, n_iter=10).take_all()}
        # dense reference over the same node universe
        nodes = sorted({x for e in edges for x in e})
        idx = {x: i for i, x in enumerate(nodes)}
        m = len(nodes)
        rank = np.full(m, 1.0 / m)
        outdeg = np.zeros(m)
        for u, _ in edges:
            outdeg[idx[u]] += 1
        for _ in range(10):
            contrib = np.zeros(m)
            for u, v in edges:
                contrib[idx[v]] += rank[idx[u]] / outdeg[idx[u]]
            dangling = rank[outdeg == 0].sum()
            rank = 0.15 / m + 0.85 * (contrib + dangling / m)
        assert set(got) == set(nodes)
        for x in nodes:
            assert abs(got[x] - rank[idx[x]]) < 1e-9, x
        assert abs(sum(got.values()) - 1.0) < 1e-9

    def test_pagerank_shuffle_path_parity(self):
        import ray.data as rd

        from vyntr_ray.stages.graph import pagerank
        edges = [{"u": i, "v": (i * 3) % 40} for i in range(40)
                 if i != (i * 3) % 40]
        a = {r["node"]: r["rank"]
             for r in pagerank(rd.from_items(edges, override_num_blocks=5),
                               n_iter=6).take_all()}
        b = {r["node"]: r["rank"]
             for r in pagerank(rd.from_items(edges, override_num_blocks=3),
                               n_iter=6,
                               shuffle_aggregate=True).take_all()}
        assert set(a) == set(b)
        for k in a:
            assert abs(a[k] - b[k]) < 1e-12

    def test_stratified_sample_exact_counts(self):
        import ray.data as rd

        from vyntr_ray.stages.sampling import stratified_sample
        rows = [{"g": f"g{i % 3}", "doc_id": i} for i in range(300)]
        out = stratified_sample(
            rd.from_items(rows, override_num_blocks=6),
            "g", key_col="doc_id", k=10).to_pandas()
        assert out.groupby("g").size().tolist() == [10, 10, 10]
        # determinism across blocking
        out2 = stratified_sample(
            rd.from_items(rows, override_num_blocks=2),
            "g", key_col="doc_id", k=10).to_pandas()
        assert sorted(out["doc_id"]) == sorted(out2["doc_id"])

    def test_tdigest_rank_error_and_merge_stability(self):
        # unit level: long-tailed values, digests built per 4k-batch and
        # merged in two different orders — rank error stays tiny at the
        # tails and the union is merge-order independent
        from vyntr_ray.stages.sketches import (tdigest_batch, tdigest_merge,
                                               tdigest_quantile)
        rng = np.random.Generator(np.random.PCG64(7))
        vals = rng.lognormal(3.0, 1.5, 100_000)
        blobs = [tdigest_batch(vals[i:i + 4096])
                 for i in range(0, len(vals), 4096)]
        d1 = tdigest_merge(blobs)
        d2 = tdigest_merge(list(reversed(blobs)))
        s = np.sort(vals)
        for q in (0.01, 0.25, 0.5, 0.95, 0.99, 0.999):
            e1 = tdigest_quantile(d1, q)
            assert e1 == tdigest_quantile(d2, q)   # order-independent
            rank = np.searchsorted(s, e1) / len(s)
            assert abs(rank - q) < 0.005
        # a digest is O(delta) bytes regardless of input rows
        assert len(d1) <= (2 + 2 * 101) * 8

    def test_group_quantiles_tdigest_matches_exact_ranks(self):
        import ray.data as rd

        from vyntr_ray.stages.dataset_tools import group_quantiles
        from vyntr_ray.stages.sketches import group_quantiles_tdigest
        rng = np.random.Generator(np.random.PCG64(11))
        rows = [{"g": f"g{i % 2}", "v": float(rng.lognormal(2.0, 1.0))}
                for i in range(6000)]
        ds = rd.from_items(rows, override_num_blocks=8)
        exact = group_quantiles(ds, "g", "v").to_pandas().set_index("g")
        approx = group_quantiles_tdigest(
            rd.from_items(rows, override_num_blocks=8),
            "g", "v").to_pandas().set_index("g")
        assert sorted(approx.index) == ["g0", "g1"]
        for g in ("g0", "g1"):
            sv = np.sort([r["v"] for r in rows if r["g"] == g])
            for qn, q in (("q25", .25), ("q50", .5), ("q95", .95)):
                rank = np.searchsorted(sv, approx.loc[g, qn]) / len(sv)
                assert abs(rank - q) < 0.01, (g, qn)
        # blocking invariance within tolerance of the exact answer
        approx2 = group_quantiles_tdigest(
            rd.from_items(rows, override_num_blocks=3),
            "g", "v").to_pandas().set_index("g")
        for g in ("g0", "g1"):
            for qn in ("q25", "q50", "q95"):
                span = abs(exact.loc[g, qn]) + 1.0
                assert abs(approx2.loc[g, qn] - approx.loc[g, qn]) \
                    < 0.05 * span

    def test_scrub_pii(self):
        from vyntr_ray.stages.clean import scrub_pii_batch
        t = pa.table({"text": [
            "mail a.b+c@x-y.co.uk now",
            "server at 192.168.1.1 and 10.0.0.2",
            "call +1-555-0100 100 or 555 123 4567",
            None,
        ]})
        out = scrub_pii_batch(t).to_pandas()
        assert out["text"][0] == "mail <EMAIL> now"
        assert out["text"][1] == "server at <IP> and <IP>"
        assert "<PHONE>" in out["text"][2]
        assert out["text"][3] == ""
        assert out["n_email"].tolist() == [1, 0, 0, 0]
        assert out["n_ip"].tolist() == [0, 2, 0, 0]
        assert out["n_phone"].tolist() == [0, 0, 2, 0]

    def test_audio_chunker(self):
        import ray.data as rd

        from vyntr_ray.stages.multimodal import (AudioChunker, chunk_audio,
                                                 make_fake_audio)
        blob = make_fake_audio(16_000 * 2 + 500, sample_rate=16_000, seed=1)
        t = pa.table({"doc_id": pa.array([7], pa.int64()),
                      "audio": pa.array([blob], pa.binary())})
        out = AudioChunker()(t).to_pandas()
        assert out["window"].tolist() == [0, 1, 2]       # 2 full + tail
        assert (out["abs_sum"] > 0).all()
        # deterministic across instances
        out2 = AudioChunker()(t).to_pandas()
        assert out["abs_sum"].tolist() == out2["abs_sum"].tolist()
        # actor-pool path end-to-end
        ds = rd.from_items([{"doc_id": 1, "audio": blob}])
        assert chunk_audio(ds).count() == 3
        # codec boundary: unknown payloads raise, not silently decode
        bad = pa.table({"doc_id": pa.array([1], pa.int64()),
                        "audio": pa.array([b"RIFF1234"], pa.binary())})
        with pytest.raises(NotImplementedError):
            AudioChunker()(bad)

    def test_connected_components_paths_agree(self):
        import ray.data as rd

        from vyntr_ray.stages.graph import connected_components
        rng = np.random.Generator(np.random.PCG64(9))
        # random forest of chains: node i links to i - (1..3) within its
        # 25-node band -> several nontrivial components
        edges = [{"u": int(i - rng.integers(1, 4)), "v": i}
                 for i in range(1, 200) if i % 25 != 0]
        ds = rd.from_items(edges, override_num_blocks=7)
        a = connected_components(ds).to_pandas() \
            .sort_values("node").reset_index(drop=True)
        # force multi-level distributed contraction
        b = connected_components(
            rd.from_items(edges, override_num_blocks=7),
            driver_edge_limit=5, max_levels=6).to_pandas() \
            .sort_values("node").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)
        # canonical rep is the min node of each component
        grp = a.groupby("component")["node"].min()
        assert (grp.index == grp.values).all()

    def test_connected_components_driver_stitch_bounded(self):
        # pathological long chain: worst case for label propagation, and
        # the shape the r3 verdict flagged — the driver union-find must
        # only ever see a contracted edge set under the limit, however
        # large the input
        import ray.data as rd

        from vyntr_ray.stages.graph import connected_components

        n = 120_000
        limit = 10_000

        def chain(t: pa.Table) -> pa.Table:
            i = t["id"].to_numpy()
            return pa.table({"u": pa.array(i, pa.int64()),
                             "v": pa.array(i + 1, pa.int64())})

        ds = (rd.range(n, override_num_blocks=16)
              .map_batches(chain, batch_format="pyarrow"))
        stats: dict = {}
        out = connected_components(ds, driver_edge_limit=limit,
                                   _stats=stats).to_pandas()
        assert stats["driver_edges"] <= limit, stats
        assert stats["levels"] >= 1
        # one chain -> one component rooted at node 0
        assert len(out) == n + 1
        assert (out["component"] == 0).all()


class TestLmDataOps:
    """Parallelism-invariance + invariants for the LM-curation ops."""

    def _docs(self, n=120, blocks=1):
        import ray.data as rd
        rng = np.random.Generator(np.random.PCG64(5))
        words = ["alpha", "beta", "gamma", "delta", "eps"]
        rows = [{"doc_id": i,
                 "text": " ".join(rng.choice(words, rng.integers(1, 40)))}
                for i in range(n)]
        return rd.from_items(rows, override_num_blocks=blocks)

    def test_pack_sequences_invariants_and_parallelism(self, ray_session):
        from vyntr_ray.stages.sampling import pack_sequences
        a = (pack_sequences(self._docs(blocks=1), seq_len=64, n_buckets=16)
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
        b = (pack_sequences(self._docs(blocks=9), seq_len=64, n_buckets=16)
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(a, b)     # block-count invariant
        # offsets are a permutation-free exclusive prefix sum: sorted by
        # offset, each row starts where the previous ended
        s = a.sort_values("offset").reset_index(drop=True)
        assert s["offset"].iloc[0] == 0
        assert (s["offset"].iloc[1:].to_numpy()
                == (s["offset"] + s["tok"]).iloc[:-1].to_numpy()).all()
        assert (s["seq_id"] == s["offset"] // 64).all()

    def test_unigram_logprob_parallelism_invariant(self, ray_session):
        from vyntr_ray.stages.text_analysis import unigram_logprob
        a = (unigram_logprob(self._docs(blocks=1), vocab_size=3)
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
        b = (unigram_logprob(self._docs(blocks=7), vocab_size=3)
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
        pd.testing.assert_frame_equal(a, b)
        # vocab_size=3 of 5 words -> OOV tokens exist and are unscored
        assert (a["n_oov"] > 0).any()
        assert (a["n_oov"] <= a["n_tok"]).all()

    def test_substring_dup_counts_planted(self, ray_session):
        import ray.data as rd

        from vyntr_ray.stages.dedup import substring_dup_counts
        base = "x" * 0  # readability
        uniq = [{"doc_id": i, "text": f"doc {i} " + f"unique{i} " * 40}
                for i in range(10)]
        shared = "the exact same long paragraph repeated verbatim " * 6
        dups = [{"doc_id": 100 + i, "text": shared} for i in range(3)]
        out = substring_dup_counts(
            rd.from_items(uniq + dups, override_num_blocks=5),
            window=64, stride=16).to_pandas()
        dup_rows = out[out["doc_id"] >= 100]
        assert len(dup_rows) == 3
        # every window of the identical docs is duplicated
        assert (dup_rows["n_dup_windows"] == dup_rows["n_windows"]).all()
        assert (out[out["doc_id"] < 10]["n_dup_windows"] == 0).all()


class TestEmbeddingDupsDistributed:
    """r3: embedding_dup_pairs is hash-partitioned + chunk-split (verdict
    weak spot #1) — a skewed block (one label = 50% of rows) must split
    into chunk-pair cells and still find EXACTLY the brute-force pairs."""

    def _brute(self, rows, threshold):
        ids = np.array([r["vec_id"] for r in rows])
        labs = np.array([r["label"] for r in rows])
        mat = np.stack([r["embedding"] for r in rows]).astype(np.float64)
        unit = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        out = []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if labs[i] == labs[j] and unit[i] @ unit[j] >= threshold:
                    a, b = sorted((int(ids[i]), int(ids[j])))
                    out.append((a, b))
        return sorted(out)

    def test_skewed_block_chunk_split(self, ray_session):
        import ray.data as rd

        from vyntr_ray.stages.dedup import embedding_dup_pairs
        rng = np.random.Generator(np.random.PCG64(11))
        rows = []
        # hot label 0: 200 rows (50%) drawn near 3 cluster centers so
        # plenty of cross-chunk pairs exist; labels 1..4: 50 rows each
        centers = rng.standard_normal((3, 8))
        for i in range(200):
            c = centers[i % 3]
            rows.append({"vec_id": i, "label": 0,
                         "embedding": (c + 0.05 * rng.standard_normal(8)
                                       ).tolist()})
        for i in range(200, 400):
            rows.append({"vec_id": i, "label": 1 + (i % 4),
                         "embedding": rng.standard_normal(8).tolist()})
        ds = rd.from_items(rows, override_num_blocks=8)
        # max_block=64 forces the hot label into ceil(200/64)=4 chunks
        out = embedding_dup_pairs(ds, threshold=0.9, block_col="label",
                                  max_block=64, n_parts=16)
        # stays a Dataset end-to-end (no driver materialization)
        import ray.data
        assert isinstance(out, ray.data.Dataset)
        got = [(r["a"], r["b"]) for r in out.take_all()]
        want = self._brute(rows, 0.9)
        assert len(want) > 50          # the skew actually produced pairs
        assert got == want

    def test_no_chunking_fast_path(self, ray_session):
        import ray.data as rd

        from vyntr_ray.stages.dedup import embedding_dup_pairs
        rng = np.random.Generator(np.random.PCG64(5))
        rows = [{"vec_id": i, "label": i % 3,
                 "embedding": rng.standard_normal(6).tolist()}
                for i in range(60)]
        out = embedding_dup_pairs(rd.from_items(rows, override_num_blocks=4),
                                  threshold=0.5)
        got = [(r["a"], r["b"]) for r in out.take_all()]
        assert got == self._brute(rows, 0.5)


class TestMeanPoolPartitioned:
    def test_matches_per_key_means_and_int_string_keys(self, ray_session):
        import ray.data as rd

        from vyntr_ray.stages.embed import mean_pool
        rng = np.random.Generator(np.random.PCG64(3))
        rows = [{"label": i % 7, "key_s": f"u{i % 7}",
                 "embedding": rng.standard_normal(4).tolist()}
                for i in range(210)]
        out = mean_pool(rd.from_items(rows, override_num_blocks=6),
                        key_col="label", round_to=6).to_pandas()
        # exact per-key means
        for lab in range(7):
            mat = np.stack([r["embedding"] for r in rows
                            if r["label"] == lab])
            want = np.round(mat.mean(axis=0), 6)
            got = (out[out["label"] == lab].sort_values("pos")
                   ["mean_val"].to_numpy())
            np.testing.assert_allclose(got, want, atol=1e-9)
        # string keys route through the md5 fallback
        out_s = mean_pool(rd.from_items(rows, override_num_blocks=6),
                          key_col="key_s", round_to=6).to_pandas()
        assert set(out_s["key_s"]) == {f"u{i}" for i in range(7)}
        assert len(out_s) == 7 * 4


class TestHFEncoderContract:
    """r2 verdict item 9: pin the HFEncoder seam's call shape
    (tokenize → forward → attention-masked mean-pool) and output schema
    against a minimal fake torch/transformers, since the sandbox has no
    real model.  If the real libraries ever change the expected surface,
    this test documents exactly what the seam assumes."""

    def _install_fakes(self, monkeypatch, record):
        import sys
        import types

        class FT:  # minimal tensor
            def __init__(self, a):
                self.a = np.asarray(a)

            def unsqueeze(self, ax):
                return FT(np.expand_dims(self.a, ax))

            def float(self):
                return FT(self.a.astype(np.float64))

            def __mul__(self, o):
                return FT(self.a * o.a)

            __rmul__ = __mul__

            def __truediv__(self, o):
                return FT(self.a / o.a)

            def sum(self, ax):
                return FT(self.a.sum(axis=ax))

            def clamp(self, min):
                return FT(np.maximum(self.a, min))

            def cpu(self):
                return self

            def numpy(self):
                return self.a

        class Enc(dict):
            def to(self, device):
                record["enc_device"] = device
                return self

        class FakeTok:
            def __call__(self, texts, **kw):
                record["tok_kwargs"] = kw
                toks = [t.split() for t in texts]
                s = max(len(t) for t in toks)
                ids = np.zeros((len(toks), s), np.int64)
                mask = np.zeros((len(toks), s), np.int64)
                for i, t in enumerate(toks):
                    for j, w in enumerate(t):
                        ids[i, j] = (hash(w) % 7) + 1
                        mask[i, j] = 1
                return Enc(input_ids=FT(ids), attention_mask=FT(mask))

        class FakeOut:
            def __init__(self, h):
                self.last_hidden_state = h

        class FakeModel:
            def to(self, device):
                record["model_device"] = device
                return self

            def eval(self):
                record["eval"] = True

            def __call__(self, input_ids=None, attention_mask=None):
                # hidden[b, s, :] = token id (deterministic, mask-checkable)
                ids = input_ids.a
                h = np.repeat(ids[:, :, None], 4, axis=2).astype(np.float64)
                return FakeOut(FT(h))

        class _NoGrad:
            def __enter__(self):
                return self

            def __exit__(self, *a):
                return False

        torch_mod = types.ModuleType("torch")
        torch_mod.cuda = types.SimpleNamespace(is_available=lambda: False)
        torch_mod.no_grad = _NoGrad
        tr_mod = types.ModuleType("transformers")
        tr_mod.AutoTokenizer = types.SimpleNamespace(
            from_pretrained=lambda name, use_fast=True: record.update(
                tok_model=name) or FakeTok())
        tr_mod.AutoModel = types.SimpleNamespace(
            from_pretrained=lambda name: record.update(
                model_name=name) or FakeModel())
        monkeypatch.setitem(sys.modules, "torch", torch_mod)
        monkeypatch.setitem(sys.modules, "transformers", tr_mod)

    def test_tokenize_forward_pool_shape(self, monkeypatch):
        from vyntr_ray.stages.embed import HFEncoder
        record = {}
        self._install_fakes(monkeypatch, record)
        enc = HFEncoder(model_name="fake/mini", text_col="chunk_text")
        assert record["model_name"] == "fake/mini"
        assert record["tok_model"] == "fake/mini"
        assert record["eval"] and record["model_device"] == "cpu"
        out = enc.encode(["aa bb cc", "dd"])
        assert record["tok_kwargs"] == {
            "padding": True, "truncation": True, "max_length": 512,
            "return_tensors": "pt"}
        assert out.dtype == np.float32 and out.shape == (2, 4)
        # masked mean-pool: padding rows excluded exactly
        ids0 = [(hash(w) % 7) + 1 for w in ["aa", "bb", "cc"]]
        ids1 = [(hash("dd") % 7) + 1]
        np.testing.assert_allclose(out[0], np.mean(ids0), rtol=1e-6)
        np.testing.assert_allclose(out[1], np.mean(ids1), rtol=1e-6)

    def test_batch_call_schema(self, monkeypatch):
        from vyntr_ray.stages.embed import HFEncoder
        record = {}
        self._install_fakes(monkeypatch, record)
        enc = HFEncoder(model_name="fake/mini")
        out = enc(pa.table({"chunk_text": ["x y", "z"],
                            "doc_id": [1, 2]}))
        assert out.column_names == ["chunk_text", "doc_id", "embedding"]
        embs = out["embedding"].to_pylist()
        assert len(embs) == 2 and all(len(e) == 4 for e in embs)
        assert out.schema.field("embedding").type == pa.list_(pa.float32())

    def test_device_and_batch_plumbing(self, monkeypatch):
        # r3 verdict item 9: the map_batches wiring — device, max_length,
        # GPU fraction, batch size, actor concurrency — end-to-end
        from vyntr_ray.stages.embed import HFEncoder, _hf_map_kwargs
        kw = _hf_map_kwargs("m/x", "chunk_text", concurrency=3,
                            batch_size=256, num_gpus=0.25,
                            device="cuda:1", max_length=128)
        assert kw["fn_constructor_kwargs"] == {
            "model_name": "m/x", "text_col": "chunk_text",
            "device": "cuda:1", "max_length": 128}
        assert kw["batch_size"] == 256 and kw["concurrency"] == 3
        assert kw["num_gpus"] == 0.25 and "num_cpus" not in kw
        # CPU path reserves a CPU fraction instead of a GPU
        kw = _hf_map_kwargs("m/x", "t", 2, 1000, 0, None, 512)
        assert kw["num_cpus"] == 0.5 and "num_gpus" not in kw
        # the constructor honors an explicit device + max_length
        record = {}
        self._install_fakes(monkeypatch, record)
        enc = HFEncoder(model_name="fake/mini", device="cuda:1",
                        max_length=64)
        assert record["model_device"] == "cuda:1"
        enc.encode(["a b"])
        assert record["tok_kwargs"]["max_length"] == 64
        assert record["enc_device"] == "cuda:1"
