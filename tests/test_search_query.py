"""Parser + phrase + boolean search semantics (Tantivy QueryParser analog)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from vyntr_ray.stages.search_query import parse_query


class TestParseQuery:
    def test_plain_terms_one_group(self):
        assert parse_query("alpha beta") == [
            {"must": [("term", "alpha"), ("term", "beta")], "must_not": []}]

    def test_and_is_implicit_conjunction(self):
        assert parse_query("alpha AND beta") == parse_query("alpha beta")

    def test_or_splits_groups(self):
        g = parse_query("alpha OR beta gamma")
        assert g == [
            {"must": [("term", "alpha")], "must_not": []},
            {"must": [("term", "beta"), ("term", "gamma")], "must_not": []}]

    def test_not_and_minus(self):
        g1 = parse_query("alpha NOT beta")
        g2 = parse_query("alpha -beta")
        assert g1 == g2 == [{"must": [("term", "alpha")],
                             "must_not": [("term", "beta")]}]

    def test_phrase_node(self):
        g = parse_query('"alpha beta" gamma')
        assert g == [{"must": [("phrase", ("alpha", "beta")),
                               ("term", "gamma")], "must_not": []}]

    def test_one_word_phrase_degrades_to_term(self):
        assert parse_query('"alpha"') == [
            {"must": [("term", "alpha")], "must_not": []}]

    def test_case_and_plus(self):
        assert parse_query("+Alpha BETA") == [
            {"must": [("term", "alpha"), ("term", "beta")], "must_not": []}]


@pytest.mark.usefixtures("ray_session")
class TestPhraseBoolean:
    DOCS = [
        (0, "red fox jumps red fox"),       # "red fox" x2
        (1, "fox red fox"),                 # "red fox" x1 (pos 1-2)
        (2, "red and fox apart"),           # terms present, not adjacent
        (3, "nothing here"),
        (4, "red red red"),                 # "red red" x2 (overlapping)
        (5, "blue fox"),
    ]

    def _index(self, tmp_path):
        import ray.data as rd

        from vyntr_ray.stages.search_query import build_positional_index
        ds = rd.from_items([{"doc_id": i, "text": t} for i, t in self.DOCS])
        return build_positional_index(ds, cache_key="t",
                                      cache_root=str(tmp_path),
                                      n_shards=4)

    def test_phrase_match_adjacency(self, tmp_path):
        from vyntr_ray.stages.search_query import phrase_match
        idx = self._index(tmp_path)
        out = (phrase_match(idx, ["red", "fox"]).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        assert out["doc_id"].tolist() == [0, 1]
        assert out["phrase_tf"].tolist() == [2, 1]

    def test_phrase_repeated_term(self, tmp_path):
        from vyntr_ray.stages.search_query import phrase_match
        idx = self._index(tmp_path)
        out = (phrase_match(idx, ["red", "red"]).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        assert out["doc_id"].tolist() == [4]
        assert out["phrase_tf"].tolist() == [2]

    def test_boolean_groups_and_not(self, tmp_path):
        from vyntr_ray.stages.search_query import boolean_search
        idx = self._index(tmp_path)
        # (red AND fox AND NOT blue) OR "red red"
        out = (boolean_search(idx, 'red fox -blue OR "red red"', k=10)
               .to_pandas())
        assert sorted(out["doc_id"].tolist()) == [0, 1, 2, 4]
        # doc 5 has fox but excluded: no red; doc 3 matches nothing
        # scores are positive ints, sorted desc then id asc
        assert (out["score_micro"] > 0).all()
        s = out[["score_micro", "doc_id"]].to_numpy()
        assert all((s[i][0], -s[i][1]) >= (s[i + 1][0], -s[i + 1][1])
                   for i in range(len(s) - 1))

    def test_boolean_not_excludes(self, tmp_path):
        from vyntr_ray.stages.search_query import boolean_search
        idx = self._index(tmp_path)
        out = boolean_search(idx, "fox -red", k=10).to_pandas()
        assert out["doc_id"].tolist() == [5]
