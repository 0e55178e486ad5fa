"""WordNet LMF ETL (S12): synthetic LMF doc → dictionary rows."""

import pytest

from vyntr_ray.sources.wordnet import parse_lmf

LMF = """<?xml version="1.0" encoding="UTF-8"?>
<LexicalResource>
  <Lexicon id="test-en" language="en">
    <LexicalEntry id="w_hot">
      <Lemma writtenForm="hot" partOfSpeech="a"/>
      <Pronunciation>hɒt</Pronunciation>
      <Sense id="s1" synset="syn-hot"/>
    </LexicalEntry>
    <LexicalEntry id="w_warm">
      <Lemma writtenForm="warm" partOfSpeech="a"/>
      <Sense id="s2" synset="syn-hot"/>
    </LexicalEntry>
    <LexicalEntry id="w_cold">
      <Lemma writtenForm="cold" partOfSpeech="a"/>
      <Pronunciation>kəʊld</Pronunciation>
      <Sense id="s3" synset="syn-cold"/>
    </LexicalEntry>
    <LexicalEntry id="w_run">
      <Lemma writtenForm="run" partOfSpeech="v"/>
      <Sense id="s4" synset="syn-run"/>
      <Sense id="s5" synset="syn-operate"/>
    </LexicalEntry>
    <Synset id="syn-hot">
      <Definition>having a high temperature</Definition>
      <Example>a hot stove</Example>
      <SynsetRelation relType="antonym" target="syn-cold"/>
    </Synset>
    <Synset id="syn-cold">
      <Definition>having a low temperature</Definition>
      <SynsetRelation relType="antonym" target="syn-hot"/>
    </Synset>
    <Synset id="syn-run">
      <Definition>move fast on foot</Definition>
      <Example>she runs every morning</Example>
    </Synset>
    <Synset id="syn-operate">
      <Definition>operate or manage</Definition>
    </Synset>
  </Lexicon>
</LexicalResource>
"""


def test_parse_lmf_rows():
    rows = {r["word"]: r for r in parse_lmf(LMF)}
    assert set(rows) == {"hot", "warm", "cold", "run"}
    hot = rows["hot"]
    assert hot["part_of_speech"] == "a"
    assert hot["pronunciations"] == ["hɒt"]
    assert hot["definitions"] == ["having a high temperature"]
    assert hot["examples"] == ["a hot stove"]
    assert hot["synonyms"] == ["warm"]          # same synset, self excluded
    assert hot["antonyms"] == ["cold"]          # via antonym synset relation
    assert rows["cold"]["antonyms"] == ["hot", "warm"]
    # multi-sense entry merges definitions across synsets, in sense order
    assert rows["run"]["definitions"] == ["move fast on foot",
                                          "operate or manage"]
    assert rows["warm"]["pronunciations"] == []


@pytest.mark.usefixtures("ray_session")
def test_wordnet_dataset_nested_columns():
    from vyntr_ray.sources.wordnet import wordnet_dataset
    ds = wordnet_dataset(LMF)
    df = ds.to_pandas()
    assert len(df) == 4
    assert set(df.columns) >= {"word", "part_of_speech", "definitions",
                               "synonyms", "antonyms"}
    # nested arrays survive the Arrow round-trip
    got = df.set_index("word").loc["hot", "synonyms"]
    assert list(got) == ["warm"]
