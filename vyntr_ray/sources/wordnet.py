"""WordNet LMF XML → dictionary rows ETL (S12).

Rebuild of the lexicon loader shape
(`lexicon/tools/src/convert_wn_xml_to_json.py:57-279`,
`lexicon/tools/src/load_wordnet_into_db.py:33-45`): parse an LMF
(Lexical Markup Framework, the public WordNet XML schema) document into
one row per lemma with nested array columns —
``word, part_of_speech, pronunciations[], definitions[], examples[],
synonyms[], antonyms[]`` — the `wordnet` table schema of the reference.

Pure ``xml.etree`` parsing (stdlib); rows load into Ray via
``from_items`` (the table is small — dictionary scale, not corpus scale).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

__all__ = ["parse_lmf", "wordnet_dataset", "WORDNET_COLUMNS"]

WORDNET_COLUMNS = ["word", "part_of_speech", "pronunciations",
                   "definitions", "examples", "synonyms", "antonyms"]


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def parse_lmf(xml_text: str) -> list[dict]:
    """LMF document → dictionary rows (one per lexical entry)."""
    root = ET.fromstring(xml_text)

    # --- synsets: id → {definitions, examples, antonym-target synsets}
    synsets: dict[str, dict] = {}
    for syn in root.iter():
        if _local(syn.tag) != "Synset":
            continue
        sid = syn.get("id", "")
        info = {"definitions": [], "examples": [], "antonym_synsets": []}
        for child in syn:
            name = _local(child.tag)
            text = (child.text or "").strip()
            if name == "Definition" and text:
                info["definitions"].append(text)
            elif name == "Example" and text:
                info["examples"].append(text)
            elif name == "SynsetRelation" and \
                    child.get("relType") == "antonym":
                info["antonym_synsets"].append(child.get("target", ""))
        synsets[sid] = info

    # --- entries + synset membership
    entries: list[dict] = []
    members: dict[str, list[str]] = {}   # synset id → lemma words
    for entry in root.iter():
        if _local(entry.tag) != "LexicalEntry":
            continue
        word, pos = "", ""
        prons: list[str] = []
        sense_synsets: list[str] = []
        for child in entry:
            name = _local(child.tag)
            if name == "Lemma":
                word = child.get("writtenForm", "")
                pos = child.get("partOfSpeech", "")
            elif name == "Pronunciation":
                t = (child.text or "").strip()
                if t:
                    prons.append(t)
            elif name == "Sense":
                sense_synsets.append(child.get("synset", ""))
        if not word:
            continue
        entries.append({"word": word, "part_of_speech": pos,
                        "pronunciations": prons,
                        "synset_ids": sense_synsets})
        for sid in sense_synsets:
            members.setdefault(sid, []).append(word)

    # --- resolve definitions / examples / synonyms / antonyms per entry
    rows: list[dict] = []
    for e in entries:
        defs: list[str] = []
        exs: list[str] = []
        syns: list[str] = []
        ants: list[str] = []
        for sid in e["synset_ids"]:
            info = synsets.get(sid)
            if info is None:
                continue
            defs.extend(info["definitions"])
            exs.extend(info["examples"])
            syns.extend(w for w in members.get(sid, []) if w != e["word"])
            for anti in info["antonym_synsets"]:
                ants.extend(members.get(anti, []))
        rows.append({
            "word": e["word"],
            "part_of_speech": e["part_of_speech"],
            "pronunciations": e["pronunciations"],
            "definitions": sorted(set(defs), key=defs.index),
            "examples": sorted(set(exs), key=exs.index),
            "synonyms": sorted(set(syns)),
            "antonyms": sorted(set(ants)),
        })
    return rows


def wordnet_dataset(xml_text: str):
    """Rows as a Ray Dataset with nested list columns."""
    import ray.data as rd
    return rd.from_items(parse_lmf(xml_text))
