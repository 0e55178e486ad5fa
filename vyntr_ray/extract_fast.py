"""Fast tokenizer for the byte-identical extractor (round-2 candidate).

``html.parser`` spends ~90% of parse time in its Python
tokenization loop (PERF.md).  This module replaces ONLY the tokenizer
with one compiled-regex scan and drives the exact same
:class:`vyntr_ray.extract._Extractor` handler methods — the semantic
logic is shared, not duplicated.

Byte parity is guaranteed by construction plus a STRICT recognizer: the
fast scan accepts a document only when every construct provably
tokenizes identically to ``HTMLParser``:

- every ``<`` begins a comment, declaration, PI, end tag, or a start tag
  whose attribute string fully matches the strict attribute grammar;
- every ``&`` in character data is a complete, semicolon-terminated
  entity/char reference (HTMLParser *normalizes* unterminated ones —
  e.g. ``&amp`` → ``&amp;`` — which raw passthrough can't reproduce);
- no ``<script``/``<style`` (HTMLParser switches to CDATA content mode).

Anything outside that subset returns ``None`` and the caller falls back
to the HTMLParser path for the whole document.  Machine-generated pages
(and the synthetic corpora) take the fast path ~100% of the time; web
junk silently falls back.  Equality of the two paths over fixtures,
corpora and an adversarial battery is pinned in tests/test_extract.py.
"""

from __future__ import annotations

import re
from html import unescape as _unescape

__all__ = ["tokenize_fast"]

# master token: <!--comment--> | <!decl> | <?pi> | </end> | <start attrs/?>
_TAG_RE = re.compile(r"""
    <(?:
        (?P<comment>!--.*?--\s*)
      | (?P<decl>![^>\[]*)   # '[' excluded: HTMLParser consumes internal
                             # DTD subsets past the first '>' — fall back
      | (?P<pi>\?[^>]*)
      | /(?P<end>[a-zA-Z][a-zA-Z0-9]*)\s*
      | (?P<start>[a-zA-Z][a-zA-Z0-9]*)
        (?P<attrs>(?:\s+[a-zA-Z_:][-a-zA-Z0-9_:.]*
                      (?:\s*=\s*(?:"[^"<]*"|'[^'<]*'|[^\s>'"`=]+))?)*)
        \s*(?P<selfclose>/?)
    )>""", re.DOTALL | re.VERBOSE)

_ATTR_RE = re.compile(r"""
    \s+(?P<name>[a-zA-Z_:][-a-zA-Z0-9_:.]*)
    (?:\s*=\s*(?P<value>"[^"<]*"|'[^'<]*'|[^\s>'"`=]+))?""", re.VERBOSE)

# character data is passthrough-safe only when every '&' is a complete,
# ';'-terminated reference (HTMLParser normalizes the unterminated ones)
_AMP_OK_RE = re.compile(
    r"&(?:[a-zA-Z][-.a-zA-Z0-9]*|#[0-9]+|#[xX][0-9a-fA-F]+);")

_SCRIPT_STYLE = ("script", "style")


def _attrs_of(raw: str) -> list[tuple[str, str | None]] | None:
    """Strict attribute parse; None when the string isn't fully consumed."""
    out: list[tuple[str, str | None]] = []
    pos = 0
    for m in _ATTR_RE.finditer(raw):
        if m.start() != pos:
            return None
        pos = m.end()
        v = m.group("value")
        if v is not None:
            if v[:1] in "\"'":
                v = v[1:-1]
            if "&" in v:
                v = _unescape(v)
        out.append((m.group("name").lower(), v))
    if raw[pos:].strip():
        return None
    return out


def _text_ok(text: str) -> bool:
    """True when raw passthrough equals HTMLParser's event reconstruction."""
    if "&" not in text:
        return True
    pos = 0
    while (i := text.find("&", pos)) != -1:
        m = _AMP_OK_RE.match(text, i)
        if m is None:
            return False
        pos = m.end()
    return True


def tokenize_fast(html: str, extractor) -> bool:
    """Drive ``extractor`` (an ``_Extractor``) over ``html`` with one regex
    scan.  Returns False (extractor state half-built — caller must discard
    and re-parse) when the document leaves the provably-identical subset.

    Chunk semantics are applied directly (in the fast subset a text chunk
    is exactly the run between two tokens), and attributes are parsed only
    for the four semantically interesting tags — the handler-method
    dispatch of the HTMLParser path is bypassed entirely.  Equality of the
    two paths is pinned by tests/test_extract.py.
    """
    from .extract import CONTENT_TAGS

    pos = 0
    n = len(html)
    find = _TAG_RE.search
    content_depth = 0
    title_depth = 0
    title_parts = extractor._title_parts
    content_parts = extractor._content_parts
    result = extractor.result
    add_link = extractor._add_link

    while pos < n:
        m = find(html, pos)
        text = html[pos:m.start()] if m else html[pos:]
        if text:
            if "<" in text or not _text_ok(text):
                return False
            if title_depth > 0:
                title_parts.append(text)
            if content_depth > 0:
                if content_parts:
                    content_parts.append(" ")
                content_parts.append(text.strip())
        if m is None:
            break
        pos = m.end()
        start = m.group("start")
        if start is not None:
            tag = start.lower()
            if tag in CONTENT_TAGS:
                if not m.group("selfclose"):   # <p/> never pushes depth
                    content_depth += 1
                continue
            if tag == "title":
                if not m.group("selfclose"):
                    title_depth += 1
                continue
            if tag == "a":
                attrs = _attrs_of(m.group("attrs"))
                if attrs is None:
                    return False
                for k, v in attrs:
                    if k == "href":   # valueless href == "" (HTMLParser)
                        add_link(v if v is not None else "")
                        break
            elif tag == "html":
                attrs = _attrs_of(m.group("attrs"))
                if attrs is None:
                    return False
                for k, v in attrs:
                    if k == "lang":
                        result.language = v if v is not None else ""
                        break
            elif tag == "meta":
                attrs = _attrs_of(m.group("attrs"))
                if attrs is None:
                    return False
                name = content = None
                for k, v in attrs:
                    if k == "name" and name is None:
                        name = v if v is not None else ""
                    elif k == "content" and content is None:
                        content = v if v is not None else ""
                if name is None:
                    for k, v in attrs:
                        if k == "property":
                            name = v if v is not None else ""
                            break
                if name is not None and content is not None:
                    result.meta_tags.append(
                        {"name": name, "content": content})
            elif tag == "link":
                attrs = _attrs_of(m.group("attrs"))
                if attrs is None:
                    return False
                rel = href = None
                for k, v in attrs:
                    if k == "rel" and rel is None:
                        rel = v if v is not None else ""
                    elif k == "href" and href is None:
                        href = v if v is not None else ""
                if rel == "canonical" and href is not None:
                    result.canonical_url = href
            elif tag in _SCRIPT_STYLE:
                return False   # HTMLParser enters CDATA content mode
            # all other tags: chunk boundary only (handled implicitly)
        elif (end := m.group("end")) is not None:
            tag = end.lower()
            if tag in CONTENT_TAGS:
                if content_depth > 0:
                    content_depth -= 1
            elif tag == "title":
                if title_depth > 0:
                    title_depth -= 1
        # comment / decl / pi: chunk boundary only
    return True
