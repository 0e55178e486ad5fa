"""Pure-Python HTML page extractor — the byte-identical-invariant stage.

Re-implements the observable semantics of the reference's streaming extractor
(`genesis/src/html_parser.rs:17-102`, lol_html rewriter) on top of the
standard-library ``html.parser.HTMLParser``:

- ``links``        — every ``a[href]`` joined against the base URL, fragment
  stripped, scheme ∈ {http, https}, path not an ignored file type
  (`html_parser.rs:39-51`), deduplicated.  The reference emits HashSet
  iteration order (nondeterministic, `html_parser.rs:97`); this rebuild emits
  **sorted** links — the determinism contract of SURVEY.md §7.4.
- ``language``     — ``html[lang]`` attribute, last occurrence wins
  (`html_parser.rs:52-57`); "" when absent.
- ``title``        — concatenation of every text chunk inside ``<title>``
  (`html_parser.rs:58-62`), untrimmed.
- ``meta_tags``    — ``meta[name]`` / ``meta[property]`` elements carrying a
  ``content`` attribute; name falls back name → property → ""
  (`html_parser.rs:63-72`).
- ``canonical_url``— ``link[rel='canonical']`` href **as written** (not
  resolved), last wins (`html_parser.rs:73-78`).
- ``content_text`` — text chunks within ``h1..h6, p, li`` subtrees; per chunk:
  if the accumulator is non-empty append one space, then append the chunk
  trimmed (`html_parser.rs:79-87`).  An all-whitespace chunk therefore still
  consumes a separator (trailing space + next chunk's separator = the
  double-space behavior pinned by the golden fixtures).

Pinned chunking contract (this engine's deterministic restatement of
lol_html's TextChunk stream): one *contiguous run of character data* —
including raw character/entity references, which are NOT decoded in text —
forms one chunk; any tag, comment, processing instruction or declaration ends
the current chunk.  Attribute values ARE entity-decoded (HTMLParser
behavior).  Elements are tracked by a depth counter per selector; no implied
end tags are synthesized (input pages are well-formed; fixtures pin the
unclosed-tag behavior).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from html.parser import HTMLParser

from .urls import UrlParseError, is_ignored_file_type, join_url

__all__ = ["ParsedHtml", "parse_html", "sanitize_text", "CONTENT_TAGS"]

CONTENT_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6", "p", "li"})
# Void elements never push onto the open-element stack (HTML spec).
_VOID = frozenset({
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr",
})


@dataclass
class ParsedHtml:
    links: list[str] = field(default_factory=list)
    language: str = ""
    title: str = ""
    meta_tags: list[dict[str, str]] = field(default_factory=list)
    canonical_url: str | None = None
    content_text: str = ""


class _Extractor(HTMLParser):
    def __init__(self, base_url: str):
        # convert_charrefs=False: character references in text are delivered
        # separately and re-emitted RAW (lol_html does not decode text).
        super().__init__(convert_charrefs=False)
        self.base_url = base_url
        self.result = ParsedHtml()
        self._links: set[str] = set()
        self._content_depth = 0
        self._title_depth = 0
        self._content_parts: list[str] = []
        self._title_parts: list[str] = []
        self._pending: list[str] = []  # current contiguous text chunk

    # -- chunk machinery ---------------------------------------------------
    def _flush_chunk(self) -> None:
        if not self._pending:
            return
        chunk = "".join(self._pending)
        self._pending.clear()
        if self._title_depth > 0:
            self._title_parts.append(chunk)
        if self._content_depth > 0:
            parts = self._content_parts
            if parts:
                parts.append(" ")
            parts.append(chunk.strip())

    def handle_data(self, data: str) -> None:
        self._pending.append(data)

    def handle_entityref(self, name: str) -> None:
        self._pending.append(f"&{name};")

    def handle_charref(self, name: str) -> None:
        self._pending.append(f"&#{name};")

    def handle_comment(self, data: str) -> None:
        self._flush_chunk()

    def handle_decl(self, decl: str) -> None:
        self._flush_chunk()

    def handle_pi(self, data: str) -> None:
        self._flush_chunk()

    # -- elements ----------------------------------------------------------
    @staticmethod
    def _first_attr(attrs: list[tuple[str, str | None]], name: str) -> str | None:
        for k, v in attrs:
            if k == name:
                return v if v is not None else ""
        return None

    def handle_starttag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        self._flush_chunk()
        if tag == "a":
            href = self._first_attr(attrs, "href")
            if href is not None:
                self._add_link(href)
        elif tag == "html":
            lang = self._first_attr(attrs, "lang")
            if lang is not None:
                self.result.language = lang
        elif tag == "meta":
            name = self._first_attr(attrs, "name")
            if name is None:
                name = self._first_attr(attrs, "property")
            if name is not None:  # selector: meta[name], meta[property]
                content = self._first_attr(attrs, "content")
                if content is not None:
                    self.result.meta_tags.append(
                        {"name": name, "content": content})
        elif tag == "link":
            if self._first_attr(attrs, "rel") == "canonical":
                href = self._first_attr(attrs, "href")
                if href is not None:
                    self.result.canonical_url = href
        if tag in _VOID:
            return
        if tag in CONTENT_TAGS:
            self._content_depth += 1
        elif tag == "title":
            self._title_depth += 1

    def handle_startendtag(self, tag: str, attrs: list[tuple[str, str | None]]) -> None:
        # <tag/> — process attributes but never push depth.
        self._flush_chunk()
        saved_content, saved_title = self._content_depth, self._title_depth
        self.handle_starttag(tag, attrs)
        self._content_depth, self._title_depth = saved_content, saved_title

    def handle_endtag(self, tag: str) -> None:
        self._flush_chunk()
        if tag in CONTENT_TAGS:
            if self._content_depth > 0:
                self._content_depth -= 1
        elif tag == "title":
            if self._title_depth > 0:
                self._title_depth -= 1

    def _add_link(self, href: str) -> None:
        try:
            url = join_url(self.base_url, href)  # fragment already stripped
        except (UrlParseError, ValueError):
            return
        scheme = url.split(":", 1)[0]
        if scheme not in ("http", "https"):
            return
        # path component of the joined http(s) URL
        after = url.split("://", 1)[1]
        path = "/" + after.split("/", 1)[1] if "/" in after else "/"
        path = path.split("?", 1)[0]
        if is_ignored_file_type(path):
            return
        self._links.add(url)

    def finish(self) -> ParsedHtml:
        self._flush_chunk()
        self.result.links = sorted(self._links)
        self.result.title = "".join(self._title_parts)
        self.result.content_text = "".join(self._content_parts)
        return self.result


def parse_html(html: bytes | str, base_url: str,
               fast: bool = True) -> ParsedHtml:
    """Extract links/language/title/meta/canonical/content from one page.

    A single-regex tokenizer (``extract_fast``) drives the same handler
    methods when the document stays inside its provably-HTMLParser-
    identical subset; anything else re-parses with ``HTMLParser``
    (``fast=False`` forces that path — the parity tests diff the two).
    """
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    if fast:
        from .extract_fast import tokenize_fast
        p = _Extractor(base_url)
        if tokenize_fast(html, p):
            return p.finish()
    p = _Extractor(base_url)
    p.feed(html)
    p.close()
    return p.finish()


def sanitize_text(text: str) -> str:
    """Drop Unicode control characters (category Cc, incl. NUL/\\n/\\t).

    Mirrors `genesis/src/db.rs:63-67`; Rust ``char::is_control`` is exactly
    Unicode Cc = U+0000–U+001F and U+007F–U+009F.
    """
    if not any(ord(c) < 0x20 or 0x7F <= ord(c) <= 0x9F for c in text):
        return text
    return "".join(
        c for c in text if not (ord(c) < 0x20 or 0x7F <= ord(c) <= 0x9F))
