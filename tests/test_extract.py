"""Golden HTML fixtures pinning the extractor semantics (FIXTURES.md §4).

These cases define the byte-identical-invariant contract of the rebuild's
extractor against the observable behavior of the reference pipeline
(`genesis/src/html_parser.rs:17-162`, `genesis/src/db.rs:63-88`).
"""

from vyntr_ray.extract import parse_html, sanitize_text

BASE = "https://host.example/"


def test_plain_page_chunks_joined():
    # FIXTURES §4.1: one h1 + two p → chunks trimmed, joined by single space
    html = "<html><body><h1> Hello </h1><p>world</p><p>again</p></body></html>"
    r = parse_html(html, BASE)
    assert r.content_text == "Hello world again"


def test_whitespace_only_chunk_consumes_separator():
    # FIXTURES §4.2: reference appends ' ' then '' (html_parser.rs:81-86)
    html = "<p>a</p><p>   </p><p>b</p>"
    r = parse_html(html, BASE)
    assert r.content_text == "a  b"  # double space pinned


def test_nested_li_p_fires_once_per_chunk():
    # FIXTURES §4.3: compound selector fires once per chunk even when nested
    html = "<ul><li><p>inner</p></li></ul>"
    r = parse_html(html, BASE)
    assert r.content_text == "inner"


def test_text_outside_selectors_excluded():
    # FIXTURES §4.4
    html = "<div>nope</div><span>no</span><script>var x;</script><p>yes</p>"
    r = parse_html(html, BASE)
    assert r.content_text == "yes"


def test_tag_inside_p_splits_chunks():
    # <b> interrupts the text run → two chunks → two joins
    html = "<p>one <b>two</b> three</p>"
    r = parse_html(html, BASE)
    assert r.content_text == "one two three"


def test_title_concatenates_all_chunks():
    # FIXTURES §4.5: <title>a<b>b</b>c</title> → all title text chunks concat
    html = "<title>a<b>b</b>c</title>"
    r = parse_html(html, BASE)
    assert r.title == "abc"


def test_title_untrimmed():
    html = "<title> spaced </title>"
    assert parse_html(html, BASE).title == " spaced "


def test_language_attribute():
    # FIXTURES §4.6
    assert parse_html('<html lang="en-US"><p>x</p></html>', BASE).language == "en-US"
    assert parse_html("<html><p>x</p></html>", BASE).language == ""


def test_meta_tags_name_property_fallback():
    # FIXTURES §4.7 (html_parser.rs:63-72)
    html = (
        '<meta name="description" content="d1">'
        '<meta property="og:title" content="d2">'
        '<meta name="keywords">'             # no content → skipped
        '<meta content="orphan">'            # no name/property → not selected
        '<meta name="empty" content="">'     # empty content kept
    )
    r = parse_html(html, BASE)
    assert r.meta_tags == [
        {"name": "description", "content": "d1"},
        {"name": "og:title", "content": "d2"},
        {"name": "empty", "content": ""},
    ]


def test_canonical_as_written_last_wins():
    # FIXTURES §4.8
    html = (
        '<link rel="canonical" href="/rel/path">'
        '<link rel="stylesheet" href="/x.css">'
        '<link rel="canonical" href="HTTPS://Canon.example/Final">'
    )
    r = parse_html(html, BASE)
    assert r.canonical_url == "HTTPS://Canon.example/Final"  # NOT normalized


def test_links_joined_filtered_deduped_sorted():
    # FIXTURES §4.9/§4.10
    html = (
        '<a href="b.html">1</a>'
        '<a href="/abs">2</a>'
        '<a href="b.html#frag">dup after fragment strip</a>'
        '<a href="mailto:x@y.z">no</a>'
        '<a href="javascript:void(0)">no</a>'
        '<a href="pic.jpg">no</a>'
        '<a href="/download/file">no</a>'
        '<a href="https://other.example/page?q=1#f">3</a>'
        '<a href="/article/pdf-guide">kept</a>'
    )
    r = parse_html(html, BASE)
    assert r.links == sorted([
        "https://host.example/b.html",
        "https://host.example/abs",
        "https://other.example/page?q=1",
        "https://host.example/article/pdf-guide",
    ])


def test_entities_not_decoded_in_text():
    # FIXTURES §4.12 pin: lol_html text chunks carry raw source; entities stay
    html = "<p>a &amp; b &#169; c</p>"
    r = parse_html(html, BASE)
    assert r.content_text == "a &amp; b &#169; c"


def test_entities_decoded_in_attributes():
    html = '<a href="/x?a=1&amp;b=2">l</a>'
    r = parse_html(html, BASE)
    assert r.links == ["https://host.example/x?a=1&b=2"]


def test_comment_interrupts_chunk():
    html = "<p>one<!-- c -->two</p>"
    assert parse_html(html, BASE).content_text == "one two"


def test_script_inside_p_is_subtree_text():
    # subtree semantics: text! fires for all text in matched subtree
    html = "<p>a<script>var y=1;</script>b</p>"
    assert parse_html(html, BASE).content_text == "a var y=1; b"


def test_bytes_input_utf8():
    html = "<p>héllo</p>".encode("utf-8")
    assert parse_html(html, BASE).content_text == "héllo"


def test_sanitize_text():
    # FIXTURES §4.11 (genesis/src/db.rs:63-67): Cc chars removed incl. \n \t
    assert sanitize_text("a\x00b\nc\td\x7fe") == "abcde"
    assert sanitize_text("clean") == "clean"
    assert sanitize_text("kpq") == "kpq"  # C1 controls


# --------------------------------------------------------------------------
# fast-tokenizer parity: the regex scan must be byte-identical to the
# HTMLParser path (or fall back) on every input we can throw at it
# --------------------------------------------------------------------------

def _both(html, base="https://base.example/dir/"):
    from vyntr_ray.extract import parse_html
    fast = parse_html(html, base, fast=True)
    slow = parse_html(html, base, fast=False)
    assert fast == slow, f"fast/slow divergence for {html!r}"
    return fast


ADVERSARIAL = [
    "<p>plain text</p>",
    "<p>a &amp; b &#65; &#x41; c</p>",
    "<p>unterminated &amp entity</p>",          # must fall back
    "<p>bare & ampersand</p>",                  # must fall back
    "<P>UPPER <B>case</B> tags</P>",
    "<p>self-closing <br/> inside</p>",
    "<p/>empty para<p>next</p>",
    '<a href="/x.html">l</a><a href=nofollow.html>m</a>',
    "<a href='/q.html?a=1&amp;b=2'>entity in attr</a>",
    "<!-- comment --><p>after <!-- inner --> comment</p>",
    "<!DOCTYPE html><p>doc</p>",
    "<!DOCTYPE x [ <!ENTITY y 'z'> ]><p>dtd subset</p>",   # fallback
    "<?pi data?><p>pi</p>",
    "<script>var x = '<p>not content</p>';</script><p>real</p>",  # fallback
    "<style>p:before{content:'<'}</style><p>styled</p>",          # fallback
    "<p>weird <notatag< thing</p>",             # fallback
    "<p>attr soup</p><a href=\"x\" <b>broken</a>",  # fallback
    "<my-tag>custom element</my-tag><p>t</p>",  # fallback (name charset)
    "<p title='it&#39;s'>quoted entity attr</p>",
    "<ul><li>one<li>two</ul>",                  # unclosed li
    "<p>trailing open",
    "</p>stray end tag<p>x</p>",
    "<p>spaces  \t\n in   text</p>",
    "<title>t1<b>t2</b>t3</title>",
    "<html lang='en'><head><meta name='a' content='b'>"
    "<meta property='c' content='d'><link rel='canonical' href='C'>"
    "</head><body><h1>H</h1></body></html>",
    "<![CDATA[ raw ]]><p>after cdata</p>",      # fallback
    "<p>empty attrs <a href=''>e</a></p>",
    "<p>numeric ref no semi &#65 x</p>",        # fallback
    "text before any tag<p>x</p>",
    "<a href='http://other.example/a/b/../c?q#frag'>dotseg</a>",
    "<a href='ftp://x/y'>ftp</a><a href='/keep.html'>k</a>",
    "<a href='/skip.pdf'>pdf</a><a href='/ok.html'>ok</a>",
    "<html lang><p>valueless lang</p></html>",
    "<a href>valueless href</a><p>x</p>",
    "<meta name content='c'><meta property='p' content='d'><p>m</p>",
    "<link rel=canonical href><link rel='canonical' href='/c'><p>l</p>",
    "<meta name='n1' name='n2' content='c'><p>dup attrs</p>",
    "<p><p><p>triple nest</p></p></p>",
    "<p>a<br>b<img src=x>c</p>",
]


def test_fast_tokenizer_parity_adversarial():
    for doc in ADVERSARIAL:
        _both(doc)


def test_fast_tokenizer_parity_generated_corpus():
    # every page of the deterministic 600-page table parses identically
    from vyntr_ray.extract import parse_html
    from vyntr_ray.sources.pages import gen_pages_table
    tab = gen_pages_table(range(300), 300, seed=42)
    for url, html in zip(tab["url"].to_pylist(), tab["html"].to_pylist()):
        assert parse_html(html, url, fast=True) == \
            parse_html(html, url, fast=False)


def test_fast_tokenizer_takes_fast_path_on_corpus():
    # the speedup is real only if generated pages avoid the fallback
    from vyntr_ray.extract import _Extractor
    from vyntr_ray.extract_fast import tokenize_fast
    from vyntr_ray.sources.pages import gen_pages_table
    tab = gen_pages_table(range(50), 50, seed=42)
    for url, html in zip(tab["url"].to_pylist(), tab["html"].to_pylist()):
        assert tokenize_fast(bytes(html).decode("utf-8"), _Extractor(url))
