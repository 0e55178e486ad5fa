"""Golden fixtures for URL algebra (SURVEY.md §2.2 M1/M2/M4/M12, FIXTURES.md §4)."""

import pytest

from vyntr_ray.urls import (
    UrlParseError,
    extract_domain,
    extract_domain_simple,
    is_ignored_file_type,
    join_url,
    md5_partition,
    normalize_url,
)


class TestNormalizeUrl:
    # WHATWG serialization pinned cases (genesis/src/utils.rs:5-8 semantics)
    @pytest.mark.parametrize("raw,expected", [
        ("https://example.com", "https://example.com/"),          # root path added
        ("HTTPS://EXAMPLE.COM/Path", "https://example.com/Path"), # scheme+host lower, path kept
        ("http://example.com:80/a", "http://example.com/a"),      # default port stripped
        ("https://example.com:443/", "https://example.com/"),
        ("https://example.com:8443/", "https://example.com:8443/"),
        ("example.com/x", "http://example.com/x"),                # scheme-less fallback
        ("host0.example", "http://host0.example/"),
        ("https://a.example/b/../c", "https://a.example/c"),      # dot segments
        ("https://a.example/b/./c/", "https://a.example/b/c/"),
        ("https://a.example/a?q=1#frag", "https://a.example/a?q=1#frag"),  # fragment KEPT
        ("https://a.example/a?", "https://a.example/a?"),         # empty query kept
        ("https://user:pw@a.example/x", "https://user:pw@a.example/x"),
        ("https://a.example\\x\\y", "https://a.example/x/y"),     # backslash = slash
        ("  https://a.example/x  ", "https://a.example/x"),       # strip edges
        ("https://a.example:0443/", "https://a.example/"),        # leading-zero port
    ])
    def test_golden(self, raw, expected):
        assert normalize_url(raw) == expected

    def test_idempotent(self):
        for raw in ["https://A.EX/p?q#f", "ex.com", "http://a.b:8080/x/../y"]:
            once = normalize_url(raw)
            assert normalize_url(once) == once

    def test_unparseable(self):
        with pytest.raises(UrlParseError):
            normalize_url("")  # empty host even after http:// fallback

    @pytest.mark.parametrize("bad", [
        "not a url at all",       # spaces in host (forbidden code point)
        ":::",
    ])
    def test_forbidden_host_rejected(self, bad):
        with pytest.raises(UrlParseError):
            normalize_url(bad)

    def test_fallback_quirk_percent_encodes(self):
        # a host-invalid url re-parsed with the http:// prefix becomes a
        # weird-but-valid url whose path is percent-encoded (WHATWG), the
        # same observable behavior as the reference's parse fallback
        assert (normalize_url("http://a b.example/")
                == "http://http//a%20b.example/")
        assert (normalize_url("http://ho<st.example/")
                == "http://http//ho%3Cst.example/")


class TestJoinUrl:
    BASE = "https://host.example/dir/page.html"

    @pytest.mark.parametrize("href,expected", [
        ("other.html", "https://host.example/dir/other.html"),
        ("/abs/path", "https://host.example/abs/path"),
        ("//cdn.example/x", "https://cdn.example/x"),
        ("https://b.example/y#frag", "https://b.example/y"),      # fragment stripped
        ("?q=2", "https://host.example/dir/page.html?q=2"),
        ("#frag", "https://host.example/dir/page.html"),
        ("../up", "https://host.example/up"),
        ("", "https://host.example/dir/page.html"),
        ("mailto:x@y.z", "mailto:x@y.z"),                          # kept; filtered later
        ("javascript:void(0)", "javascript:void(0)"),
    ])
    def test_golden(self, href, expected):
        assert join_url(self.BASE, href) == expected


class TestDomains:
    def test_extract_domain(self):
        assert extract_domain("https://Sub.Host.example:8080/p") == "sub.host.example"
        with pytest.raises(UrlParseError):
            extract_domain("not a url")

    def test_extract_domain_simple(self):
        # pulse/src/main.rs:227-234 variant
        assert extract_domain_simple("https://www.Foo.COM/bar") == "foo.com"
        assert extract_domain_simple("http://a.b/x/y") == "a.b"
        assert extract_domain_simple("www.only.com") == "only.com"
        # no parsing: port stays
        assert extract_domain_simple("https://a.b:8080/x") == "a.b:8080"


class TestIgnoredFileType:
    @pytest.mark.parametrize("path,ignored", [
        ("/img/photo.JPG", True),
        ("/doc/file.pdf", True),
        ("/x.pdf?dl=1", True),          # '.pdf?' blocked pattern
        ("/download/thing", True),
        ("/site/feed", True),           # '/feed' substring
        ("/a/rss.xml", True),           # '/rss' substring
        ("/pdf/1234.5", True),          # numeric pdf tail
        ("/pdf/", True),                # empty tail: vacuous all() = true
        ("/pdf/paper-v1", True),        # '/pdf/' blocked pattern anyway
        ("/article/pdf-guide", False),
        ("/page.html", False),
        ("/papers/index", False),
        ("/", False),
    ])
    def test_golden(self, path, ignored):
        assert is_ignored_file_type(path) is ignored


def test_md5_partition():
    # genesis/src/db.rs:110-114: first md5 byte, 2-digit hex
    import hashlib
    url = "https://host0.example/"
    assert md5_partition(url) == format(
        hashlib.md5(url.encode()).digest()[0], "02x")
    assert len(md5_partition("x")) == 2
