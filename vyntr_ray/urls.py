"""URL algebra: normalization, joining, domain extraction, link filtering.

Re-implements (from public WHATWG-URL behavior, not by porting code) the
observable semantics of the reference crawler's URL handling:

- ``normalize_url``     — reference `genesis/src/utils.rs:5-8`: parse with an
  ``http://`` prefix fallback and re-serialize.  The Rust ``url`` crate is a
  WHATWG URL implementation, so serialization lowercases scheme and host,
  strips default ports, ensures a root path, removes dot segments and keeps
  query/fragment as written.
- ``extract_domain``    — reference `genesis/src/crawler.rs:51-55`: host of
  the parsed URL (error when absent).
- ``extract_domain_simple`` — reference `pulse/src/main.rs:227-234`: strip
  scheme + ``www.``, take up to first ``/``, lowercase.  Intentionally a
  *different* function from ``extract_domain``.
- ``join_url``          — WHATWG join used at `genesis/src/html_parser.rs:41`
  (``base_url.join(href)`` + ``set_fragment(None)``).
- ``is_ignored_file_type`` — constants and heuristics of
  `genesis/src/html_parser.rs:104-162` (the table is data, kept verbatim).
- ``md5_partition``     — `genesis/src/db.rs:110-114`: first md5 byte as hex.

Everything here is pure Python operating on single strings; the vectorized
batch wrappers live in ``vyntr_ray.stages``.
"""

from __future__ import annotations

import hashlib
import re
from urllib.parse import urljoin as _rfc_urljoin

__all__ = [
    "normalize_url",
    "join_url",
    "extract_domain",
    "extract_domain_simple",
    "is_ignored_file_type",
    "md5_partition",
    "UrlParseError",
]


class UrlParseError(ValueError):
    """Raised when a URL cannot be parsed (reference: `Err(_) => continue`)."""


_SCHEME_RE = re.compile(r"^([A-Za-z][A-Za-z0-9+.\-]*):")
_DEFAULT_PORTS = {"http": "80", "https": "443", "ws": "80", "wss": "443", "ftp": "21"}
# WHATWG: strip leading/trailing C0 controls and space, remove tab/newline.
_STRIP_CHARS = "".join(chr(c) for c in range(0x21)) # includes space
_TAB_NL = str.maketrans("", "", "\t\n\r")
# WHATWG forbidden host code points (subset; ':' is split off earlier)
_FORBIDDEN_HOST_CHARS = frozenset("\x00 #/:<>?@[\\]^|" + "".join(
    chr(c) for c in range(0x01, 0x20)))


def _remove_dot_segments(path: str) -> str:
    """WHATWG / RFC 3986 dot-segment removal over an absolute path."""
    if "." not in path:
        return path
    out: list[str] = []
    for seg in path.split("/"):
        if seg == "..":
            if out and out[-1] != "":
                out.pop()
            if not out:
                out = [""]
        elif seg != ".":
            out.append(seg)
    # preserve trailing slash semantics of /./ and /../ terminators
    if path.endswith("/.") or path.endswith("/..") or path.endswith("/"):
        if not out or out[-1] != "":
            out.append("")
    if not out or out[0] != "":
        out.insert(0, "")
    p = "/".join(out)
    return p if p.startswith("/") else "/" + p


# WHATWG percent-encode sets (path / query / fragment); existing %XX kept.
def _pct(text: str, extra: str) -> str:
    if not any(c in extra or ord(c) < 0x21 or ord(c) > 0x7E for c in text):
        return text
    out = []
    for c in text:
        if c in extra or ord(c) < 0x21:
            out.append(f"%{ord(c):02X}")
        elif ord(c) > 0x7E:
            out.extend(f"%{b:02X}" for b in c.encode("utf-8"))
        else:
            out.append(c)
    return "".join(out)


def _serialize(scheme: str, userinfo: str, host: str, port: str, path: str,
               query: str | None, fragment: str | None) -> str:
    s = scheme + "://"
    if userinfo:
        s += userinfo + "@"
    s += host
    if port:
        s += ":" + port
    s += _pct(path, '"<>`{}^|')
    if query is not None:
        s += "?" + _pct(query, '"<>\'')
    if fragment is not None:
        s += "#" + _pct(fragment, ' "<>`')
    return s


def _parse_http_like(url: str) -> tuple[str, str, str, str, str, str | None, str | None]:
    """Parse an http(s)-family absolute URL into components, WHATWG-flavoured.

    Returns (scheme, userinfo, host, port, path, query, fragment); query and
    fragment are None when their delimiter is absent (so '' means present but
    empty, matching `url` crate round-tripping of "http://a/?").
    """
    u = url.strip(_STRIP_CHARS).translate(_TAB_NL)
    m = _SCHEME_RE.match(u)
    if not m:
        raise UrlParseError(f"relative URL without a base: {url!r}")
    scheme = m.group(1).lower()
    rest = u[m.end():]
    if scheme not in ("http", "https"):
        # Non-special or non-http scheme: keep opaque (mailto:, javascript:).
        return scheme, "", "", "", rest, None, None
    # WHATWG: special schemes treat any number of / or \ after the colon.
    rest = rest.replace("\\", "/")
    rest = re.sub(r"^/*", "", rest)
    # split off fragment, then query
    fragment: str | None = None
    query: str | None = None
    if "#" in rest:
        rest, fragment = rest.split("#", 1)
    if "?" in rest:
        rest, query = rest.split("?", 1)
    # authority = up to first /
    if "/" in rest:
        authority, path = rest.split("/", 1)
        path = "/" + path
    else:
        authority, path = rest, ""
    userinfo = ""
    if "@" in authority:
        userinfo, authority = authority.rsplit("@", 1)
    port = ""
    if authority.startswith("["):  # IPv6 literal
        host_end = authority.find("]")
        if host_end == -1:
            raise UrlParseError(f"bad IPv6 host in {url!r}")
        host = authority[: host_end + 1].lower()
        tail = authority[host_end + 1:]
        if tail.startswith(":"):
            port = tail[1:]
    elif ":" in authority:
        host, port = authority.rsplit(":", 1)
        host = host.lower()
        if port and not port.isdigit():
            raise UrlParseError(f"invalid port in {url!r}")
    else:
        host = authority.lower()
    if not host:
        raise UrlParseError(f"empty host in {url!r}")
    if not host.startswith("[") and any(
            c in _FORBIDDEN_HOST_CHARS for c in host):
        raise UrlParseError(f"forbidden host code point in {url!r}")
    if port and int(port) > 65535:
        raise UrlParseError(f"port out of range in {url!r}")
    if port:
        port = str(int(port))  # strip leading zeros
        if _DEFAULT_PORTS.get(scheme) == port:
            port = ""
    path = _remove_dot_segments(path) if path else "/"
    return scheme, userinfo, host, port, path, query, fragment


def normalize_url(url: str) -> str:
    """Parse ``url`` (falling back to an ``http://`` prefix) and re-serialize.

    Mirrors `genesis/src/utils.rs:5-8`.  Raises UrlParseError when both parse
    attempts fail; callers drop such rows (`genesis/src/main.rs:180-183`).
    """
    try:
        parts = _parse_http_like(url)
    except UrlParseError:
        parts = _parse_http_like("http://" + url)
    scheme, userinfo, host, port, path, query, fragment = parts
    if scheme not in ("http", "https"):
        # opaque serialization: scheme:rest (the crawler filters these later)
        out = scheme + ":" + path
        if query is not None:
            out += "?" + query
        if fragment is not None:
            out += "#" + fragment
        return out
    return _serialize(scheme, userinfo, host, port, path, query, fragment)


def join_url(base: str, href: str) -> str:
    """WHATWG-style join of ``href`` against ``base`` with fragment stripped.

    Mirrors `genesis/src/html_parser.rs:41-42` (``base_url.join(&href)`` then
    ``url.set_fragment(None)``).  Raises UrlParseError when the result cannot
    be parsed.
    """
    href = href.strip(_STRIP_CHARS).translate(_TAB_NL)
    m = _SCHEME_RE.match(href)
    if m and m.group(1).lower() not in ("http", "https"):
        # absolute non-http URL (mailto:, javascript:, ftp:, data:) — parse
        # standalone; scheme check happens in the link filter.
        scheme, _, _, _, rest, q, _f = _parse_http_like(href)
        out = scheme + ":" + rest
        if q is not None:
            out += "?" + q
        return out
    joined = _rfc_urljoin(base, href.replace("\\", "/"))
    scheme, userinfo, host, port, path, query, _ = _parse_http_like(joined)
    return _serialize(scheme, userinfo, host, port, path, query, None)


def extract_domain(url: str) -> str:
    """Host of the parsed URL. Mirrors `genesis/src/crawler.rs:51-55`."""
    scheme, _, host, _, _, _, _ = _parse_http_like(url)
    if not host:
        raise UrlParseError(f"URL has no host: {url!r}")
    return host


def extract_domain_simple(url: str) -> str:
    """Pulse's variant: strip scheme + www., pre-'/', lowercased.

    Mirrors `pulse/src/main.rs:227-234` (note: NOT the same as
    ``extract_domain`` — no real parsing, userinfo/port kept).
    """
    u = url
    for prefix in ("http://", "https://"):
        if u.startswith(prefix):
            u = u[len(prefix):]
            break  # Rust trim_start_matches chain strips each prefix once
    if u.startswith("www."):
        u = u[4:]
    return u.split("/", 1)[0].lower()


# --- link filter constants: data tables from genesis/src/html_parser.rs:104-136
_IGNORED_EXTENSIONS = (
    ".jpg", ".jpeg", ".png", ".gif", ".bmp", ".webp", ".svg", ".ico", ".tiff",
    ".pdf", ".epub", ".mobi",
    ".doc", ".docx", ".xls", ".xlsx", ".ppt", ".pptx", ".txt", ".rtf", ".csv",
    ".zip", ".rar", ".tar", ".gz", ".7z", ".bz2", ".iso",
    ".mp3", ".mp4", ".wav", ".avi", ".mov", ".wmv", ".flv", ".ogg", ".ogv",
    ".webm", ".m4a", ".m4v", ".3gp",
    ".mpg", ".exe", ".dmg", ".pkg", ".deb", ".rpm", ".apk", ".ipa",
)
_BLOCKED_PATTERNS = (
    "/download/", "/compress/", "/stream/", "/pdf/", "/static/",
    "/content/uploads/", "arxiv.org/pdf/", "arxiv.org/ps/", "arxiv.org/src/",
    ".pdf?", "/lectures/", "/video/", "/audio/", "/rss", ".rss", "/feed",
    "/atom",
)


def is_ignored_file_type(path: str) -> bool:
    """URL-path blocklist. Mirrors `genesis/src/html_parser.rs:104-162`."""
    path_lower = path.lower()
    if path_lower.endswith(_IGNORED_EXTENSIONS):
        return True
    for pattern in _BLOCKED_PATTERNS:
        if pattern in path_lower:
            return True
    if "/pdf/" in path_lower:
        last = path_lower.rsplit("/", 1)[-1]
        # Rust: all chars numeric or '.'; vacuously true for empty last segment
        if all(c.isdigit() or c == "." for c in last):
            return True
    return False


def md5_partition(url: str) -> str:
    """Two-hex-digit partition key = first md5 byte of the url.

    Mirrors `genesis/src/db.rs:110-114`.
    """
    return format(hashlib.md5(url.encode("utf-8")).digest()[0], "02x")


def url_bucket(url: str, n_buckets: int) -> int:
    """Store-layout bucket: first two md5 bytes mod ``n_buckets``.

    The bucket count is a *parameter* (the reference hardcodes 256
    partitions, `genesis/src/db.rs:110-114`); size it so each bucket is a
    few GB at the target corpus scale (SURVEY §7.4.8).
    """
    return int.from_bytes(
        hashlib.md5(url.encode("utf-8")).digest()[:2], "big") % n_buckets
