"""URL canonicalization / validity kernels.

Faithful Python transliterations of the reference C semantics (semantics only,
no code copied), plus a stricter "scale mode" canonicalizer required by the
engine's north rule. Reference functions:

- ``normalize_url``        -> `Serial Version/src/crawler.c:515-558`
- ``extract_base_domain``  -> `Serial Version/src/crawler.c:487-512`
- ``process_extracted_url``-> `Serial Version/src/crawler.c:561-682`
- ``extract_links``        -> `Serial Version/src/crawler.c:685-746`
- ``is_valid_crawl_url``   -> `Serial Version/src/crawler.c:979-1029`
- ``is_html_content``      -> `Serial Version/src/crawler.c:848-873`
- ``get_url_filename``     -> `Serial Version/src/crawler.c:58-90`
- URL priority scoring     -> `OpenMP Version/src/crawler.c:650-732`

The reference implements these with fixed-size C buffers; buffer-size
truncations that are semantically visible (512/1024-char caps) are reproduced
because they affect the visited set and crawl ordering.
"""

from __future__ import annotations

MAX_URL_LENGTH = 512  # reference MAX_URL_LENGTH (`Serial Version/src/crawler.c:15`)

_TRACKING_MARKERS = ("utm_", "fbclid=", "gclid=")
_SCHEME_SKIP_PREFIXES = ("javascript:", "mailto:", "tel:", "data:", "#")

# 24-entry extension blacklist, `Serial Version/src/crawler.c:991-996`.
# Matched with strcasestr => case-insensitive *substring* match anywhere in
# the URL (so ".js" also rejects ".json" URLs — reproduced on purpose).
BLACKLIST_EXTENSIONS = (
    ".jpg", ".jpeg", ".png", ".gif", ".bmp", ".svg", ".ico", ".tiff",
    ".pdf", ".doc", ".docx", ".ppt", ".pptx", ".xls", ".xlsx",
    ".zip", ".rar", ".tar", ".gz", ".mp3", ".mp4", ".avi", ".mov",
    ".css", ".js", ".json", ".xml",
)

# Subset of the blacklist that denotes media payloads; used to classify an
# extracted link as a `media` span (engine addition; the reference simply
# drops these at `crawler.c:991-1001`).
MEDIA_EXTENSIONS = (
    ".jpg", ".jpeg", ".png", ".gif", ".bmp", ".svg", ".ico", ".tiff",
    ".pdf", ".mp3", ".mp4", ".avi", ".mov",
)


def normalize_url(url: str | None) -> str:
    """Reference-mode canonicalization (`Serial Version/src/crawler.c:515-558`).

    Strip ``#fragment``; strip the whole query for medium.com URLs, or for any
    URL whose query mentions a tracking marker; strip one trailing slash.
    Input is truncated to 1023 chars (the C 2*MAX_URL_LENGTH buffer).
    """
    if not url:
        return ""
    s = url[: MAX_URL_LENGTH * 2 - 1]
    frag = s.find("#")
    if frag != -1:
        s = s[:frag]
    q = s.find("?")
    if q != -1:
        if "medium.com" in s:
            s = s[:q]
        else:
            query = s[q:]
            if any(m in query for m in _TRACKING_MARKERS):
                s = s[:q]
    if s.endswith("/"):
        s = s[:-1]
    return s


def canonicalize_url(url: str | None) -> str:
    """Scale-mode canonicalization (north rule; superset of reference mode).

    Lowercase scheme+host, strip default ports, strip fragments, drop the
    tracking params only (not the whole query), sort remaining query params,
    strip one trailing slash. Used as the frontier key in sharded mode.
    """
    if not url:
        return ""
    s = url.strip()
    frag = s.find("#")
    if frag != -1:
        s = s[:frag]
    scheme, sep, rest = s.partition("://")
    if not sep:
        return normalize_url(s)
    scheme = scheme.lower()
    hostport, slash, pathq = rest.partition("/")
    hostport = hostport.lower()
    if (scheme == "http" and hostport.endswith(":80")) or (
        scheme == "https" and hostport.endswith(":443")
    ):
        hostport = hostport.rsplit(":", 1)[0]
    path, qmark, query = pathq.partition("?")
    if qmark:
        kept = [
            p
            for p in query.split("&")
            if p and not any(m in p for m in _TRACKING_MARKERS)
        ]
        query = "&".join(sorted(kept))
    out = scheme + "://" + hostport
    if slash:
        out += "/" + path
    if query:
        out += "?" + query
    if out.endswith("/"):
        out = out[:-1]
    return out


def extract_base_domain(url: str | None) -> str:
    """`Serial Version/src/crawler.c:487-512` — substring from start through
    the host (scheme INCLUDED; the C code copies the URL and truncates at the
    first ``/`` after ``://``). No ``://`` => whole (truncated) URL."""
    if not url:
        return ""
    s = url[: MAX_URL_LENGTH - 1]
    proto = s.find("://")
    if proto == -1:
        return s
    path = s.find("/", proto + 3)
    if path != -1:
        s = s[:path]
    return s


def host_of(url: str) -> str:
    """Lowercased bare hostname (no scheme/port) — the engine's politeness and
    shard-partitioning key. Engine addition (the reference keys politeness on
    nothing; its sleep is global, `Serial Version/src/crawler.c:1380`)."""
    _, sep, rest = url.partition("://")
    if not sep:
        rest = url
    host = rest.split("/", 1)[0]
    host = host.split("@")[-1].split(":")[0]
    return host.lower()


def resolve_url(raw: str, base_url: str, base_domain: str) -> str | None:
    """Relative-URL resolution exactly as `Serial Version/src/crawler.c:584-628`.

    Deliberately NOT RFC 3986 (the reference is not): no ``..`` collapsing; a
    protocol-relative ``//host/p`` under a base WITH a scheme yields the
    (broken) ``https:host/p`` — reproduced because those candidates then fail
    `is_valid_crawl_url` and never consume the per-page admission cap.
    """
    if raw.startswith("http"):
        return raw
    if raw.startswith("/"):
        if raw.startswith("//"):
            proto_end = base_url.find("://")
            if proto_end != -1:
                # C copies base_url[:proto_len] where proto_len includes ':'
                # but NOT the slashes, then appends raw[2:].
                return base_url[: proto_end + 1] + raw[2:]
            return "https:" + raw
        return base_domain + raw
    # Relative to the current page: truncate base after its last '/'
    # (unless that slash is the final char), or append '/' if none.
    absolute = base_url
    last_slash = absolute.rfind("/")
    if last_slash != -1 and last_slash != len(absolute) - 1:
        absolute = absolute[: last_slash + 1]
    elif last_slash == -1:
        absolute = absolute + "/"
    return absolute + raw


def process_extracted_url(
    raw: str,
    base_url: str,
    base_domain: str,
    candidates: list[str],
    visited=None,
) -> str | None:
    """One candidate through the reference's extraction filter chain
    (`Serial Version/src/crawler.c:561-682`). Returns the canonical URL to
    append to ``candidates`` or None.

    ``visited`` is an optional predicate (the serial crawler checks its
    global visited set at extraction time, `crawler.c:653`); pass None to
    defer visited-filtering to the admission stage — the final admitted
    set/order is invariant to this choice because duplicates never consume
    the 20-admissions-per-page cap (see pipelines/crawl.py).
    """
    if len(raw) == 0 or len(raw) >= MAX_URL_LENGTH:
        return None
    if any(raw.startswith(p) for p in _SCHEME_SKIP_PREFIXES):
        return None
    resolved = resolve_url(raw, base_url, base_domain)
    if resolved is None:
        return None
    final_url = normalize_url(resolved)
    if not final_url:
        return None
    if visited is not None and visited(final_url):
        return None
    if final_url in candidates:
        return None
    if "medium.com" in base_url and "medium.com" in final_url:
        pass  # valid (`crawler.c:666-668`)
    elif base_domain and base_domain in final_url:
        pass  # valid (`crawler.c:669-672`)
    else:
        return None
    return final_url


def extract_links(
    html: str, base_url: str, max_urls: int = 1000, visited=None
) -> list[str]:
    """`Serial Version/src/crawler.c:685-746`: scan for ``href="`` / ``href='``
    (case-sensitive, whichever occurs first), run each through
    `process_extracted_url`, keep document order, cap at ``max_urls``."""
    if not html or not base_url or max_urls <= 0:
        return []
    base_domain = extract_base_domain(base_url)
    if not base_domain:
        return []
    out: list[str] = []
    pos = 0
    n = len(html)
    while pos < n and len(out) < max_urls:
        d = html.find('href="', pos)
        s = html.find("href='", pos)
        if d == -1 and s == -1:
            break
        if s == -1 or (d != -1 and d < s):
            start, quote = d + 6, '"'
        else:
            start, quote = s + 6, "'"
        end = html.find(quote, start)
        if end == -1:
            pos = start + 1
            continue
        cand = process_extracted_url(
            html[start:end], base_url, base_domain, out, visited
        )
        if cand is not None:
            out.append(cand)
        pos = end + 1
    return out


def is_valid_crawl_url(url: str | None, base_domain: str | None) -> bool:
    """`Serial Version/src/crawler.c:979-1029`. http(s) scheme, extension
    blacklist (case-insensitive substring!), medium allow/deny path lists,
    else require the base_domain substring."""
    if not url:
        return False
    if not (url.startswith("http://") or url.startswith("https://")):
        return False
    low = url.lower()
    for ext in BLACKLIST_EXTENSIONS:
        if ext in low:
            return False
    if "medium.com" in url:
        if (
            "medium.com/m/signin" in url
            or "medium.com/m/signout" in url
            or "medium.com/plans" in url
            or "help.medium.com" in url
            or "policy.medium.com" in url
        ):
            return False
        if (
            "medium.com/@" in url
            or "/p/" in url
            or "/tag/" in url
            or "/topics/" in url
            or "medium.com/" in url
        ):
            return True
        return False
    if base_domain is not None and base_domain in url:
        return True
    return False


def is_media_url(url: str) -> bool:
    """Engine addition: classify a link the reference would blacklist as a
    media payload (=> `media` span with media_ref, per FIXTURES.md §2)."""
    low = url.lower()
    return any(ext in low for ext in MEDIA_EXTENSIONS)


def is_html_content(url: str, content_type: str | None) -> bool:
    """`Serial Version/src/crawler.c:848-873`: extension check on the LAST
    dot of the whole URL, then Content-Type substring gates, default True."""
    dot = url.rfind(".")
    if dot != -1:
        ext = url[dot:].lower()
        if ext in (".jpg", ".jpeg", ".png", ".gif", ".css", ".js", ".pdf"):
            return False
    if content_type:
        if "text/html" in content_type or "application/xhtml+xml" in content_type:
            return True
        if (
            "image/" in content_type
            or "application/pdf" in content_type
            or "application/javascript" in content_type
            or "text/css" in content_type
        ):
            return False
    return True


def get_url_filename(url: str) -> str:
    """`Serial Version/src/crawler.c:58-90`: last path segment (<50 chars,
    query stripped) else ``webpage_%u.txt`` from the 31-hash (u32 wrap)."""
    last_slash = url.rfind("/")
    if last_slash != -1 and len(url) - last_slash > 1:
        tail = url[last_slash + 1 :]
        qpos = tail.find("?")
        if qpos != -1:
            if 0 < qpos < 50:
                return tail[:qpos]
        elif 0 < len(tail) < 50:
            return tail
    h = 0
    for ch in url:
        h = (31 * h + ord(ch)) & 0xFFFFFFFF
    return f"webpage_{h}.txt"


def url_priority(final_url: str, base_url: str, base_domain: str) -> int:
    """Pattern priority, `OpenMP Version/src/crawler.c:652-694`. 1..5."""
    p = 1
    if "medium.com" in base_url:
        if "medium.com" in final_url:
            if "/tagged/" in final_url:
                p = 3
            elif "/@" in final_url and "/followers" not in final_url:
                p = 4
            elif "/p/" in final_url:
                p = 5
    elif base_domain and base_domain in final_url:
        if (
            "/article/" in final_url
            or "/post/" in final_url
            or "/blog/" in final_url
            or "/story/" in final_url
        ):
            p = 4
        elif "/category/" in final_url or "/tag/" in final_url or "/topics/" in final_url:
            p = 3
        elif "/page/" in final_url or "?page=" in final_url:
            p = 2
    return p


def url_diversity(final_url: str) -> int:
    """Diversity bonus, `OpenMP Version/src/crawler.c:697-701`."""
    if "/tag/" in final_url or "/topic/" in final_url or "/category/" in final_url:
        return 2
    if "/@" in final_url or "/author/" in final_url:
        return 3
    return 0


def combined_priority(final_url: str, base_url: str, base_domain: str) -> int:
    """priority + diversity (`OpenMP Version/src/crawler.c:703`); the engine's
    sharded frontier orders each BFS round by (depth, -priority, seq)."""
    return url_priority(final_url, base_url, base_domain) + url_diversity(final_url)
