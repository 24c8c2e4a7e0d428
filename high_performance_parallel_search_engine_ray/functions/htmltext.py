"""HTML -> interleaved text/media span extraction.

Exact Python transliteration of the reference's single-pass character state
machine ``html_to_text`` (`Serial Version/src/crawler.c:134-437`) plus
``is_useful_content`` (`crawler.c:110-131`), ``extract_title``
(`crawler.c:749-797`) and ``get_medium_filename`` (`crawler.c:800-845`).

The reference writes a flat text file; this engine emits a structured span
sequence (kind, text, media_ref, offset) per FIXTURES.md §2. The flat file is
a deterministic rendering of the spans (`render_flat`), and the per-row
invariant tested in tests/test_htmltext.py is:

    render_flat(html_to_spans(html)) == flat output of the C state machine

Quirks reproduced on purpose (each is observable in the output):
- ``html_len`` is computed BEFORE the pointer is shifted to <article>/<body>
  (`crawler.c:145` vs `:166,:174`), so all ``i + k < html_len`` guards use the
  ORIGINAL document length while scanning the shifted suffix.
- ``<title>`` text inside a ``<head>``...``</head>`` section is never
  buffered (the in_head skip at `crawler.c:306` precedes the buffering at
  `:342`), and when a ``<body`` tag exists the head is skipped entirely.
- The Medium h1/h2/p handling triggers iff the SHIFTED html still contains
  "medium.com" (`crawler.c:244` re-evaluates strstr on the moved pointer).
- Unknown entities of <=10 chars before ';' are skipped; a skipped entity in
  body text still sets content_written (`crawler.c:415-429`).
- Whitespace-only documents count as content_written (`crawler.c:388-392`).
"""

from __future__ import annotations

from .urlnorm import is_media_url

_C_SPACE = " \t\n\v\f\r"
import re as _re

_NON_ALPHA_RE = _re.compile(r"[A-Za-z]")
_NON_CSPACE_RE = _re.compile("[ \t\n\x0b\x0c\r]")
_FALLBACK = "No readable content could be extracted from this page."
_BUF_CAP = 9999  # text_buffer[10000], guard `buffer_pos < sizeof-1`


def _is_c_space(ch: str) -> bool:
    return ch in _C_SPACE


def _is_c_alpha(ch: str) -> bool:
    return ("a" <= ch <= "z") or ("A" <= ch <= "Z")


def _is_c_punct(ch: str) -> bool:
    o = ord(ch)
    return 33 <= o <= 126 and not ch.isalnum()


def is_useful_content(text: str) -> bool:
    """`Serial Version/src/crawler.c:110-131`. Counts are over the first 200
    chars but the ratios divide by the FULL length, and — critically — the C
    computes the ratios in 32-bit float: a paragraph whose alpha ratio is
    exactly 174/435 = 0.4 PASSES in C (float32 rounds up past the double
    0.4) but would fail in float64. Found by differential testing against
    the compiled reference."""
    import numpy as np

    length = len(text)
    if length < 10:
        return False
    prefix = text[:200]
    # [A-Za-z] and the C space class are disjoint, so the if/elif counting
    # loop equals two independent counts; regex C passes replace it.
    alpha = len(prefix) - len(_NON_ALPHA_RE.sub("", prefix))
    space = len(prefix) - len(_NON_CSPACE_RE.sub("", prefix))
    alpha_ratio = float(np.float32(alpha) / np.float32(length))
    space_ratio = float(np.float32(space) / np.float32(length))
    return alpha_ratio > 0.4 and 0.05 < space_ratio < 0.3


def _istarts(html: str, i: int, prefix: str) -> bool:
    """strncasecmp(&html[i], prefix, len(prefix)) == 0. All call sites pass
    '<'-leading lowercase patterns; the startswith fast path avoids slice
    allocations for the (dominant) exact-case hits and cheap second-char
    rejection covers most misses."""
    if html.startswith(prefix, i):
        return True
    c = html[i + 1 : i + 2]
    if not c or c.lower() != prefix[1]:
        return False
    return html[i : i + len(prefix)].lower() == prefix


def html_to_events_slow(html: str) -> list[tuple[str, str]]:
    """Run the C state machine; return write events in emission order.

    Events: ('title'|'h1'|'h2'|'p', text) for buffered elements and
    ('body', text) for maximal runs of raw character output (paragraph-break
    "\\n\\n" markers included verbatim). `render_flat` maps events back to the
    byte-exact flat output of the reference's ``html_to_text``.
    """
    html_len = len(html)  # strlen BEFORE any pointer shift (crawler.c:145)

    # Medium: shift to <article> / section-inner; else shift to <body>.
    article_found = False
    if "medium.com" in html:
        idx = html.find("<article")
        if idx == -1:
            idx = html.find('<section class="section-inner')
        if idx != -1:
            html = html[idx:]
            article_found = True
    if not article_found:
        b = html.find("<body")
        if b != -1:
            html = html[b:]

    is_medium = "medium.com" in html  # crawler.c:244, on the shifted pointer

    events: list[tuple[str, str]] = []
    raw: list[str] = []
    buf: list[str] = []

    def flush_raw() -> None:
        if raw:
            events.append(("body", "".join(raw)))
            raw.clear()

    def emit(kind: str, text: str) -> None:
        flush_raw()
        events.append((kind, text))

    in_tag = in_script = in_style = in_head = in_comment = False
    in_title = in_heading = in_paragraph = False
    consecutive_spaces = 0
    content_written = False

    n = len(html)
    i = 0
    while i < n:
        ch = html[i]

        # --- comments (crawler.c:180-192)
        if i + 3 < html_len and not in_comment and not in_tag and html[i : i + 4] == "<!--":
            in_comment = True
            i += 4
            continue
        elif in_comment and i + 2 < html_len and html[i : i + 3] == "-->":
            in_comment = False
            i += 3
            continue
        if in_comment:
            i += 1
            continue

        # --- section / buffered-element chain (crawler.c:195-303)
        if not in_tag and i + 6 < html_len and _istarts(html, i, "<head>"):
            in_head = True
            in_tag = True
            i += 1
            continue
        elif in_head and i + 7 < html_len and _istarts(html, i, "</head>"):
            in_head = False
            in_tag = True
            i += 7
            continue
        elif not in_tag and i + 8 < html_len and _istarts(html, i, "<script"):
            in_script = True
            in_tag = True
            # no continue in the C — falls through to the skip block
        elif not in_tag and i + 7 < html_len and _istarts(html, i, "<style"):
            in_style = True
            in_tag = True
        elif in_script and i + 9 < html_len and _istarts(html, i, "</script>"):
            in_script = False
            i += 9
            continue
        elif in_style and i + 8 < html_len and _istarts(html, i, "</style>"):
            in_style = False
            i += 8
            continue
        elif not in_tag and i + 7 < html_len and _istarts(html, i, "<title>"):
            in_title = True
            buf.clear()
            i += 7
            continue
        elif in_title and i + 8 < html_len and _istarts(html, i, "</title>"):
            in_title = False
            if buf:
                emit("title", "".join(buf))
                content_written = True
            buf.clear()
            i += 8
            continue
        elif not in_tag and is_medium:
            if i + 3 < html_len and _istarts(html, i, "<h1"):
                in_heading = True
                buf.clear()
                in_tag = True
                i += 3
                continue
            elif in_heading and i + 5 < html_len and _istarts(html, i, "</h1>"):
                in_heading = False
                if buf:
                    emit("h1", "".join(buf))
                    content_written = True
                buf.clear()
                i += 5
                continue
            elif i + 3 < html_len and _istarts(html, i, "<h2"):
                in_heading = True
                buf.clear()
                in_tag = True
                i += 3
                continue
            elif in_heading and i + 5 < html_len and _istarts(html, i, "</h2>"):
                in_heading = False
                if buf:
                    emit("h2", "".join(buf))
                    content_written = True
                buf.clear()
                i += 5
                continue
            elif i + 3 < html_len and _istarts(html, i, "<p>"):
                in_paragraph = True
                buf.clear()
                i += 3
                continue
            elif in_paragraph and i + 4 < html_len and _istarts(html, i, "</p>"):
                in_paragraph = False
                if buf:
                    text = "".join(buf)
                    if is_useful_content(text):
                        emit("p", text)
                        content_written = True
                buf.clear()
                i += 4
                continue
            # fall through when no inner branch matched, as the C does

        # --- skip head/script/style content (crawler.c:306-313)
        if in_head or in_script or in_style:
            if ch == "<":
                in_tag = True
            elif in_tag and ch == ">":
                in_tag = False
            i += 1
            continue

        # --- tag open + paragraph-break tags (crawler.c:316-331)
        if ch == "<":
            in_tag = True
            if i + 4 < html_len and (
                _istarts(html, i, "<p>")
                or _istarts(html, i, "<br")
                or _istarts(html, i, "<li")
                or _istarts(html, i, "<h")
            ):
                if not in_title and not in_heading and not in_paragraph:
                    raw.append("\n\n")
                consecutive_spaces = 0
            i += 1
            continue

        if in_tag:
            if ch == ">":
                in_tag = False
            i += 1
            continue

        # --- buffered-element content (crawler.c:342-384)
        if in_title or in_heading or in_paragraph:
            if len(buf) < _BUF_CAP:
                if ch == "&":
                    if i + 5 < html_len and html[i : i + 5] == "&amp;":
                        buf.append("&")
                        i += 5
                        continue
                    elif i + 4 < html_len and html[i : i + 4] == "&lt;":
                        buf.append("<")
                        i += 4
                        continue
                    elif i + 4 < html_len and html[i : i + 4] == "&gt;":
                        buf.append(">")
                        i += 4
                        continue
                    elif i + 6 < html_len and html[i : i + 6] == "&quot;":
                        buf.append('"')
                        i += 6
                        continue
                    elif i + 6 < html_len and html[i : i + 6] == "&nbsp;":
                        buf.append(" ")
                        i += 6
                        continue
                    elif i + 6 < html_len and html[i : i + 6] == "&#039;":
                        buf.append("'")
                        i += 6
                        continue
                    else:
                        j = i
                        while j < n and html[j] != ";" and j - i < 10:
                            j += 1
                        if j < n and html[j] == ";":
                            i = j + 1
                        else:
                            buf.append(ch)
                            i += 1
                        continue
                elif _is_c_space(ch):
                    if buf and not _is_c_space(buf[-1]):
                        buf.append(" ")
                else:
                    buf.append(ch)
            i += 1
            continue

        # --- regular body text (crawler.c:387-430)
        if _is_c_space(ch):
            if consecutive_spaces == 0:
                raw.append(" ")
                consecutive_spaces = 1
                content_written = True
            i += 1
            continue
        if ch == "&":
            if i + 5 < html_len and html[i : i + 5] == "&amp;":
                raw.append("&")
                i += 5
            elif i + 4 < html_len and html[i : i + 4] == "&lt;":
                raw.append("<")
                i += 4
            elif i + 4 < html_len and html[i : i + 4] == "&gt;":
                raw.append(">")
                i += 4
            elif i + 6 < html_len and html[i : i + 6] == "&quot;":
                raw.append('"')
                i += 6
            elif i + 6 < html_len and html[i : i + 6] == "&nbsp;":
                raw.append(" ")
                i += 6
            elif i + 6 < html_len and html[i : i + 6] == "&#039;":
                raw.append("'")
                i += 6
            else:
                j = i
                while j < n and html[j] != ";" and j - i < 10:
                    j += 1
                if j < n and html[j] == ";":
                    i = j + 1
                else:
                    raw.append(ch)
                    i += 1
            consecutive_spaces = 0
            content_written = True
            continue
        raw.append(ch)
        consecutive_spaces = 0
        content_written = True
        i += 1

    flush_raw()
    if not content_written:
        events.append(("body", _FALLBACK))
    return events


def render_flat(events: list[tuple[str, str]]) -> str:
    """Map span events back to the reference's flat file bytes
    (`crawler.c:236,258,277,296` emission formats)."""
    parts: list[str] = []
    for kind, text in events:
        if kind in ("title", "h1"):
            parts.append("\n\n# " + text + "\n\n")
        elif kind == "h2":
            parts.append("\n\n## " + text + "\n\n")
        elif kind == "p":
            parts.append(text + "\n\n")
        else:  # body / media / link
            if kind == "body":
                parts.append(text)
    return "".join(parts)


def html_to_spans(html: str, links: list[str] | None = None):
    """Full interleaved-document row per FIXTURES.md §2.

    Text spans come from the state machine in emission order; extracted links
    follow in href order as `media` (blacklisted payload extensions) or
    `link` spans with the URL in ``media_ref``. ``offset`` is the 0-based
    global span sequence number. Returns list of dicts matching
    struct<kind,text,media_ref,offset>.
    """
    spans = []
    for kind, text in html_to_events(html):
        spans.append(
            {"kind": kind, "text": text, "media_ref": "", "offset": len(spans)}
        )
    for url in links or []:
        spans.append(
            {
                "kind": "media" if is_media_url(url) else "link",
                "text": "",
                "media_ref": url,
                "offset": len(spans),
            }
        )
    return spans


def extract_title(html: str) -> str:
    """`Serial Version/src/crawler.c:749-797`: text of the first
    <title...>...</title>, with &amp;/&lt;/&gt; decoded; 255-char cap."""
    start = html.find("<title")
    if start == -1:
        return ""
    gt = html.find(">", start)
    if gt == -1:
        return ""
    end = html.find("</title>", gt + 1)
    if end == -1:
        return ""
    title = html[gt + 1 : end]
    if not (0 < len(title) < 255):
        return ""
    title = title.replace("&amp;", "&").replace("&lt;", "<").replace("&gt;", ">")
    return title


def get_medium_filename(url: str, html: str) -> str:
    """`Serial Version/src/crawler.c:800-845`."""
    from .urlnorm import get_url_filename

    title = extract_title(html)
    if title:
        safe = []
        for ch in title:
            if len(safe) >= 251:
                break
            if ch.isalnum() or ch in " -_":
                safe.append("_" if ch == " " else ch.lower())
        safe_title = "".join(safe)
        if safe_title:
            return f"medium_{safe_title}.txt"
    if "medium.com/@" in url:
        username = url[url.find("@") + 1 :]
        out = []
        for ch in username:
            if ch in "/?" or len(out) >= 99:
                break
            out.append(ch)
        if out:
            return "medium_profile_" + "".join(out) + ".txt"
    return get_url_filename(url)


_WS_RUN = __import__("re").compile(r"[ \t\n\x0b\x0c\r]+")


def _collapse(run: str) -> str:
    """Collapse C-space runs to single spaces; fast path skips the regex
    when the run is already collapsed (single spaces only)."""
    if (
        "\t" in run or "\n" in run or "\r" in run
        or "\x0b" in run or "\x0c" in run or "  " in run
    ):
        return _WS_RUN.sub(" ", run)
    return run


def html_to_events(html: str) -> list[tuple[str, str]]:
    """Fast scanner: semantically identical to `html_to_events_slow` (which
    is the line-by-line C transliteration kept as the in-repo oracle), but
    with pattern checks gated on '<' and run-chunked jumps for comments,
    tags, and text runs. Equality fast==slow is property-tested against the
    compiled reference C binary and a fuzz corpus in tests/test_htmltext.py;
    the hot fetch/parse stage uses this version (~50x faster)."""
    html_len = len(html)  # strlen BEFORE any pointer shift (crawler.c:145)

    article_found = False
    if "medium.com" in html:
        idx = html.find("<article")
        if idx == -1:
            idx = html.find('<section class="section-inner')
        if idx != -1:
            html = html[idx:]
            article_found = True
    if not article_found:
        b = html.find("<body")
        if b != -1:
            html = html[b:]

    is_medium = "medium.com" in html

    events: list[tuple[str, str]] = []
    raw: list[str] = []
    buf: list[str] = []
    buf_len = 0

    def flush_raw() -> None:
        if raw:
            events.append(("body", "".join(raw)))
            raw.clear()

    def emit(kind: str, text: str) -> None:
        flush_raw()
        events.append((kind, text))

    in_tag = in_script = in_style = in_head = in_comment = False
    in_title = in_heading = in_paragraph = False
    consecutive_spaces = 0
    content_written = False

    n = len(html)
    i = 0
    while i < n:
        if in_comment:
            j = html.find("-->", i)
            if j == -1:
                break  # unterminated comment swallows the rest
            in_comment = False
            i = j + 3
            continue

        ch = html[i]
        if ch == "<":
            # comment open (crawler.c:180)
            if not in_tag and i + 3 < html_len and html[i : i + 4] == "<!--":
                in_comment = True
                i += 4
                continue
            # section / buffered-element chain (crawler.c:195-303)
            if not in_tag and i + 6 < html_len and _istarts(html, i, "<head>"):
                in_head = True
                in_tag = True
                i += 1
                continue
            elif in_head and i + 7 < html_len and _istarts(html, i, "</head>"):
                in_head = False
                in_tag = True
                i += 7
                continue
            elif not in_tag and i + 8 < html_len and _istarts(html, i, "<script"):
                in_script = True
                in_tag = True
                i += 1  # falls into the skip block on '<' in the C
                continue
            elif not in_tag and i + 7 < html_len and _istarts(html, i, "<style"):
                in_style = True
                in_tag = True
                i += 1
                continue
            elif in_script and i + 9 < html_len and _istarts(html, i, "</script>"):
                in_script = False
                i += 9
                continue
            elif in_style and i + 8 < html_len and _istarts(html, i, "</style>"):
                in_style = False
                i += 8
                continue
            elif not in_tag and i + 7 < html_len and _istarts(html, i, "<title>"):
                in_title = True
                buf.clear()
                buf_len = 0
                i += 7
                continue
            elif in_title and i + 8 < html_len and _istarts(html, i, "</title>"):
                in_title = False
                if buf:
                    emit("title", "".join(buf))
                    content_written = True
                buf.clear()
                buf_len = 0
                i += 8
                continue
            elif not in_tag and is_medium:
                if i + 3 < html_len and _istarts(html, i, "<h1"):
                    in_heading = True
                    buf.clear()
                    buf_len = 0
                    in_tag = True
                    i += 3
                    continue
                elif in_heading and i + 5 < html_len and _istarts(html, i, "</h1>"):
                    in_heading = False
                    if buf:
                        emit("h1", "".join(buf))
                        content_written = True
                    buf.clear()
                    buf_len = 0
                    i += 5
                    continue
                elif i + 3 < html_len and _istarts(html, i, "<h2"):
                    in_heading = True
                    buf.clear()
                    buf_len = 0
                    in_tag = True
                    i += 3
                    continue
                elif in_heading and i + 5 < html_len and _istarts(html, i, "</h2>"):
                    in_heading = False
                    if buf:
                        emit("h2", "".join(buf))
                        content_written = True
                    buf.clear()
                    buf_len = 0
                    i += 5
                    continue
                elif i + 3 < html_len and _istarts(html, i, "<p>"):
                    in_paragraph = True
                    buf.clear()
                    buf_len = 0
                    i += 3
                    continue
                elif in_paragraph and i + 4 < html_len and _istarts(html, i, "</p>"):
                    in_paragraph = False
                    if buf:
                        text = "".join(buf)
                        if is_useful_content(text):
                            emit("p", text)
                            content_written = True
                    buf.clear()
                    buf_len = 0
                    i += 4
                    continue
            if in_head or in_script or in_style:
                in_tag = True  # skip-block '<' (crawler.c:307)
                i += 1
                continue
            # tag open + paragraph-break tags (crawler.c:316-331)
            in_tag = True
            if i + 4 < html_len and (
                _istarts(html, i, "<p>")
                or _istarts(html, i, "<br")
                or _istarts(html, i, "<li")
                or _istarts(html, i, "<h")
            ):
                if not in_title and not in_heading and not in_paragraph:
                    raw.append("\n\n")
                consecutive_spaces = 0
            i += 1
            continue

        # ---- non-'<' characters ------------------------------------------
        if in_head or in_script or in_style:
            if in_tag:
                jl = html.find("<", i)
                jg = html.find(">", i)
                if jg != -1 and (jl == -1 or jg < jl):
                    in_tag = False
                    i = jg + 1
                elif jl != -1:
                    i = jl  # '<' may match a chain pattern — re-dispatch
                else:
                    i = n
            else:
                jl = html.find("<", i)
                i = jl if jl != -1 else n
            continue

        if in_tag:
            jl = html.find("<", i)
            jg = html.find(">", i)
            if jg != -1 and (jl == -1 or jg < jl):
                in_tag = False
                i = jg + 1
            elif jl != -1:
                i = jl
            else:
                i = n
            continue

        if in_title or in_heading or in_paragraph:
            if ch == "&":
                if buf_len < _BUF_CAP:
                    if i + 5 < html_len and html[i : i + 5] == "&amp;":
                        buf.append("&")
                        buf_len += 1
                        i += 5
                    elif i + 4 < html_len and html[i : i + 4] == "&lt;":
                        buf.append("<")
                        buf_len += 1
                        i += 4
                    elif i + 4 < html_len and html[i : i + 4] == "&gt;":
                        buf.append(">")
                        buf_len += 1
                        i += 4
                    elif i + 6 < html_len and html[i : i + 6] == "&quot;":
                        buf.append('"')
                        buf_len += 1
                        i += 6
                    elif i + 6 < html_len and html[i : i + 6] == "&nbsp;":
                        buf.append(" ")
                        buf_len += 1
                        i += 6
                    elif i + 6 < html_len and html[i : i + 6] == "&#039;":
                        buf.append("'")
                        buf_len += 1
                        i += 6
                    else:
                        j = i
                        while j < n and html[j] != ";" and j - i < 10:
                            j += 1
                        if j < n and html[j] == ";":
                            i = j + 1
                        else:
                            buf.append(ch)
                            buf_len += 1
                            i += 1
                else:
                    i += 1
                continue
            jl = html.find("<", i)
            ja = html.find("&", i)
            j = min(x for x in (jl, ja, n) if x != -1)
            run = html[i : j]
            if buf_len + len(run) < _BUF_CAP:
                collapsed = _collapse(run)
                if collapsed.startswith(" ") and (
                    not buf or _is_c_space(buf[-1][-1])
                ):
                    collapsed = collapsed[1:]
                if collapsed:
                    buf.append(collapsed)
                    buf_len += len(collapsed)
            else:
                for c in run:
                    if buf_len < _BUF_CAP:
                        if _is_c_space(c):
                            if buf and not _is_c_space(buf[-1][-1]):
                                buf.append(" ")
                                buf_len += 1
                        else:
                            buf.append(c)
                            buf_len += 1
            i = j
            continue

        # ---- regular body text -------------------------------------------
        if ch == "&":
            if i + 5 < html_len and html[i : i + 5] == "&amp;":
                raw.append("&")
                i += 5
            elif i + 4 < html_len and html[i : i + 4] == "&lt;":
                raw.append("<")
                i += 4
            elif i + 4 < html_len and html[i : i + 4] == "&gt;":
                raw.append(">")
                i += 4
            elif i + 6 < html_len and html[i : i + 6] == "&quot;":
                raw.append('"')
                i += 6
            elif i + 6 < html_len and html[i : i + 6] == "&nbsp;":
                raw.append(" ")
                i += 6
            elif i + 6 < html_len and html[i : i + 6] == "&#039;":
                raw.append("'")
                i += 6
            else:
                j = i
                while j < n and html[j] != ";" and j - i < 10:
                    j += 1
                if j < n and html[j] == ";":
                    i = j + 1
                else:
                    raw.append(ch)
                    i += 1
            consecutive_spaces = 0
            content_written = True
            continue
        jl = html.find("<", i)
        ja = html.find("&", i)
        j = min(x for x in (jl, ja, n) if x != -1)
        run = html[i : j]
        collapsed = _collapse(run)
        if collapsed.startswith(" ") and consecutive_spaces == 1:
            collapsed = collapsed[1:]
        if collapsed:
            raw.append(collapsed)
            content_written = True
        consecutive_spaces = 1 if _is_c_space(run[-1]) else 0
        i = j

    flush_raw()
    if not content_written:
        events.append(("body", _FALLBACK))
    return events
