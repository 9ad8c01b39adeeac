"""HTML → text extraction — reference T1 / Q7 semantics
(services/LemmasFinder.java:48-50 ``Jsoup.parse(html).text()`` and title
extraction at services/SearchServiceImpl.java:216-221).

This engine defines its own frozen, deterministic extractor (the
byte-identical-per-url invariant from BASELINE.json input_hint): given the
same ``html`` bytes it must always produce the same ``text`` bytes. The rules
are regex-based (no external HTML lib — deterministic and dependency-free):

1. decode UTF-8 (errors replaced deterministically)
2. drop ``<script>``/``<style>``/``<!-- -->`` blocks entirely
3. ``<br>``, ``</p>``, ``</div>``, ``</li>``, ``</h1..6>``, ``</tr>`` become
   newlines (visible line structure — snippets never cross lines, reference
   services/LemmasFinder.java:80)
4. all other tags are removed
5. HTML entities for the common set are decoded (&amp; &lt; &gt; &quot;
   &#39; &nbsp;)
6. horizontal whitespace is collapsed to single spaces per line; blank lines
   dropped; lines stripped

``extract_text`` mirrors Jsoup ``.text()`` (single-line, space-joined);
``extract_block_text`` mirrors ``wholeText()`` line structure used by the
snippet builder (reference services/SearchServiceImpl.java:219-222).
"""

from __future__ import annotations

import re

_SCRIPT_RE = re.compile(r"(?is)<(script|style)\b.*?</\1\s*>")
# the whole <head> is non-content: the title is served by extract_title,
# never mixed into body text (frozen spec — this is what makes
# extract_text(html) == documents.text an exact invariant, golden-tested
# in tests/test_extraction_goldens.py)
_HEAD_RE = re.compile(r"(?is)<head\b.*?</head\s*>")
_COMMENT_RE = re.compile(r"(?s)<!--.*?-->")
_TITLE_RE = re.compile(r"(?is)<title[^>]*>(.*?)</title\s*>")
_BLOCK_BREAK_RE = re.compile(
    r"(?i)<\s*br\s*/?\s*>|</\s*(p|div|li|tr|h[1-6]|ul|ol|table|blockquote|title|head)\s*>"
)
_TAG_RE = re.compile(r"(?s)<[^>]*>")
_ENTITIES = {
    "&amp;": "&",
    "&lt;": "<",
    "&gt;": ">",
    "&quot;": '"',
    "&#39;": "'",
    "&apos;": "'",
    "&nbsp;": " ",
}
_HWS_RE = re.compile(r"[ \t ]+")


def _decode(html: bytes | str) -> str:
    if isinstance(html, (bytes, bytearray)):
        return bytes(html).decode("utf-8", errors="replace")
    return html or ""


def _entities(s: str) -> str:
    for k, v in _ENTITIES.items():
        s = s.replace(k, v)
    return s


def extract_block_text(html: bytes | str) -> str:
    """Line-preserving extraction (for snippets)."""
    s = _decode(html)
    s = _COMMENT_RE.sub("", s)
    # scripts BEFORE head (same reason comments go first): a <script>
    # inside <head> whose source contains the literal '</head>' would
    # otherwise truncate the non-greedy head match and leak raw script
    # source into the extracted text
    s = _SCRIPT_RE.sub("", s)
    s = _HEAD_RE.sub("", s)
    s = _BLOCK_BREAK_RE.sub("\n", s)
    s = _TAG_RE.sub("", s)
    s = _entities(s)
    lines = []
    for line in s.split("\n"):
        line = _HWS_RE.sub(" ", line).strip()
        if line:
            lines.append(line)
    return "\n".join(lines)


def extract_text(html: bytes | str) -> str:
    """Single-line extraction (Jsoup .text() analogue) — the frozen
    byte-identical invariant column."""
    return extract_block_text(html).replace("\n", " ")


def extract_title(html: bytes | str) -> str:
    s = _decode(html)
    s = _COMMENT_RE.sub("", s)
    m = _TITLE_RE.search(s)
    if not m:
        return ""
    return _HWS_RE.sub(" ", _entities(m.group(1))).strip()
