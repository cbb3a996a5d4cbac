"""HTML → text extraction (regex/stdlib only — bs4/lxml unavailable).

The reference library has no HTML stage; its only markup→plain-text transform
is the markdown annotation substitution (/root/reference/spacy_crfsuite/
markdown.py:32-41). For the web-pages pipeline, THIS function defines the
extraction semantics, and the Ray stage calls exactly this function, so the
"byte-identical extracted text per url" invariant holds by construction and is
asserted per-row in tests/test_pipeline.py.

Deterministic algorithm:
1. drop <script>/<style>/<noscript>/<template> elements and HTML comments,
2. drop boilerplate containers <nav>/<header>/<footer>/<aside>,
3. block-level tags become newlines, other tags vanish,
4. decode HTML entities (stdlib html.unescape),
5. collapse runs of spaces/tabs, collapse 3+ newlines to 2, strip each line,
   strip the ends.
"""

from __future__ import annotations

import html as _html
import re

_DROP_RE = re.compile(
    r"<(script|style|noscript|template|nav|header|footer|aside)\b[^>]*>.*?</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_BLOCK_TAG_RE = re.compile(
    r"</?(p|div|br|li|ul|ol|h[1-6]|tr|table|blockquote|section|article|pre|hr|"
    r"dl|dt|dd|figure|figcaption|main|form)\b[^>]*>",
    re.IGNORECASE,
)
_TAG_RE = re.compile(r"<[^>]+>")
_SPACES_RE = re.compile(r"[ \t\r\f\v]+")
_MANY_NL_RE = re.compile(r"\n{3,}")


def extract_text(html_bytes) -> str:
    """Extract plain text from an HTML document (bytes or str)."""
    if isinstance(html_bytes, (bytes, bytearray, memoryview)):
        raw = bytes(html_bytes).decode("utf-8", errors="replace")
    else:
        raw = html_bytes
    s = _COMMENT_RE.sub("", raw)
    s = _DROP_RE.sub("", s)
    s = _BLOCK_TAG_RE.sub("\n", s)
    s = _TAG_RE.sub("", s)
    s = _html.unescape(s)
    s = _SPACES_RE.sub(" ", s)
    lines = [ln.strip() for ln in s.split("\n")]
    s = "\n".join(lines)
    s = _MANY_NL_RE.sub("\n\n", s).strip()
    return s
