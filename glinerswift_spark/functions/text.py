"""Pure text functions: word splitting with char offsets, normalization.

Word-split regex mirrors the reference's GLiNER default splitter
(ref Tokenization/WordSplitter.swift:14): ``\\w+(?:[-_]\\w+)*|\\S`` —
word characters optionally joined by '-'/'_', else any single
non-whitespace char. Char offsets index the ORIGINAL string (golden
entity offsets are into the raw text, ref SpanHead/SpanDecoder.swift:56-60).

Normalization (NFKC + whitespace collapse incl. U+3000/U+FEFF) mirrors
ref Tokenization/SentencePieceUnigram.swift:68-73,176-196. In the
reference it feeds the subword tokenizer only; entity offsets always use
the raw text. We additionally use it for the deterministic html->text
extraction stage ([NORTH-RULE] byte-identical text per url).
"""

from __future__ import annotations

import re
import unicodedata

WORD_RE = re.compile(r"\w+(?:[-_]\w+)*|\S")

_WS_RE = re.compile(r"[\s　﻿]+")


def word_tokens(text: str) -> list[tuple[str, int, int]]:
    """Split ``text`` into (word, start, end) with char offsets."""
    return [(m.group(0), m.start(), m.end()) for m in WORD_RE.finditer(text)]


def word_spans(text: str) -> list[tuple[int, int]]:
    """Char (start, end) of each word."""
    return [(m.start(), m.end()) for m in WORD_RE.finditer(text)]


def count_words(text: str) -> int:
    if not text:
        return 0
    return sum(1 for _ in WORD_RE.finditer(text))


def normalize_text(text: str) -> str:
    """NFKC normalize and collapse all whitespace runs to a single space.

    Deterministic and pinned by goldens (tests/test_text.py) because the
    north rule requires byte-identical extracted text per url.
    """
    if not text:
        return ""
    normalized = unicodedata.normalize("NFKC", text)
    return _WS_RE.sub(" ", normalized).strip()


_TAG_RE = re.compile(rb"<script\b.*?</script\s*>|<style\b.*?</style\s*>", re.S | re.I)
_MARKUP_RE = re.compile(rb"<[^>]*>")


def extract_text_from_html(html: bytes) -> str:
    """[NORTH-RULE, no ref] deterministic html(binary) -> text(string).

    Pure-function semantics (pinned by goldens): strip <script>/<style>
    blocks, strip tags, decode as UTF-8 with replacement, unescape the five
    predefined XML entities, NFKC-normalize, collapse whitespace. No
    library dependence so the bytes->text mapping can never drift.
    """
    if html is None:
        return ""
    if isinstance(html, memoryview):
        html = html.tobytes()
    stripped = _MARKUP_RE.sub(b" ", _TAG_RE.sub(b" ", html))
    text = stripped.decode("utf-8", errors="replace")
    for ent, ch in (
        ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'), ("&apos;", "'"), ("&amp;", "&"),
    ):
        text = text.replace(ent, ch)
    return normalize_text(text)
