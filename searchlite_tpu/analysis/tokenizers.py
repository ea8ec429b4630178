"""Tokenizers: ``default``, ``unicode``, ``whitespace``.

Behavioral parity with the reference (searchlite-core
`analysis/tokenizer.rs:7-54`):

- ``default``: split on non-alphanumeric chars, ASCII-lowercase the rest.
- ``unicode``: NFKC normalize, split into words (UAX#29-style), lowercase.
- ``whitespace``: split on unicode whitespace, no normalization.

Tokens carry a position (index of the token in the stream), used for
phrase queries.
"""

from __future__ import annotations

import re
import unicodedata
from dataclasses import dataclass


@dataclass
class Token:
    text: str
    position: int


def default_tokenize(text: str) -> list[Token]:
    tokens: list[Token] = []
    current: list[str] = []
    position = 0
    for ch in text:
        if ch.isalnum():
            # ASCII-lowercase only, matching the reference's
            # `to_ascii_lowercase` (non-ASCII kept as-is).
            o = ord(ch)
            current.append(chr(o + 32) if 65 <= o <= 90 else ch)
        elif current:
            tokens.append(Token("".join(current), position))
            current = []
            position += 1
    if current:
        tokens.append(Token("".join(current), position))
    return tokens


# Word-like runs: alphanumerics (unicode), allowing a single apostrophe
# between letters (UAX#29 MidLetter behavior, e.g. "can't" is one word).
_UNICODE_WORD_RE = re.compile(r"[^\W_]+(?:['’][^\W_]+)*", re.UNICODE)


def unicode_tokenize(text: str) -> list[Token]:
    normalized = unicodedata.normalize("NFKC", text)
    return [
        Token(m.group(0).lower(), idx)
        for idx, m in enumerate(_UNICODE_WORD_RE.finditer(normalized))
    ]


def whitespace_tokenize(text: str) -> list[Token]:
    return [Token(word, idx) for idx, word in enumerate(text.split())]


TOKENIZERS = {
    "default": default_tokenize,
    "unicode": unicode_tokenize,
    "whitespace": whitespace_tokenize,
}
