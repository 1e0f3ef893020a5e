"""Span-preserving word tokenizer used for answer string matching.

Equivalent of the DrQA SimpleTokenizer/Tokens machinery the reference vendors
(/root/reference/qa/basic_tokenizer.py:12-271): tokens keep their [start, end)
character spans and trailing whitespace so matched token ranges can be
projected back to the original string (`untokenize`). Uses the `regex` module
for unicode property classes, with an `re`-based approximation as fallback.
"""
from __future__ import annotations

from dataclasses import dataclass

try:
    import regex as _re

    _ALPHA_NUM = r"[\p{L}\p{N}\p{M}]+"
    _NON_WS = r"[^\p{Z}\p{C}]"
    _PATTERN = _re.compile(
        f"({_ALPHA_NUM})|({_NON_WS})",
        flags=_re.IGNORECASE + _re.UNICODE + _re.MULTILINE,
    )
except ImportError:  # pragma: no cover - regex is present in the image
    import re as _re

    _PATTERN = _re.compile(r"(\w+)|([^\w\s])", flags=_re.UNICODE | _re.MULTILINE)


@dataclass(frozen=True)
class _Tok:
    text: str
    text_ws: str  # token text plus trailing whitespace up to the next token
    span: tuple[int, int]


class Tokens:
    """A tokenized string supporting slicing and lossless de-tokenization."""

    def __init__(self, toks: list[_Tok]):
        self._toks = toks

    def __len__(self) -> int:
        return len(self._toks)

    def words(self, uncased: bool = False) -> list[str]:
        if uncased:
            return [t.text.lower() for t in self._toks]
        return [t.text for t in self._toks]

    def offsets(self) -> list[tuple[int, int]]:
        return [t.span for t in self._toks]

    def slice(self, i: int | None = None, j: int | None = None) -> "Tokens":
        return Tokens(self._toks[i:j])

    def untokenize(self) -> str:
        return "".join(t.text_ws for t in self._toks).strip()


class SimpleTokenizer:
    def tokenize(self, text: str) -> Tokens:
        matches = list(_PATTERN.finditer(text))
        toks = []
        for i, m in enumerate(matches):
            start, end = m.span()
            ws_end = matches[i + 1].span()[0] if i + 1 < len(matches) else end
            toks.append(_Tok(m.group(), text[start:ws_end], (start, end)))
        return Tokens(toks)

    def shutdown(self):  # kept for pool-Finalize API compatibility
        pass
