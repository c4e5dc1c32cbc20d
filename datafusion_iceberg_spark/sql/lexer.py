"""SQL tokenizer with source spans.

Produces the token stream the recursive-descent parser walks.  Every
token records its ``[start, end)`` offsets in the ORIGINAL text, so the
parser can hand any grammatical slot (a WHERE predicate, a SET value, a
CTAS body) back to Spark as the verbatim source slice — no re-printing,
no lost formatting, and string literals / comments can never be
mistaken for keywords (the failure class a regex layer carries).

Lexical rules follow Spark SQL: ``'...'`` and ``"..."`` string literals
with doubled-quote and backslash escapes, backtick-quoted identifiers
with doubled-backtick escape, ``--`` line comments, nested ``/* */``
block comments, numbers (ints, decimals, exponents, trailing type
suffix letters like ``1.5d`` / ``10L``), and multi-char operators
(``<=``, ``>=``, ``<>``, ``!=``, ``||``, ``=>``, ``::``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

# token kinds
IDENT = "ident"      # bare identifier / keyword (value = as written)
QIDENT = "qident"    # backtick-quoted identifier (value = unquoted)
STRING = "string"    # string literal (value = decoded)
NUMBER = "number"    # numeric literal (value = as written)
OP = "op"            # operator / punctuation
EOF = "eof"

_MULTI_OPS = ("<=>", "<=", ">=", "<>", "!=", "==", "||", "=>", "::", "->")
_SINGLE_OPS = set("+-*/%<>=!(),.;:[]{}&|^~?@#$")


class LexError(ValueError):
    """Raised on an unterminated string/comment or an unlexable byte."""


@dataclass(frozen=True)
class Token:
    kind: str
    value: str
    start: int
    end: int

    def upper(self) -> str:
        return self.value.upper()

    def is_kw(self, *words: str) -> bool:
        return self.kind == IDENT and self.value.upper() in words


def tokenize(text: str) -> list[Token]:
    """Tokenize ``text``; comments and whitespace are skipped (spans in
    the surviving tokens still index the original text).  Always ends
    with one EOF token."""
    toks: list[Token] = []
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c.isspace():
            i += 1
            continue
        if c == "-" and text.startswith("--", i):
            j = text.find("\n", i)
            i = n if j == -1 else j + 1
            continue
        if c == "/" and text.startswith("/*", i):
            depth, j = 1, i + 2
            while j < n and depth:
                if text.startswith("/*", j):
                    depth += 1
                    j += 2
                elif text.startswith("*/", j):
                    depth -= 1
                    j += 2
                else:
                    j += 1
            if depth:
                raise LexError(f"unterminated block comment at offset {i}")
            i = j
            continue
        if c in ("'", '"'):
            j = i + 1
            buf: list[str] = []
            while j < n:
                d = text[j]
                if d == "\\" and j + 1 < n:
                    buf.append(text[j + 1])
                    j += 2
                    continue
                if d == c:
                    if j + 1 < n and text[j + 1] == c:  # doubled quote
                        buf.append(c)
                        j += 2
                        continue
                    break
                buf.append(d)
                j += 1
            else:
                raise LexError(f"unterminated string literal at offset {i}")
            if j >= n:
                raise LexError(f"unterminated string literal at offset {i}")
            toks.append(Token(STRING, "".join(buf), i, j + 1))
            i = j + 1
            continue
        if c == "`":
            j = i + 1
            buf = []
            while j < n:
                if text[j] == "`":
                    if j + 1 < n and text[j + 1] == "`":
                        buf.append("`")
                        j += 2
                        continue
                    break
                buf.append(text[j])
                j += 1
            else:
                raise LexError(f"unterminated quoted identifier at offset {i}")
            if j >= n:
                raise LexError(f"unterminated quoted identifier at offset {i}")
            toks.append(Token(QIDENT, "".join(buf), i, j + 1))
            i = j + 1
            continue
        if c.isdigit() or (
            c == "." and i + 1 < n and text[i + 1].isdigit()
        ):
            j = i
            while j < n and text[j].isdigit():
                j += 1
            if j < n and text[j] == ".":
                j += 1
                while j < n and text[j].isdigit():
                    j += 1
            if j < n and text[j] in "eE":
                k = j + 1
                if k < n and text[k] in "+-":
                    k += 1
                if k < n and text[k].isdigit():
                    j = k
                    while j < n and text[j].isdigit():
                        j += 1
            # Spark type-suffix letters (1L, 2.5D, 3.14f, 7S, 9Y, 1bd)
            if j < n and text[j].isalpha():
                k = j
                while k < n and text[k].isalpha():
                    k += 1
                if k - j <= 2 and (k >= n or not (text[k].isalnum() or text[k] == "_")):
                    j = k
            toks.append(Token(NUMBER, text[i:j], i, j))
            i = j
            continue
        if c.isalpha() or c == "_":
            j = i + 1
            while j < n and (text[j].isalnum() or text[j] == "_"):
                j += 1
            toks.append(Token(IDENT, text[i:j], i, j))
            i = j
            continue
        matched: Optional[str] = None
        for op in _MULTI_OPS:
            if text.startswith(op, i):
                matched = op
                break
        if matched is not None:
            toks.append(Token(OP, matched, i, i + len(matched)))
            i += len(matched)
            continue
        if c in _SINGLE_OPS:
            toks.append(Token(OP, c, i, i + 1))
            i += 1
            continue
        raise LexError(f"unexpected character {c!r} at offset {i}")
    toks.append(Token(EOF, "", n, n))
    return toks
