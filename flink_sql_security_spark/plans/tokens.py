"""SQL tokenizer for the Spark-SQL dialect subset used by the security layer.

Replaces the Calcite parser front-end of the reference
(``extensions/.../ParserImplExtension.java:67-76``) with a dependency-free
tokenizer feeding the recursive-descent parser in ``parser.py``.
"""

from __future__ import annotations

from dataclasses import dataclass

# Token kinds
WORD = "WORD"            # bare identifier or keyword (case-insensitive)
QIDENT = "QIDENT"        # `backtick` or "double-quoted" identifier
STRING = "STRING"        # 'single-quoted' string literal (value is unescaped)
NUMBER = "NUMBER"        # numeric literal, kept verbatim as text
OP = "OP"                # punctuation / operator
EOF = "EOF"

_MULTI_CHAR_OPS = ("<=>", "<>", "!=", ">=", "<=", "==", "||", "::", "->")
_SINGLE_CHAR_OPS = set("(),.+-*/%<>=[]{}&|^~?:;")


class SqlTokenizeError(ValueError):
    pass


@dataclass(frozen=True)
class Token:
    kind: str
    value: str
    pos: int

    def upper(self) -> str:
        return self.value.upper()


def tokenize(sql: str) -> list[Token]:
    out: list[Token] = []
    i, n = 0, len(sql)
    while i < n:
        c = sql[i]
        if c.isspace():
            i += 1
            continue
        # -- line comment
        if c == "-" and i + 1 < n and sql[i + 1] == "-":
            j = sql.find("\n", i)
            i = n if j < 0 else j + 1
            continue
        # /* block comment */
        if c == "/" and i + 1 < n and sql[i + 1] == "*":
            j = sql.find("*/", i + 2)
            if j < 0:
                raise SqlTokenizeError(f"unterminated block comment at {i}")
            i = j + 2
            continue
        # string literal, '' escapes a quote
        if c == "'":
            j = i + 1
            buf: list[str] = []
            while True:
                if j >= n:
                    raise SqlTokenizeError(f"unterminated string literal at {i}")
                if sql[j] == "'":
                    if j + 1 < n and sql[j + 1] == "'":
                        buf.append("'")
                        j += 2
                        continue
                    break
                buf.append(sql[j])
                j += 1
            out.append(Token(STRING, "".join(buf), i))
            i = j + 1
            continue
        # quoted identifiers: `a b` (`` escape) or "a b"
        if c in ("`", '"'):
            q = c
            j = i + 1
            buf = []
            while True:
                if j >= n:
                    raise SqlTokenizeError(f"unterminated quoted identifier at {i}")
                if sql[j] == q:
                    if j + 1 < n and sql[j + 1] == q:
                        buf.append(q)
                        j += 2
                        continue
                    break
                buf.append(sql[j])
                j += 1
            out.append(Token(QIDENT, "".join(buf), i))
            i = j + 1
            continue
        # number: digits, optional fraction/exponent; also .5 style
        if c.isdigit() or (c == "." and i + 1 < n and sql[i + 1].isdigit()):
            j = i
            while j < n and sql[j].isdigit():
                j += 1
            if j < n and sql[j] == ".":
                j += 1
                while j < n and sql[j].isdigit():
                    j += 1
            if j < n and sql[j] in "eE":
                k = j + 1
                if k < n and sql[k] in "+-":
                    k += 1
                if k < n and sql[k].isdigit():
                    j = k
                    while j < n and sql[j].isdigit():
                        j += 1
            # trailing type suffix (1L, 2.5D, 3S, 4Y, 10BD) — Spark literals
            if j < n and sql[j].isalpha():
                k = j
                while k < n and sql[k].isalpha():
                    k += 1
                suffix = sql[j:k].upper()
                if suffix in ("L", "S", "Y", "D", "F", "BD") and (
                    k >= n or not (sql[k].isalnum() or sql[k] == "_")
                ):
                    j = k
            out.append(Token(NUMBER, sql[i:j], i))
            i = j
            continue
        # word: identifier or keyword
        if c.isalpha() or c == "_" or c == "$":
            j = i
            while j < n and (sql[j].isalnum() or sql[j] in "_$"):
                j += 1
            out.append(Token(WORD, sql[i:j], i))
            i = j
            continue
        # multi-char operators first
        matched = False
        for op in _MULTI_CHAR_OPS:
            if sql.startswith(op, i):
                out.append(Token(OP, op, i))
                i += len(op)
                matched = True
                break
        if matched:
            continue
        if c in _SINGLE_CHAR_OPS:
            out.append(Token(OP, c, i))
            i += 1
            continue
        raise SqlTokenizeError(f"unexpected character {c!r} at {i}")
    out.append(Token(EOF, "", n))
    return out
