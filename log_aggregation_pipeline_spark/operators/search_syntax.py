"""Lucene-like query syntax -> Catalyst Column (SURVEY.md F4).

The reference *documents* queries like ``level:ERROR AND service:api``
(/root/reference/README.md:221-224, blueprint.md:340-345 and the alert
configs at configs/server.yaml:48-62) but ships no parser — searches
are raw substrings.  This implements the declared surface:

    grammar:  expr   := or
              or     := and (OR and)*
              and    := not ((AND)? not)*        # juxtaposition = AND
              not    := NOT not | atom
              atom   := '(' expr ')'
                      | field ':' '[' lit TO lit ']'     # inclusive range
                      | field ':' value                  # equality
                      | term                             # substring in text

Bare terms search the text column case-insensitively (the reference's
F2 behavior); ``field:value`` is equality; ranges are closed (matching
the reference's closed TimeRange, common.go:53-55).  Quoted strings
allow spaces.  The output is a single Column expression, so the whole
predicate participates in pushdown/pruning like any hand-written
filter.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_TOKEN = re.compile(
    r"""\s*(?:
        (?P<lparen>\() | (?P<rparen>\)) |
        (?P<lbrack>\[) | (?P<rbrack>\]) |
        (?P<colon>:) |
        (?P<quoted>"[^"]*") |
        (?P<word>[^\s():\[\]"]+)
    )""",
    re.VERBOSE,
)


class QuerySyntaxError(ValueError):
    pass


def _tokenize(s: str) -> list[str]:
    out, pos = [], 0
    while pos < len(s):
        m = _TOKEN.match(s, pos)
        if not m or m.end() == pos:
            if s[pos:].strip():
                raise QuerySyntaxError(f"cannot tokenize at: {s[pos:]!r}")
            break
        pos = m.end()
        tok = m.group(0).strip()
        if tok:
            out.append(tok)
    return out


class _Parser:
    def __init__(self, tokens: list[str], text_col: str):
        self.toks = tokens
        self.i = 0
        self.text_col = text_col

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def take(self) -> str:
        tok = self.peek()
        if tok is None:
            raise QuerySyntaxError("unexpected end of query")
        self.i += 1
        return tok

    def parse(self) -> Column:
        col = self.or_expr()
        if self.peek() is not None:
            raise QuerySyntaxError(f"trailing input at token {self.peek()!r}")
        return col

    def or_expr(self) -> Column:
        col = self.and_expr()
        while self.peek() is not None and self.peek().upper() == "OR":
            self.take()
            col = col | self.and_expr()
        return col

    def and_expr(self) -> Column:
        col = self.not_expr()
        while True:
            nxt = self.peek()
            if nxt is None or nxt.upper() == "OR" or nxt == ")":
                return col
            if nxt.upper() == "AND":
                self.take()
                nxt = self.peek()
                if nxt is None:
                    raise QuerySyntaxError("AND without right operand")
            col = col & self.not_expr()

    def not_expr(self) -> Column:
        if self.peek() is not None and self.peek().upper() == "NOT":
            self.take()
            return ~self.not_expr()
        return self.atom()

    def atom(self) -> Column:
        tok = self.take()
        if tok == "(":
            col = self.or_expr()
            if self.take() != ")":
                raise QuerySyntaxError("expected ')'")
            return col
        if tok in (":", "[", "]", ")"):
            raise QuerySyntaxError(f"unexpected {tok!r}")
        value = _unquote(tok)
        if self.peek() == ":":
            self.take()
            return self._field_predicate(field=value)
        # bare term: ci substring over the text column (F2 semantics)
        return F.contains(F.lower(F.col(self.text_col)), F.lit(value.lower()))

    def _field_predicate(self, field: str) -> Column:
        if self.peek() == "[":
            self.take()
            lo = _unquote(self.take())
            if self.take().upper() != "TO":
                raise QuerySyntaxError("range must be [lo TO hi]")
            hi = _unquote(self.take())
            if self.take() != "]":
                raise QuerySyntaxError("expected ']'")
            return F.col(field).between(F.lit(lo), F.lit(hi))
        return F.col(field) == F.lit(_unquote(self.take()))


def _unquote(tok: str) -> str:
    return tok[1:-1] if len(tok) >= 2 and tok[0] == '"' and tok[-1] == '"' else tok


def compile_query(query: str, text_col: str = "text") -> Column:
    """``'level:ERROR AND (role:user OR code=E1*...)'`` -> Column.

    Empty/blank query matches everything (store.go:362: empty query
    matches all)."""
    tokens = _tokenize(query)
    if not tokens:
        return F.lit(True)
    return _Parser(tokens, text_col).parse()
