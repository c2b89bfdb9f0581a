"""AST node model for the security layer's SQL IR.

This is our analogue of the Calcite ``SqlNode`` tree the reference mutates
(``visitor/basic/AbstractBasicVisitor.java``, ``SecurityContext.java:172-178``).
Nodes are plain mutable dataclasses; printing is deterministic, precedence-aware
Spark SQL (keywords uppercase, identifiers backtick-quoted only when needed).
"""

from __future__ import annotations

import dataclasses
import re
from dataclasses import dataclass, field
from typing import Iterator, Optional, Union

_BARE_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def quote_ident(name: str) -> str:
    if _BARE_IDENT.match(name):
        return name
    return "`" + name.replace("`", "``") + "`"


def quote_string(value: str) -> str:
    return "'" + value.replace("'", "''") + "'"


class Node:
    """Base AST node: generic child iteration + deep SQL printing."""

    def children(self) -> Iterator["Node"]:
        for f in dataclasses.fields(self):  # type: ignore[arg-type]
            v = getattr(self, f.name)
            if isinstance(v, Node):
                yield v
            elif isinstance(v, (list, tuple)):
                for item in v:
                    if isinstance(item, Node):
                        yield item
                    elif isinstance(item, (list, tuple)):
                        for sub in item:
                            if isinstance(sub, Node):
                                yield sub

    def walk(self) -> Iterator["Node"]:
        yield self
        for c in self.children():
            yield from c.walk()

    def sql(self) -> str:
        raise NotImplementedError

    def __str__(self) -> str:
        return self.sql()


# --------------------------------------------------------------------------
# Expressions
# --------------------------------------------------------------------------

class Expr(Node):
    precedence = 99  # atoms never need parens

    def _child_sql(self, child: "Expr", allow_equal: bool = True) -> str:
        s = child.sql()
        cp = getattr(child, "precedence", 99)
        if cp < self.precedence or (cp == self.precedence and not allow_equal):
            return f"({s})"
        return s


@dataclass
class Literal(Expr):
    value: object          # python value for string/bool/None; raw text for numbers
    kind: str              # 'string' | 'number' | 'bool' | 'null'

    def sql(self) -> str:
        if self.kind == "string":
            return quote_string(str(self.value))
        if self.kind == "null":
            return "NULL"
        if self.kind == "bool":
            return "TRUE" if self.value else "FALSE"
        return str(self.value)

    @staticmethod
    def string(v: str) -> "Literal":
        return Literal(v, "string")

    @staticmethod
    def number(v: Union[int, float, str]) -> "Literal":
        return Literal(str(v), "number")

    @staticmethod
    def null() -> "Literal":
        return Literal(None, "null")

    @staticmethod
    def bool_(v: bool) -> "Literal":
        return Literal(v, "bool")


@dataclass
class Identifier(Expr):
    """Possibly-qualified name: column ``a``, ``t.a``, table ``cat.db.t``."""
    parts: list[str]

    def sql(self) -> str:
        return ".".join(quote_ident(p) for p in self.parts)

    @property
    def name(self) -> str:
        return self.parts[-1]

    @property
    def qualifier(self) -> list[str]:
        return self.parts[:-1]


@dataclass
class Star(Expr):
    qualifier: list[str] = field(default_factory=list)  # for t.*

    def sql(self) -> str:
        if self.qualifier:
            return ".".join(quote_ident(p) for p in self.qualifier) + ".*"
        return "*"


@dataclass
class FuncCall(Expr):
    name: str
    args: list[Expr] = field(default_factory=list)
    distinct: bool = False
    over: Optional["WindowSpec"] = None

    def sql(self) -> str:
        inner = ", ".join(a.sql() for a in self.args)
        if self.distinct:
            inner = "DISTINCT " + inner
        s = f"{self.name}({inner})"
        if self.over is not None:
            s += f" OVER ({self.over.sql()})"
        return s


@dataclass
class WindowSpec(Node):
    partition_by: list[Expr] = field(default_factory=list)
    order_by: list["OrderItem"] = field(default_factory=list)
    frame: Optional[str] = None  # raw frame text, e.g. "ROWS BETWEEN ..."

    def sql(self) -> str:
        parts = []
        if self.partition_by:
            parts.append("PARTITION BY " + ", ".join(e.sql() for e in self.partition_by))
        if self.order_by:
            parts.append("ORDER BY " + ", ".join(o.sql() for o in self.order_by))
        if self.frame:
            parts.append(self.frame)
        return " ".join(parts)


@dataclass
class Cast(Expr):
    this: Expr
    to_type: str
    try_: bool = False

    def sql(self) -> str:
        kw = "TRY_CAST" if self.try_ else "CAST"
        return f"{kw}({self.this.sql()} AS {self.to_type})"


_PRECEDENCE = {
    "OR": 1,
    "AND": 2,
    "=": 4, "==": 4, "!=": 4, "<>": 4, "<": 4, "<=": 4, ">": 4, ">=": 4, "<=>": 4,
    "||": 5, "+": 5, "-": 5,
    "*": 6, "/": 6, "%": 6,
}
_ASSOCIATIVE = {"AND", "OR", "+", "*", "||"}


@dataclass
class BinaryOp(Expr):
    op: str
    left: Expr
    right: Expr

    def __post_init__(self) -> None:
        self.precedence = _PRECEDENCE.get(self.op.upper(), 4)

    def sql(self) -> str:
        op = self.op.upper() if self.op.upper() in ("AND", "OR") else self.op
        same_ok = op in _ASSOCIATIVE
        left = self._child_sql(self.left, allow_equal=True)
        right = self._child_sql(self.right, allow_equal=same_ok)
        return f"{left} {op} {right}"


@dataclass
class UnaryOp(Expr):
    op: str  # 'NOT' | '-' | '+' | '~'
    this: Expr

    def __post_init__(self) -> None:
        self.precedence = 3 if self.op.upper() == "NOT" else 7

    def sql(self) -> str:
        op = self.op.upper()
        inner = self._child_sql(self.this)
        if op == "NOT":
            return f"NOT {inner}"
        return f"{op}{inner}"


@dataclass
class IsNull(Expr):
    this: Expr
    negated: bool = False
    precedence = 4

    def sql(self) -> str:
        return f"{self._child_sql(self.this)} IS {'NOT ' if self.negated else ''}NULL"


@dataclass
class InList(Expr):
    this: Expr
    items: list[Expr]
    negated: bool = False
    precedence = 4

    def sql(self) -> str:
        items = ", ".join(i.sql() for i in self.items)
        return f"{self._child_sql(self.this)} {'NOT ' if self.negated else ''}IN ({items})"


@dataclass
class InSubquery(Expr):
    this: Expr
    query: "Query"
    negated: bool = False
    precedence = 4

    def sql(self) -> str:
        return f"{self._child_sql(self.this)} {'NOT ' if self.negated else ''}IN ({self.query.sql()})"


@dataclass
class Between(Expr):
    this: Expr
    low: Expr
    high: Expr
    negated: bool = False
    precedence = 4

    def sql(self) -> str:
        return (
            f"{self._child_sql(self.this)} {'NOT ' if self.negated else ''}BETWEEN "
            f"{self._child_sql(self.low)} AND {self._child_sql(self.high)}"
        )


@dataclass
class Like(Expr):
    this: Expr
    pattern: Expr
    negated: bool = False
    op: str = "LIKE"  # LIKE | RLIKE | ILIKE
    precedence = 4

    def sql(self) -> str:
        return (
            f"{self._child_sql(self.this)} {'NOT ' if self.negated else ''}{self.op} "
            f"{self._child_sql(self.pattern)}"
        )


@dataclass
class Case(Expr):
    operand: Optional[Expr]
    whens: list[tuple[Expr, Expr]]
    else_: Optional[Expr] = None

    def sql(self) -> str:
        parts = ["CASE"]
        if self.operand is not None:
            parts.append(self.operand.sql())
        for cond, res in self.whens:
            parts.append(f"WHEN {cond.sql()} THEN {res.sql()}")
        if self.else_ is not None:
            parts.append(f"ELSE {self.else_.sql()}")
        parts.append("END")
        return " ".join(parts)


@dataclass
class Exists(Expr):
    query: "Query"
    negated: bool = False

    def sql(self) -> str:
        return f"{'NOT ' if self.negated else ''}EXISTS ({self.query.sql()})"


@dataclass
class ScalarSubquery(Expr):
    query: "Query"

    def sql(self) -> str:
        return f"({self.query.sql()})"


@dataclass
class Lambda(Expr):
    params: list[str]
    body: Expr

    def sql(self) -> str:
        head = self.params[0] if len(self.params) == 1 else "(" + ", ".join(self.params) + ")"
        return f"{head} -> {self.body.sql()}"


@dataclass
class IntervalLiteral(Expr):
    text: str  # raw, e.g. "INTERVAL '3' DAY"

    def sql(self) -> str:
        return self.text


@dataclass
class Subscript(Expr):
    this: Expr
    index: Expr

    def sql(self) -> str:
        return f"{self._child_sql(self.this)}[{self.index.sql()}]"


@dataclass
class Alias(Expr):
    """Projection item ``expr AS name``."""
    this: Expr
    alias: str

    def sql(self) -> str:
        return f"{self.this.sql()} AS {quote_ident(self.alias)}"


# --------------------------------------------------------------------------
# Relations
# --------------------------------------------------------------------------

class Relation(Node):
    alias: Optional[str]


@dataclass
class TableRef(Relation):
    parts: list[str]
    alias: Optional[str] = None

    def sql(self) -> str:
        s = ".".join(quote_ident(p) for p in self.parts)
        if self.alias:
            s += f" AS {quote_ident(self.alias)}"
        return s

    @property
    def name(self) -> str:
        return self.parts[-1]

    def effective_alias(self) -> str:
        return self.alias or self.parts[-1]


@dataclass
class SubqueryRef(Relation):
    query: "Query"
    alias: Optional[str] = None

    def sql(self) -> str:
        s = f"({self.query.sql()})"
        if self.alias:
            s += f" AS {quote_ident(self.alias)}"
        return s


@dataclass
class Join(Relation):
    left: Relation
    right: Relation
    join_type: str = "INNER"  # INNER | LEFT | RIGHT | FULL | CROSS | LEFT SEMI | LEFT ANTI
    on: Optional[Expr] = None
    using: list[str] = field(default_factory=list)
    alias: Optional[str] = None  # unused; joins aren't aliased

    def sql(self) -> str:
        jt = self.join_type.upper()
        kw = "JOIN" if jt == "INNER" else f"{jt} JOIN"
        s = f"{self.left.sql()} {kw} {self.right.sql()}"
        if self.on is not None:
            s += f" ON {self.on.sql()}"
        elif self.using:
            s += " USING (" + ", ".join(quote_ident(c) for c in self.using) + ")"
        return s


@dataclass
class LateralView(Relation):
    """LATERAL VIEW [OUTER] explode(...) t AS c1, c2 — Spark/Hive extension."""
    base: Relation
    func: FuncCall
    table_alias: str
    column_aliases: list[str] = field(default_factory=list)
    outer: bool = False
    alias: Optional[str] = None

    def sql(self) -> str:
        s = f"{self.base.sql()} LATERAL VIEW "
        if self.outer:
            s += "OUTER "
        s += f"{self.func.sql()} {quote_ident(self.table_alias)}"
        if self.column_aliases:
            s += " AS " + ", ".join(quote_ident(c) for c in self.column_aliases)
        return s


# --------------------------------------------------------------------------
# Queries / statements
# --------------------------------------------------------------------------

class Query(Node):
    pass


@dataclass
class OrderItem(Node):
    this: Expr
    desc: bool = False
    nulls: Optional[str] = None  # 'FIRST' | 'LAST'

    def sql(self) -> str:
        s = self.this.sql()
        if self.desc:
            s += " DESC"
        if self.nulls:
            s += f" NULLS {self.nulls}"
        return s


@dataclass
class Select(Query):
    projections: list[Expr] = field(default_factory=list)
    from_: Optional[Relation] = None
    where: Optional[Expr] = None
    group_by: list[Expr] = field(default_factory=list)
    group_modifier: Optional[str] = None  # 'ROLLUP' | 'CUBE' | raw GROUPING SETS text
    having: Optional[Expr] = None
    order_by: list[OrderItem] = field(default_factory=list)
    limit: Optional[int] = None
    distinct: bool = False

    def sql(self) -> str:
        parts = ["SELECT"]
        if self.distinct:
            parts.append("DISTINCT")
        parts.append(", ".join(p.sql() for p in self.projections))
        if self.from_ is not None:
            parts.append("FROM " + self.from_.sql())
        if self.where is not None:
            parts.append("WHERE " + self.where.sql())
        if self.group_by or self.group_modifier:
            cols = ", ".join(e.sql() for e in self.group_by)
            if self.group_modifier in ("ROLLUP", "CUBE"):
                parts.append(f"GROUP BY {self.group_modifier}({cols})")
            elif self.group_modifier:  # raw GROUPING SETS text (group_by is
                parts.append(f"GROUP BY {self.group_modifier}")  # empty then)
            else:
                parts.append("GROUP BY " + cols)
        if self.having is not None:
            parts.append("HAVING " + self.having.sql())
        if self.order_by:
            parts.append("ORDER BY " + ", ".join(o.sql() for o in self.order_by))
        if self.limit is not None:
            parts.append(f"LIMIT {self.limit}")
        return " ".join(parts)


@dataclass
class SetOp(Query):
    op: str  # UNION | INTERSECT | EXCEPT
    left: Query
    right: Query
    all: bool = False
    order_by: list[OrderItem] = field(default_factory=list)
    limit: Optional[int] = None

    def sql(self) -> str:
        s = f"{self.left.sql()} {self.op}{' ALL' if self.all else ''} {self.right.sql()}"
        if self.order_by:
            s += " ORDER BY " + ", ".join(o.sql() for o in self.order_by)
        if self.limit is not None:
            s += f" LIMIT {self.limit}"
        return s


@dataclass
class With(Query):
    ctes: list[tuple[str, Query]]
    body: Query

    def sql(self) -> str:
        ctes = ", ".join(f"{quote_ident(n)} AS ({q.sql()})" for n, q in self.ctes)
        return f"WITH {ctes} {self.body.sql()}"


@dataclass
class Insert(Node):
    table: list[str]
    query: Query
    columns: list[str] = field(default_factory=list)
    overwrite: bool = False

    def sql(self) -> str:
        kw = "INSERT OVERWRITE TABLE" if self.overwrite else "INSERT INTO"
        s = f"{kw} " + ".".join(quote_ident(p) for p in self.table)
        if self.columns:
            s += " (" + ", ".join(quote_ident(c) for c in self.columns) + ")"
        return s + " " + self.query.sql()


def and_(left: Optional[Expr], right: Expr) -> Expr:
    """``new_where = old_where AND filter`` with precedence-preserving print.

    Mirrors ``RowFilterVisitor.buildWhereClause`` (RowFilterVisitor.java:111-125):
    an OR-rooted old WHERE is parenthesized automatically by precedence printing.
    """
    if left is None:
        return right
    return BinaryOp("AND", left, right)
