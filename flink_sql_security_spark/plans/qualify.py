"""Qualification pass — our analogue of the reference's validate step.

The reference validates via Flink/Calcite (``ParserImplExtension.java:85-89``),
which (1) expands ``SELECT *`` to the full column list, (2) auto-aliases bare
table refs, and (3) qualifies column refs with their table alias (observable in
every golden, e.g. ``RewriteRowFilterTest.java:485-501``). This pass reproduces
those three behaviors against a pluggable schema provider.

Deviation (documented): the reference also expands table paths to
``hive.default.orders``. We keep paths as written because Spark temp views do
not live under ``spark_catalog.default`` — expanding would break view-backed
tables. Aliasing (the semantically load-bearing part) is identical.
"""

from __future__ import annotations

from typing import Callable, Optional

from .nodes import (
    Alias, Expr, FuncCall, Identifier, Insert, Join, Lambda, LateralView, Node,
    Query, Relation, Select, SetOp, Star, SubqueryRef, TableRef, With,
)

# Maps a table path (as written, e.g. ["orders"] or ["db", "t"]) to an ordered
# [(column_name, type_ddl_string)] list, or None if unknown.
SchemaProvider = Callable[[list[str]], Optional[list[tuple[str, str]]]]


class _Scope:
    def __init__(self, parent: Optional["_Scope"] = None) -> None:
        self.parent = parent
        # alias → ordered column names (None if schema unknown)
        self.sources: dict[str, Optional[list[str]]] = {}
        self.cte_columns: dict[str, Optional[list[str]]] = dict(
            parent.cte_columns if parent else {}
        )

    def add(self, alias: str, columns: Optional[list[str]]) -> None:
        self.sources[alias.lower()] = columns

    def resolve_column(self, name: str) -> Optional[str]:
        """Return the unique source alias owning ``name``, else None."""
        owners = [
            a for a, cols in self.sources.items()
            if cols is not None and name.lower() in (c.lower() for c in cols)
        ]
        if len(owners) == 1:
            return owners[0]
        return None

    def has_alias(self, alias: str) -> bool:
        return alias.lower() in self.sources


def qualify(node: Node, schema_provider: SchemaProvider) -> Node:
    """Qualify a statement in place; returns the same node for chaining."""
    if isinstance(node, Insert):
        _qualify_query(node.query, schema_provider, _Scope())
    elif isinstance(node, Query):
        _qualify_query(node, schema_provider, _Scope())
    return node


def output_columns(q: Query, schema_provider: SchemaProvider,
                   scope: Optional[_Scope] = None) -> Optional[list[str]]:
    """Best-effort output column names of a query (for derived-table scopes)."""
    if isinstance(q, With):
        inner = _Scope(scope)
        for name, cte in q.ctes:
            inner.cte_columns[name.lower()] = output_columns(cte, schema_provider, inner)
        return output_columns(q.body, schema_provider, inner)
    if isinstance(q, SetOp):
        return output_columns(q.left, schema_provider, scope)
    if not isinstance(q, Select):
        return None
    cols: list[str] = []
    local = _collect_scope(q.from_, schema_provider, _Scope(scope)) if q.from_ else _Scope(scope)
    for p in q.projections:
        if isinstance(p, Alias):
            cols.append(p.alias)
        elif isinstance(p, Identifier):
            cols.append(p.name)
        elif isinstance(p, Star):
            expanded = _expand_star(p, local)
            if expanded is None:
                return None
            cols.extend(i.parts[-1] for i in expanded)
        else:
            return None  # unnamed computed column → Spark generates a name
    return cols


def _collect_scope(rel: Optional[Relation], sp: SchemaProvider, scope: _Scope) -> _Scope:
    """Register every source in a FROM tree into ``scope``, auto-aliasing tables."""
    if rel is None:
        return scope
    if isinstance(rel, TableRef):
        if rel.alias is None:
            rel.alias = rel.parts[-1]
        if len(rel.parts) == 1 and rel.parts[0].lower() in scope.cte_columns:
            scope.add(rel.alias, scope.cte_columns[rel.parts[0].lower()])
        else:
            schema = sp(rel.parts)
            scope.add(rel.alias, [c for c, _ in schema] if schema else None)
        return scope
    if isinstance(rel, SubqueryRef):
        cols = output_columns(rel.query, sp, scope)
        scope.add(rel.alias or "_subquery", cols)
        return scope
    if isinstance(rel, Join):
        _collect_scope(rel.left, sp, scope)
        _collect_scope(rel.right, sp, scope)
        return scope
    if isinstance(rel, LateralView):
        _collect_scope(rel.base, sp, scope)
        scope.add(rel.table_alias, rel.column_aliases or None)
        return scope
    return scope


def _expand_star(star: Star, scope: _Scope) -> Optional[list[Identifier]]:
    out: list[Identifier] = []
    if star.qualifier:
        alias = star.qualifier[-1].lower()
        cols = scope.sources.get(alias)
        if cols is None:
            return None
        return [Identifier([alias, c]) for c in cols]
    for alias, cols in scope.sources.items():
        if cols is None:
            return None
        out.extend(Identifier([alias, c]) for c in cols)
    return out


def _qualify_query(q: Query, sp: SchemaProvider, scope: _Scope) -> None:
    if isinstance(q, With):
        for name, cte in q.ctes:
            _qualify_query(cte, sp, scope)
            scope.cte_columns[name.lower()] = output_columns(cte, sp, scope)
        _qualify_query(q.body, sp, scope)
        return
    if isinstance(q, SetOp):
        _qualify_query(q.left, sp, scope)
        _qualify_query(q.right, sp, scope)
        return
    if not isinstance(q, Select):
        return

    local = _Scope(scope)
    # First qualify derived tables (inner scopes see outer CTEs, not our FROM)
    _qualify_from_subqueries(q.from_, sp, scope)
    _collect_scope(q.from_, sp, local)

    # Expand stars in projections
    new_projections: list[Expr] = []
    for p in q.projections:
        if isinstance(p, Star):
            expanded = _expand_star(p, local)
            new_projections.extend(expanded if expanded is not None else [p])
        else:
            new_projections.append(p)
    q.projections = new_projections

    proj_aliases = {p.alias.lower() for p in q.projections if isinstance(p, Alias)}

    for p in q.projections:
        _qualify_expr(p, local, sp, set())
    if q.where is not None:
        _qualify_expr(q.where, local, sp, set())
    for e in q.group_by:
        _qualify_expr(e, local, sp, set(), skip_names=proj_aliases)
    if q.having is not None:
        _qualify_expr(q.having, local, sp, set(), skip_names=proj_aliases)
    for o in q.order_by:
        _qualify_expr(o.this, local, sp, set(), skip_names=proj_aliases)
    # ON conditions of joins in our FROM
    _qualify_join_conditions(q.from_, local, sp)


def _qualify_from_subqueries(rel: Optional[Relation], sp: SchemaProvider, scope: _Scope) -> None:
    if rel is None:
        return
    if isinstance(rel, SubqueryRef):
        _qualify_query(rel.query, sp, _Scope(scope))
    elif isinstance(rel, Join):
        _qualify_from_subqueries(rel.left, sp, scope)
        _qualify_from_subqueries(rel.right, sp, scope)
    elif isinstance(rel, LateralView):
        _qualify_from_subqueries(rel.base, sp, scope)


def _qualify_join_conditions(rel: Optional[Relation], scope: _Scope, sp: SchemaProvider) -> None:
    if isinstance(rel, Join):
        if rel.on is not None:
            _qualify_expr(rel.on, scope, sp, set())
        _qualify_join_conditions(rel.left, scope, sp)
        _qualify_join_conditions(rel.right, scope, sp)
    elif isinstance(rel, LateralView):
        _qualify_join_conditions(rel.base, scope, sp)


def _qualify_expr(e: Node, scope: _Scope, sp: SchemaProvider,
                  lambda_params: set[str], skip_names: Optional[set[str]] = None) -> None:
    if isinstance(e, Identifier):
        if len(e.parts) == 1:
            name = e.parts[0]
            if name.lower() in lambda_params:
                return
            if skip_names and name.lower() in skip_names:
                return
            owner = scope.resolve_column(name)
            if owner is not None:
                e.parts = [owner, name]
        return
    if isinstance(e, Lambda):
        _qualify_expr(e.body, scope, sp,
                      lambda_params | {p.lower() for p in e.params}, skip_names)
        return
    if isinstance(e, (Select, SetOp, With)):
        _qualify_query(e, sp, _Scope(scope))
        return
    for c in e.children():
        if isinstance(c, Query):
            _qualify_query(c, sp, _Scope(scope))
        else:
            _qualify_expr(c, scope, sp, lambda_params, skip_names)
