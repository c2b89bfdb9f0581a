"""Row-filter injection visitor.

Parity target: ``visitor/RowFilterVisitor.java:45-125``. For every SELECT in
the statement tree, walk its FROM; for each base-table reference, look up the
(user, table) policy, parse its condition, qualify the condition's column refs
with the table's alias, and AND it into that SELECT's WHERE. Join operands are
recursed (``RowFilterVisitor.java:64-86``) so every table of an n-way join
lands in the same top-level WHERE; subquery operands are skipped
(``:73-79``) — the nested SELECT gets its own filters when the walker reaches
it.

Deliberate fix over the reference (documented in SURVEY §7): the reference
qualifies only ``operands[0]`` of the parsed condition
(``RowFilterVisitor.java:101-102``), which breaks compound conditions like
``a = 1 AND b = 2``. We qualify every unqualified column reference instead.
"""

from __future__ import annotations

from ..plans.nodes import (
    Expr, Identifier, Insert, Join, Lambda, LateralView, Node, Query, Relation,
    Select, SetOp, SubqueryRef, TableRef, With, and_,
)
from ..plans.parser import parse_expression
from ..policy.manager import PolicyManager


def qualify_condition(cond: Expr, alias: str) -> Expr:
    """Prefix every unqualified column ref in ``cond`` with ``alias``."""

    def _walk(e: Node, lambda_params: frozenset[str]) -> None:
        if isinstance(e, Identifier):
            if len(e.parts) == 1 and e.parts[0].lower() not in lambda_params:
                e.parts = [alias, e.parts[0]]
            return
        if isinstance(e, Lambda):
            _walk(e.body, lambda_params | frozenset(p.lower() for p in e.params))
            return
        for c in e.children():
            _walk(c, lambda_params)

    _walk(cond, frozenset())
    return cond


class RowFilterVisitor:
    def __init__(self, policy_manager: PolicyManager, username: str) -> None:
        self.policy_manager = policy_manager
        self.username = username

    def visit(self, node: Node) -> Node:
        """Apply row filters to every SELECT in the statement (in place)."""
        if isinstance(node, Insert):
            self.visit(node.query)
            return node
        if isinstance(node, With):
            for _, cte in node.ctes:
                self.visit(cte)
            self.visit(node.body)
            return node
        if isinstance(node, SetOp):
            self.visit(node.left)
            self.visit(node.right)
            return node
        if isinstance(node, Select):
            self._apply_to_select(node)
            # recurse into nested queries anywhere under this select
            # (FROM-subqueries, IN/EXISTS/scalar subqueries)
            for child in node.children():
                self._visit_nested(child)
            return node
        return node

    def _visit_nested(self, node: Node) -> None:
        if isinstance(node, (Select, SetOp, With, Insert)):
            self.visit(node)
            return
        for c in node.children():
            self._visit_nested(c)

    def _apply_to_select(self, select: Select) -> None:
        if select.from_ is None:
            return
        select.where = self._add_condition(select.from_, select.where)

    def _add_condition(self, rel: Relation, where: Expr | None) -> Expr | None:
        """FROM-tree recursion, mirroring ``addCondition`` RowFilterVisitor.java:64-86."""
        if isinstance(rel, Join):
            where = self._add_condition(rel.left, where)
            where = self._add_condition(rel.right, where)
            return where
        if isinstance(rel, LateralView):
            return self._add_condition(rel.base, where)
        if isinstance(rel, TableRef):
            condition = self.policy_manager.get_row_filter_condition(
                self.username, rel.parts
            )
            if condition is None:
                return where
            cond_ast = parse_expression(condition)
            qualify_condition(cond_ast, rel.effective_alias())
            return and_(where, cond_ast)
        # SubqueryRef: leave WHERE untouched (RowFilterVisitor.java:73-79);
        # the inner SELECT is rewritten when the visitor reaches it.
        return where
