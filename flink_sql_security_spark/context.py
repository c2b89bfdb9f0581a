"""SecurityContext — the single query entry point of the security layer.

Parity target: ``SecurityContext.java`` (the reference's only entry point too,
same trust model). Pipeline per query: parse → qualify (star expansion, alias
assignment, column qualification against the live catalog) → policy-driven AST
rewrite (row filter first, then mask — order is load-bearing,
``SecurityContext.java:154-167``) → print → ``spark.sql``. The printed SQL is
string-in/string-out like the reference (``SecurityContext.java:126-167``):
engine-agnostic and auditable; Catalyst re-plans it with predicate pushdown and
column pruning doing the physical heavy lifting.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import functions as F

from .catalog import CatalogAdapter
from .operators.data_mask import DataMaskVisitor
from .operators.row_filter import RowFilterVisitor, qualify_condition
from .plans.nodes import Node
from .plans.parser import parse_statement
from .plans.qualify import qualify
from .policy.manager import PolicyManager

DEFAULT_FETCH_SIZE = 10  # SecurityContext.java:190-192


class SecurityContext:
    def __init__(self, spark: SparkSession,
                 policy_manager: Optional[PolicyManager] = None) -> None:
        self.spark = spark
        self.policy_manager = policy_manager or PolicyManager()
        self.catalog = CatalogAdapter(spark)

    # -- policy management -------------------------------------------------
    def add_policy(self, policy) -> None:
        self.policy_manager.add_policy(policy)

    def remove_policy(self, policy) -> bool:
        return self.policy_manager.remove_policy(policy)

    # -- rewrite-only entry points (SecurityContext.java:126-167) ----------
    def _parse_and_qualify(self, sql: str) -> Node:
        ast = parse_statement(sql)
        return qualify(ast, self.catalog.schema_provider)

    def rewrite_row_filter(self, username: str, sql: str) -> str:
        ast = self._parse_and_qualify(sql)
        RowFilterVisitor(self.policy_manager, username).visit(ast)
        return ast.sql()

    def rewrite_data_mask(self, username: str, sql: str) -> str:
        ast = self._parse_and_qualify(sql)
        DataMaskVisitor(
            self.policy_manager, username, self.catalog.get_table
        ).visit(ast)
        return ast.sql()

    def mixed_rewrite(self, username: str, sql: str) -> str:
        """Row filter first, then mask (SecurityContext.java:154-167)."""
        ast = self._parse_and_qualify(sql)
        RowFilterVisitor(self.policy_manager, username).visit(ast)
        DataMaskVisitor(
            self.policy_manager, username, self.catalog.get_table
        ).visit(ast)
        return ast.sql()

    # -- execution (SecurityContext.java:190-242) --------------------------
    def execute(self, sql: str, size: int = DEFAULT_FETCH_SIZE) -> list[Row]:
        """Run SQL with no security rewrite; fetch first ``size`` rows."""
        df = self.spark.sql(sql)
        if not df.columns:  # DDL / INSERT commands return no rows
            return []
        return df.limit(size).collect()

    def execute_row_filter(self, username: str, sql: str,
                           size: int = DEFAULT_FETCH_SIZE) -> list[Row]:
        return self.execute(self.rewrite_row_filter(username, sql), size)

    def execute_data_mask(self, username: str, sql: str,
                          size: int = DEFAULT_FETCH_SIZE) -> list[Row]:
        return self.execute(self.rewrite_data_mask(username, sql), size)

    def mixed_execute(self, username: str, sql: str,
                      size: int = DEFAULT_FETCH_SIZE) -> list[Row]:
        return self.execute(self.mixed_rewrite(username, sql), size)

    # -- DataFrame-native surface (Spark-first additions) ------------------
    def sql(self, username: str, sql: str) -> DataFrame:
        """Secured spark.sql: mixed rewrite, returns the (lazy) DataFrame."""
        return self.spark.sql(self.mixed_rewrite(username, sql))

    def apply_policies(self, username: str, df: DataFrame,
                       table_name: str) -> DataFrame:
        """Apply a user's row filter + masks to any DataFrame (batch OR
        streaming) whose schema matches ``table_name``'s policies.

        The shared fast path: the row filter becomes ``F.expr`` (Catalyst
        pushes it into the scan), masks become a ``select`` of lowered
        expressions CAST back to the column's type — all whole-stage codegen,
        valid on streaming DataFrames too (stateless projections/filters).
        """
        parts = table_name.split(".")
        mask_policies = {
            c: p
            for c, p in self.policy_manager.get_table_mask_policies(
                username, parts
            ).items()
            if p.condition != "MASK_NONE"
        }
        condition = self.policy_manager.get_row_filter_condition(username, parts)
        if condition is not None:
            df = df.filter(F.expr(condition))
        if mask_policies:
            visitor = DataMaskVisitor(
                self.policy_manager, username, self.catalog.get_table
            )
            cols = []
            for field in df.schema.fields:
                policy = mask_policies.get(field.name.lower())
                if policy is None:
                    cols.append(F.col(field.name))
                else:
                    masked = visitor._mask_expr(policy, field.name)
                    cols.append(
                        F.expr(masked.sql())
                        .cast(field.dataType)
                        .alias(field.name)
                    )
            df = df.select(*cols)
        return df

    def table(self, username: str, name: str) -> DataFrame:
        """Secured spark.table: masks + filters applied via the DataFrame API."""
        return self.apply_policies(username, self.spark.table(name), name)
