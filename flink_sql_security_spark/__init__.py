"""flink_sql_security_spark — PySpark-native SQL security layer.

A from-scratch rebuild of the capabilities of HamaWhiteGG/flink-sql-security
(row-level access control + column data masking via SQL rewriting) on Apache
Spark: pure-Python AST rewriting in front of ``spark.sql``, with Catalyst doing
all optimization of the rewritten plan.
"""

from .context import SecurityContext  # noqa: F401
from .policy import (  # noqa: F401
    DataMaskPolicy, DataMaskType, PolicyManager, RowFilterPolicy,
)

__version__ = "0.1.0"
