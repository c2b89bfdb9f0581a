"""Demo policy preset mapping the reference's policy fixtures onto the
driver's TPC-H-ish tables (FIXTURES.md "Driver synthetic-table mapping"):

- ``orders.o_orderpriority = '1-URGENT'`` ← analogue of ``orders.region = 'beijing'``
- ``customer.c_mktsegment = 'BUILDING'`` ← second row-filter table (join cases)
- ``customer.c_name`` mask targets ← analogue of ``orders.customer_name``
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .context import SecurityContext
from .policy import DataMaskPolicy, RowFilterPolicy

USER_FILTER = "user_filter"      # row filters only
USER_MASK = "user_mask"          # masks only
USER_MIXED = "user_mixed"        # both
USER_HASH = "user_hash"          # hash mask
USER_NULL = "user_null"          # nullify mask
USER_DATE = "user_date"          # date mask (MASK_DATE_SHOW_YEAR)
USER_CUSTOM = "user_custom"      # CUSTOM mask with a {col} SQL template
USER_DOCS = "user_docs"          # RLS on the documents corpus (source gate)
USER_EVENTS = "user_events"      # RLS on the event stream (telemetry gate)


def demo_context(spark: SparkSession) -> SecurityContext:
    ctx = SecurityContext(spark)
    for user in (USER_FILTER, USER_MIXED):
        ctx.add_policy(RowFilterPolicy(user, "orders", "o_orderpriority = '1-URGENT'"))
        ctx.add_policy(RowFilterPolicy(user, "customer", "c_mktsegment = 'BUILDING'"))
    for user in (USER_MASK, USER_MIXED):
        ctx.add_policy(DataMaskPolicy(user, "customer", "c_name", "MASK_SHOW_FIRST_4"))
        ctx.add_policy(DataMaskPolicy(user, "supplier", "s_name", "MASK"))
        ctx.add_policy(DataMaskPolicy(user, "part", "p_name", "MASK_SHOW_LAST_4"))
    ctx.add_policy(DataMaskPolicy(USER_HASH, "customer", "c_name", "MASK_HASH"))
    ctx.add_policy(DataMaskPolicy(USER_NULL, "customer", "c_name", "MASK_NULL"))
    ctx.add_policy(DataMaskPolicy(USER_DATE, "orders", "o_orderdate",
                                  "MASK_DATE_SHOW_YEAR"))
    ctx.add_policy(DataMaskPolicy(
        USER_CUSTOM, "customer", "c_name", "CUSTOM",
        custom_transformer="concat(substring({col}, 1, 2), repeat('*', 6))"))
    # training-data governance: per-user source restriction on the corpus —
    # pipeline ops run over ctx.table(user, "documents") and inherit the gate
    ctx.add_policy(RowFilterPolicy(USER_DOCS, "documents", "source <> 'src0'"))
    # event-stream governance: analysts see only consented users (a
    # GDPR-style gate that BITES every downstream op — an event-type
    # gate would be invisible to a funnel that never reads that type);
    # the analytics tier runs over ctx.table(user, "events") and
    # inherits it
    ctx.add_policy(RowFilterPolicy(USER_EVENTS, "events",
                                   "user_id % 10 != 0"))
    return ctx
