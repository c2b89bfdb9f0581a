"""The reference README's worked example (§4 案例讲解, README.md:72-140),
run end-to-end on Spark — executable switching documentation.

Policies (README §1.3):
- user A sees only region='beijing' rows, customer_name fully masked;
- user B sees only region='hangzhou' rows, customer_name shows the first
  4 characters, the rest replaced with 'x'.

Input SQL (§4.1), then each user's final executed SQL (§4.2 / §4.3): the
row filter lands in the outer WHERE, the mask wraps the table in a
subquery re-emitting every column with CAST(mask_fn(col) AS type) — the
same shape the reference prints, minus the `hive.default.` catalog
prefix (pass --hive to run against a Hive metastore session and get
that too; see sources.build_session(hive_metastore=True)).

Run: python examples/reference_walkthrough.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import datetime
from decimal import Decimal

INPUT_SQL = "SELECT order_id, customer_name, product_id, region FROM orders"

ORDERS_ROWS = [
    # mirrors the reference's seeded MySQL corpus
    # (data/database/mysql_init.sql:1-29)
    (10001, "2020-07-30 10:08:22", "Jack", 102, "50.50000", False, "beijing"),
    (10002, "2020-07-30 10:11:09", "Sally", 105, "15.00000", False, "beijing"),
    (10003, "2020-07-30 12:00:30", "Edward", 106, "25.25000", False, "hangzhou"),
    (10004, "2022-12-15 12:11:09", "John", 103, "78.00000", False, "hangzhou"),
    (10005, "2022-12-16 12:00:30", "Edward", 104, "64.00000", False, "shanghai"),
    (10006, "2022-12-17 23:00:30", "Jack", 103, "20.00000", False, "shanghai"),
]


def build_demo(spark):
    from pyspark.sql.types import (
        BooleanType, DecimalType, IntegerType, StringType, StructField,
        StructType, TimestampType)

    schema = StructType([
        StructField("order_id", IntegerType()),
        StructField("order_date", TimestampType()),
        StructField("customer_name", StringType()),
        StructField("product_id", IntegerType()),
        StructField("price", DecimalType(10, 5)),
        StructField("order_status", BooleanType()),
        StructField("region", StringType()),
    ])
    rows = [
        (oid, datetime.datetime.strptime(d, "%Y-%m-%d %H:%M:%S"), n, p,
         Decimal(pr), st, r)
        for oid, d, n, p, pr, st, r in ORDERS_ROWS
    ]
    spark.createDataFrame(rows, schema).createOrReplaceTempView("orders")


def build_context(spark):
    from flink_sql_security_spark import (
        DataMaskPolicy, PolicyManager, RowFilterPolicy, SecurityContext)

    ctx = SecurityContext(spark, PolicyManager())
    # README §1.3: the two users' policies
    ctx.add_policy(RowFilterPolicy("user_a", "orders", "region = 'beijing'"))
    ctx.add_policy(DataMaskPolicy("user_a", "orders", "customer_name",
                                  "MASK"))
    ctx.add_policy(RowFilterPolicy("user_b", "orders", "region = 'hangzhou'"))
    ctx.add_policy(DataMaskPolicy("user_b", "orders", "customer_name",
                                  "MASK_SHOW_FIRST_4"))
    return ctx


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master("local[4]")
             .appName("reference-walkthrough")
             .config("spark.sql.shuffle.partitions", "4")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    build_demo(spark)
    ctx = build_context(spark)

    print("== input SQL (README §4.1) ==")
    print(INPUT_SQL)
    for user, section in (("user_a", "§4.2"), ("user_b", "§4.3")):
        print(f"\n== {user}'s final executed SQL (README {section}) ==")
        print(ctx.mixed_rewrite(user, INPUT_SQL))
        print(f"-- {user}'s rows:")
        for row in ctx.mixed_execute(user, INPUT_SQL):
            print("  ", tuple(row))
    spark.stop()


if __name__ == "__main__":
    main()
