"""Shared Spark session + reference-parity fixture tables.

Fixture data mirrors the reference's seeded MySQL corpus
(``data/database/mysql_init.sql:1-29``) with the Flink-side declared column
order (``AbstractBasicTest.java:170-233``, ``CommonTest.java:53-61``) — order
is load-bearing for mask subqueries.
"""

import datetime
from decimal import Decimal

import pytest
from pyspark.sql import SparkSession
from pyspark.sql.types import (
    BooleanType, DecimalType, IntegerType, StringType, StructField, StructType,
    TimestampType,
)


@pytest.fixture(scope="session")
def spark():
    spark = (
        SparkSession.builder.master("local[4]")
        .appName("flink-sql-security-spark-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        # one JVM hosts the whole ~500-test session; the 1g default
        # heap accumulates broadcast/GC pressure until a deep-DAG test
        # late in the run OOMs (seen once on the pagerank config fuzz
        # at ~test 490 — passes standalone). Headroom, not a fix for
        # any operator: the box has 128 GiB.
        .config("spark.driver.memory", "6g")
        .getOrCreate()
    )
    yield spark
    spark.stop()


def _ts(s: str) -> datetime.datetime:
    return datetime.datetime.strptime(s, "%Y-%m-%d %H:%M:%S")


ORDERS_SCHEMA = StructType([
    StructField("order_id", IntegerType()),
    StructField("order_date", TimestampType()),
    StructField("customer_name", StringType()),
    StructField("product_id", IntegerType()),
    StructField("price", DecimalType(10, 5)),
    StructField("order_status", BooleanType()),
    StructField("region", StringType()),
])

ORDERS_ROWS = [
    (10001, _ts("2020-07-30 10:08:22"), "Jack", 102, Decimal("50.50000"), False, "beijing"),
    (10002, _ts("2020-07-30 10:11:09"), "Sally", 105, Decimal("15.00000"), False, "beijing"),
    (10003, _ts("2020-07-30 12:00:30"), "Edward", 106, Decimal("25.25000"), False, "hangzhou"),
    (10004, _ts("2022-12-15 12:11:09"), "John", 103, Decimal("78.00000"), False, "hangzhou"),
    (10005, _ts("2022-12-16 12:00:30"), "Edward", 104, Decimal("64.00000"), False, "shanghai"),
    (10006, _ts("2022-12-17 23:00:30"), "Jack", 103, Decimal("20.00000"), False, "shanghai"),
]

PRODUCTS_SCHEMA = StructType([
    StructField("id", IntegerType()),
    StructField("name", StringType()),
    StructField("description", StringType()),
])

PRODUCTS_ROWS = [
    (101, "scooter", "Small 2-wheel scooter"),
    (102, "car battery", "12V car battery"),
    (103, "12-pack drill bits", "12-pack of drill bits with sizes ranging from #40 to #3"),
    (104, "hammer", "12oz carpenter's hammer"),
    (105, "hammer", "14oz carpenter's hammer"),
    (106, "hammer", "16oz carpenter's hammer"),
    (107, "rocks", "box of assorted rocks"),
    (108, "jacket", "water resistent black wind breaker"),
    (109, "spare tire", "24 inch spare tire"),
]

SHIPMENTS_SCHEMA = StructType([
    StructField("shipment_id", IntegerType()),
    StructField("order_id", IntegerType()),
    StructField("origin", StringType()),
    StructField("destination", StringType()),
    StructField("is_arrived", BooleanType()),
])

SHIPMENTS_ROWS = [
    (1001, 10001, "Beijing", "Shanghai", False),
    (1002, 10002, "Hangzhou", "Shanghai", False),
    (1003, 10003, "Shanghai", "Hangzhou", False),
]


def register_demo_tables(spark):
    spark.createDataFrame(ORDERS_ROWS, ORDERS_SCHEMA).createOrReplaceTempView("orders")
    spark.createDataFrame(PRODUCTS_ROWS, PRODUCTS_SCHEMA).createOrReplaceTempView("products")
    spark.createDataFrame(SHIPMENTS_ROWS, SHIPMENTS_SCHEMA).createOrReplaceTempView("shipments")
    spark.createDataFrame([], ORDERS_SCHEMA).createOrReplaceTempView("print_sink")


@pytest.fixture()
def demo_tables(spark):
    """orders / products / shipments / print_sink temp views (re-registered
    per test: other modules overwrite these view names with TPC-H tables)."""
    register_demo_tables(spark)
    return spark
