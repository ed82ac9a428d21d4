"""Real JDBC round trip against embedded Derby (the one JDBC driver shipped
in the Spark image) — upgrades sources/jdbc.py from unit-only to
integration-tested: a real ``spark.read.format("jdbc")`` exercises the URL /
driver / dbtable / query / partitioned-read plumbing end-to-end.

Reference analog: SQL Server / MySQL scans (dekispart.py:43-61,
innosite.py:29-105). No networked DBMS exists in this sandbox; embedded
Derby is file-backed in-process, which is exactly enough to prove the
reader configuration and the pushdown plan shape.
"""

import os
import re

import pytest

from data_check_spark.sources.jdbc import JdbcSource, read_jdbc

DERBY_DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"


@pytest.fixture(scope="module")
def derby_db(spark, tmp_path_factory):
    db = os.path.join(str(tmp_path_factory.mktemp("derby")), "testdb")
    url = f"jdbc:derby:{db};create=true"
    df = spark.range(200).selectExpr(
        "id", "cast(id % 7 as int) as grp", "concat('name_', id) as name"
    )
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", "CLIPS")
        .option("driver", DERBY_DRIVER)
        .save()
    )
    return url


def test_table_read_round_trip(spark, derby_db):
    src = JdbcSource(url=derby_db, table="CLIPS", driver=DERBY_DRIVER)
    back = read_jdbc(spark, src)
    assert back.count() == 200
    assert {c.lower() for c in back.columns} == {"id", "grp", "name"}
    assert back.filter("id = 42").collect()[0]["name"] == "name_42"


def test_query_pushdown_executes_in_dbms(spark, derby_db):
    """query= ships the whole SELECT to the DBMS — the reference's
    WHERE/JOIN-in-DBMS pattern, declaratively."""
    src = JdbcSource(
        url=derby_db,
        # Spark's JDBC writer creates quoted (case-exact) column names, so
        # the pushdown query must quote them too — Derby folds unquoted
        # identifiers to uppercase.
        query='SELECT "grp", count(*) AS n FROM clips GROUP BY "grp"',
        driver=DERBY_DRIVER,
    )
    out = read_jdbc(spark, src)
    rows = {r[0]: r[1] for r in out.collect()}
    assert len(rows) == 7 and sum(rows.values()) == 200


def test_filter_pushdown_reaches_jdbc_scan(spark, derby_db):
    src = JdbcSource(url=derby_db, table="CLIPS", driver=DERBY_DRIVER)
    df = read_jdbc(spark, src).filter("id >= 150").select("id")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # The predicate must appear as a pushed JDBC filter, not a Spark Filter
    # over a full scan.
    assert "PushedFilters" in plan and re.search(r"GreaterThanOrEqual\(.?id.?,150\)", plan, re.I)
    assert df.count() == 50


def test_partitioned_read_parallelizes(spark, derby_db):
    """partitionColumn/num_partitions is how a 10^12-row extraction fans out
    instead of the reference's single-cursor fetch."""
    src = JdbcSource(
        url=derby_db,
        table="CLIPS",
        driver=DERBY_DRIVER,
        partition_column="id",
        lower_bound=0,
        upper_bound=200,
        num_partitions=4,
    )
    back = read_jdbc(spark, src)
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 200
