"""Thrift JDBC/ODBC front-end — the BI-tool door.

BASELINE.md names "Spark SQL + Thrift JDBC/ODBC server" as the modern
equivalent of the reference's socket intake (DAGListener.scala:104's
raw marker-string protocol).  The repo's primary gateway is the
line-JSON TCP server (``server/server.py`` — the work-sharing path:
batching window, scan-sharing detector, cache rewrite), but the bundled
``spark-hive-thriftserver`` module lets any HiveServer2/JDBC/ODBC
client (beeline, Tableau, DBeaver, …) connect to the SAME SparkContext,
so both doors share the catalog and block-manager storage. Cached-
relation reuse is measured and scoped: the FIRST JDBC connection binds
the parent session and its plans substitute the executor-built
InMemoryRelation directly (tests/test_thrift.py asserts this);
subsequent connections clone the session and re-resolve temp views to
fresh relations, so they re-scan unless the deployment registers the
cached tables per-session or runs CACHE TABLE through the gateway.

Start it with ``spark.sql.hive.thriftServer.singleSession=true`` so
JDBC sessions see the temp views ``catalog.register_tables`` created
(mirrors the reference's single shared server process; without it each
JDBC login forks a private session like our per-client
``spark.newSession()`` isolation).

Scale note: the thrift endpoint is a thin RPC shim over the same
driver; at cluster scale it is the standard Spark Thrift Server
deployment (one driver, executors fan out), no code change.
"""

from __future__ import annotations

import socket
import time
from typing import Any

from pyspark.sql import SparkSession


def thriftserver_available(spark: SparkSession) -> bool:
    """True when the spark-hive-thriftserver module is on the JVM
    classpath (bundled with PyPI pyspark; absent in some slim builds)."""
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName(
            "org.apache.spark.sql.hive.thriftserver.HiveThriftServer2"
        )
        return True
    except Exception:
        return False


def start_thriftserver(spark: SparkSession, port: int = 10000) -> Any:
    """Start the HiveServer2-compatible endpoint on ``port``, sharing
    this session's SparkContext (and with singleSession, its temp
    views). Returns the JVM server handle; blocks only until the
    socket accepts.

    The port travels via a JVM system property: HiveConf merges system
    properties over hive-site defaults, which is the only channel that
    works after the SparkContext is already running.
    """
    jvm = spark.sparkContext._jvm
    jvm.java.lang.System.setProperty("hive.server2.thrift.port", str(port))
    jvm.java.lang.System.setProperty("hive.server2.thrift.bind.host", "localhost")
    server = jvm.org.apache.spark.sql.hive.thriftserver.HiveThriftServer2.startWithSparkSession(
        spark._jsparkSession, False
    )
    _wait_port(port)
    return server


def _wait_port(port: int, timeout_s: float = 90.0) -> None:
    deadline = time.monotonic() + timeout_s
    while time.monotonic() < deadline:
        try:
            with socket.create_connection(("localhost", port), timeout=1):
                return
        except OSError:
            time.sleep(0.5)
    raise TimeoutError(f"thrift server did not bind :{port} in {timeout_s}s")
