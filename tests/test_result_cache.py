"""Gateway result cache (server/results.py): hit/miss semantics,
command invalidation, session isolation, non-determinism guard."""

from __future__ import annotations

import time

import pytest

from sparksql_server_spark.server import WorkSharingServer, client_request
from sparksql_server_spark.server.results import ResultCache, cacheable_sql
from tests.conftest import SF_DIR

Q = "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey"


# -- unit: the cacheability guard ------------------------------------------


@pytest.mark.parametrize(
    "sql,ok",
    [
        (Q, True),
        ("SELECT rand() AS x", False),
        ("SELECT current_timestamp", False),
        ("SELECT current_date AS d", False),
        ("SELECT uuid() AS u FROM region", False),
        ("SELECT monotonically_increasing_id() FROM region", False),
        ("SELECT 'randomness' AS s FROM region", True),  # word inside a literal-ish ident is fine
        # round-12 review: arbitrary-JVM-call and Spark-4 random
        # generators, plus the curdate alias, must also decline
        ("SELECT reflect('java.util.UUID','randomUUID') FROM region", False),
        ("SELECT java_method('java.lang.Math','random') FROM region", False),
        ("SELECT curdate() AS d", False),
        ("SELECT randstr(8) AS s FROM region", False),
        ("SELECT uniform(0, 10) AS u FROM region", False),
    ],
)
def test_cacheable_sql(sql, ok):
    assert cacheable_sql(sql) is ok


def test_key_preserves_whitespace_inside_literals():
    """ADVICE r4 high: whitespace normalization must not reach inside
    string literals — WHERE name='a  b' and WHERE name='a b' are
    different queries and must never share a cache key."""
    k1 = ResultCache.key(None, "SELECT * FROM t WHERE name = 'a  b'")
    k2 = ResultCache.key(None, "SELECT * FROM t WHERE name = 'a b'")
    assert k1 != k2
    # whitespace OUTSIDE literals still normalizes (that's the point)
    k3 = ResultCache.key(None, "SELECT  *\n FROM t  WHERE name = 'a  b'")
    assert k3 == k1
    # escaped quote does not flip the in-string state
    k4 = ResultCache.key(None, r"SELECT 'don\'t  stop' AS s,  1 AS n")
    k5 = ResultCache.key(None, r"SELECT 'don\'t stop' AS s, 1 AS n")
    assert k4 != k5
    # double-quoted and backtick-quoted spans are also preserved
    assert ResultCache.key(None, 'SELECT "x  y"') != ResultCache.key(None, 'SELECT "x y"')


def test_put_discards_stale_generation():
    """ADVICE r4 low: a put whose pre-submit epoch predates an
    invalidation must be discarded, not served for up to TTL."""
    rc = ResultCache()
    k = ResultCache.key(None, "q")
    gen = rc.generation
    rc.invalidate_all()  # a command ran while the query was in flight
    rc.put(k, {"v": 1}, generation=gen)
    assert rc.get(k) is None
    rc.put(k, {"v": 2}, generation=rc.generation)  # fresh epoch → cached
    assert rc.get(k) == {"v": 2}


def test_insert_overwrite_directory_is_unresolvable():
    """Review r7: 'INSERT OVERWRITE DIRECTORY' must fall back to the
    whole-cache flush — the regex would otherwise capture the keyword
    DIRECTORY (or LOCAL) as a table name and scope the flush to a
    table nothing reads."""
    from sparksql_server_spark.server.results import command_write_set

    assert command_write_set("INSERT OVERWRITE DIRECTORY '/data/t' SELECT 1") is None
    assert (
        command_write_set("INSERT OVERWRITE LOCAL DIRECTORY '/d' SELECT 1") is None
    )
    # a real table target still resolves, qualified AND bare
    ws = command_write_set("INSERT INTO db2.`tbl` SELECT 1")
    assert ws == frozenset({"tbl", "db2.tbl"})


def test_keys_intersect_directory_containment():
    """Review r7: a sink writing a directory must hit entries whose
    scan fingerprint is a child file, and vice versa."""
    from sparksql_server_spark.server.results import keys_intersect

    assert keys_intersect(frozenset({"/data/t/data.csv"}), frozenset({"/data/t"}))
    assert keys_intersect(frozenset({"/data/t"}), frozenset({"/data/t/new.csv"}))
    assert not keys_intersect(frozenset({"/data/tt/x.csv"}), frozenset({"/data/t"}))
    assert keys_intersect(frozenset({"part"}), frozenset({"part"}))
    assert not keys_intersect(frozenset({"part"}), frozenset({"orders"}))


def test_taint_refuses_overlapping_puts_until_expiry():
    rc = ResultCache()
    k1, k2 = ResultCache.key(None, "q1"), ResultCache.key(None, "q2")
    rc.taint_tables(frozenset({"region"}), ttl_seconds=0.4)
    rc.put(k1, {"v": 1}, tables=frozenset({"region", "/d/region.parquet"}))
    assert rc.get(k1) is None  # refused: reads the tainted table
    rc.put(k2, {"v": 2}, tables=frozenset({"nation"}))
    assert rc.get(k2) == {"v": 2}  # unrelated read set caches fine
    # unknown read set cannot prove disjointness -> refused
    rc.put(ResultCache.key(None, "q3"), {"v": 3}, tables=None)
    assert rc.get(ResultCache.key(None, "q3")) is None
    time.sleep(0.45)
    rc.put(k1, {"v": 4}, tables=frozenset({"region"}))
    assert rc.get(k1) == {"v": 4}  # taint expired


def test_invalidate_advances_generation_even_when_empty():
    rc = ResultCache()
    g0 = rc.generation
    rc.invalidate_all()  # empty cache — epoch must still advance
    assert rc.generation == g0 + 1


def test_oversized_result_not_pinned():
    rc = ResultCache(max_rows_per_entry=3)
    k = ResultCache.key(None, "q")
    rc.put(k, {"rows": [[1]] * 4})
    assert rc.get(k) is None  # declined: re-running beats pinning RAM
    rc.put(k, {"rows": [[1]] * 3})
    assert rc.get(k) is not None


@pytest.mark.parametrize(
    "sql,expect",
    [
        ("INSERT INTO part VALUES (1)", {"part"}),
        ("INSERT OVERWRITE TABLE db.part SELECT 1", {"part", "db.part"}),
        ("UPDATE `sales`.`orders` SET x = 1", {"orders", "sales.orders"}),
        ("DELETE FROM lineitem WHERE 1=1", {"lineitem"}),
        ("MERGE INTO tgt USING src ON tgt.k = src.k WHEN MATCHED THEN DELETE",
         {"tgt"}),
        ("DROP TABLE IF EXISTS old_t", {"old_t"}),
        ("drop view v1", {"v1"}),
        ("ALTER TABLE part ADD COLUMNS (z INT)", {"part"}),
        ("TRUNCATE TABLE part", {"part"}),
        ("CREATE OR REPLACE TEMPORARY VIEW v AS SELECT 1", {"v"}),
        ("CREATE TABLE t2 AS SELECT * FROM part", {"t2"}),
        ("REFRESH TABLE part", {"part"}),
        ("CACHE TABLE part", {"part"}),
        ("UNCACHE TABLE IF EXISTS part", {"part"}),
        ("SET spark.sql.shuffle.partitions=8", None),
        ("ADD JAR /tmp/x.jar", None),
        ("BEGIN SELECT 1; END", None),
    ],
)
def test_command_write_set(sql, expect):
    from sparksql_server_spark.server.results import command_write_set

    got = command_write_set(sql)
    assert (got if got is None else set(got)) == expect


def test_invalidate_tables_scoped_and_epoch():
    """Scoped flush removes intersecting + unknown-read-set entries,
    keeps the rest, and ALWAYS advances the put-epoch so racing
    in-flight puts are discarded (ADVICE r6 medium)."""
    from sparksql_server_spark.server.results import ResultCache

    rc = ResultCache()
    ka, kb, ku = (ResultCache.key(None, s) for s in ("qa", "qb", "qu"))
    rc.put(ka, {"v": "a"}, tables=frozenset({"part", "/x/part.parquet"}))
    rc.put(kb, {"v": "b"}, tables=frozenset({"region"}))
    rc.put(ku, {"v": "u"}, tables=None)  # unknown read set
    g0 = rc.generation
    rc.invalidate_tables(frozenset({"part"}))
    assert rc.get(ka) is None, "entry reading the written table flushes"
    assert rc.get(ku) is None, "unknown read set flushes on every scope"
    assert rc.get(kb) == {"v": "b"}, "untouched table survives"
    assert rc.generation == g0 + 1
    # an in-flight put captured before the scoped flush is discarded
    rc.put(kb, {"v": "stale"}, generation=g0, tables=frozenset({"region"}))
    assert rc.get(kb) == {"v": "b"}


def test_bump_generation_discards_puts_without_flushing():
    from sparksql_server_spark.server.results import ResultCache

    rc = ResultCache()
    k1, k2 = ResultCache.key(None, "q1"), ResultCache.key(None, "q2")
    rc.put(k1, {"v": 1}, tables=frozenset({"t"}))
    g0 = rc.generation
    rc.bump_generation()  # command ARRIVED (hasn't executed yet)
    assert rc.get(k1) == {"v": 1}, "existing entries predate the command"
    rc.put(k2, {"v": 2}, generation=g0)
    assert rc.get(k2) is None, "racing put must be discarded"


def test_lru_and_ttl():
    rc = ResultCache(max_entries=2, ttl_seconds=0.2)
    k1, k2, k3 = (ResultCache.key(None, s) for s in ("a", "b", "c"))
    rc.put(k1, {"v": 1})
    rc.put(k2, {"v": 2})
    rc.put(k3, {"v": 3})  # evicts k1 (LRU bound 2)
    assert rc.get(k1) is None and rc.get(k2) == {"v": 2}
    time.sleep(0.25)
    assert rc.get(k2) is None  # expired


# -- through the gateway ---------------------------------------------------


@pytest.fixture()
def server(spark):
    srv = WorkSharingServer(spark, SF_DIR, window_size=2, max_wait=0.2).start()
    yield srv
    srv.shutdown()
    srv.executor.cache.clear()


def test_repeat_query_served_from_cache(server):
    first = client_request(server.address, {"sql": Q})
    assert first["status"] == "done" and "cached" not in first
    second = client_request(server.address, {"sql": Q})
    assert second["status"] == "done" and second.get("cached") is True
    assert second["rows"] == first["rows"] and second["columns"] == first["columns"]
    stats = client_request(server.address, {"server_stats": True})["stats"]
    assert stats["result_cache_hits"] >= 1


def test_semantic_keys_hit_across_spellings():
    """Round 12: statements in the canonical aggregation shape key the
    result cache by the merge path's spelling-insensitive parse —
    conjunct order, IN-list vs OR-chain, and join operand order hit the
    SAME entry across time. Anything observable (output alias spelling,
    select-item order, a predicate constant) keys differently, and
    non-shape / nondeterministic statements keep the text key."""
    K = lambda s: ResultCache.key(None, s)  # noqa: E731
    assert K(
        "SELECT l_returnflag, sum(l_quantity) AS s FROM lineitem"
        " WHERE l_discount > 0.02 AND l_tax < 0.05 GROUP BY l_returnflag"
    ) == K(
        "select l_returnflag, SUM( l_quantity ) as s from lineitem"
        " where l_tax < 0.05 and 0.02 < l_discount group by l_returnflag"
    )
    assert K(
        "SELECT l_returnflag, sum(l_quantity) AS s FROM lineitem"
        " WHERE l_linenumber IN (1, 2) GROUP BY l_returnflag"
    ) == K(
        "SELECT l_returnflag, sum(l_quantity) AS s FROM lineitem"
        " WHERE l_linenumber = 2 OR l_linenumber = 1 GROUP BY l_returnflag"
    )
    assert K(
        "SELECT o_orderpriority, count(*) AS n FROM orders JOIN lineitem"
        " ON o_orderkey = l_orderkey GROUP BY o_orderpriority"
    ) == K(
        "SELECT o_orderpriority, count(*) AS n FROM lineitem JOIN orders"
        " ON l_orderkey = o_orderkey GROUP BY o_orderpriority"
    )
    base = (
        "SELECT l_returnflag, sum(l_quantity) AS s FROM lineitem"
        " GROUP BY l_returnflag"
    )
    assert K(base) != K(base.replace("AS s", "AS S"))  # alias case observable
    assert K(
        "SELECT l_returnflag, sum(l_quantity) AS s, count(*) AS n"
        " FROM lineitem GROUP BY l_returnflag"
    ) != K(
        "SELECT l_returnflag, count(*) AS n, sum(l_quantity) AS s"
        " FROM lineitem GROUP BY l_returnflag"
    )  # column order observable
    assert K(base + " LIMIT 5") != K(base + " LIMIT 6")
    # nondeterministic and non-shape statements fall back to text keys
    assert isinstance(
        K(base.replace("GROUP BY", "WHERE rand() < 0.5 GROUP BY"))[1], str
    )
    assert isinstance(K("SELECT * FROM lineitem LIMIT 5")[1], str)
    # session namespaces stay disjoint for the same semantic key
    assert K(base) != ResultCache.key("sess1", base)
    assert K(base) != ResultCache.key_root(base)


def test_semantic_respelling_served_from_cache(server):
    q1 = (
        "SELECT l_returnflag, sum(l_quantity) AS sq FROM lineitem"
        " WHERE l_discount > 0.02 AND l_linenumber IN (1, 2)"
        " GROUP BY l_returnflag"
    )
    q2 = (
        "select l_returnflag, sum( l_quantity ) AS sq from lineitem"
        " where (l_linenumber = 2 or l_linenumber = 1)"
        " and 0.02 < l_discount group by l_returnflag"
    )
    first = client_request(server.address, {"sql": q1})
    assert first["status"] == "done" and "cached" not in first
    second = client_request(server.address, {"sql": q2})
    assert second["status"] == "done" and second.get("cached") is True
    assert sorted(map(tuple, second["rows"])) == sorted(
        map(tuple, first["rows"])
    )
    assert second["columns"] == first["columns"]


def test_command_invalidation_is_write_set_scoped(server, tmp_path):
    """r6 verdict ask #4: INSERT into table A must keep cached results
    for B and invalidate A's — whole-cache flushes on every command
    zeroed the dashboard hit rate the moment a workload mixed DML."""
    out = str(tmp_path / "t_scoped")
    mk = client_request(
        server.address,
        {"sql": f"CREATE TABLE rc_scope USING parquet LOCATION '{out}' "
                "AS SELECT r_regionkey AS k FROM region"},
    )
    assert mk["status"] == "done", mk
    try:
        qa = "SELECT count(*) AS n FROM rc_scope"
        a1 = client_request(server.address, {"sql": qa})
        b1 = client_request(server.address, {"sql": Q})
        assert a1["status"] == "done" and b1["status"] == "done"
        # both now cached
        assert client_request(server.address, {"sql": qa}).get("cached") is True
        assert client_request(server.address, {"sql": Q}).get("cached") is True
        # write A: only A's entry flushes; B (region) survives
        ins = client_request(
            server.address, {"sql": "INSERT INTO rc_scope VALUES (999)"}
        )
        assert ins["status"] == "done", ins
        a2 = client_request(server.address, {"sql": qa})
        assert "cached" not in a2, "entry reading the written table must flush"
        assert a2["rows"][0][0] == a1["rows"][0][0] + 1  # and see the write
        assert client_request(server.address, {"sql": Q}).get("cached") is True, (
            "entry reading an untouched table must survive the command"
        )
    finally:
        client_request(server.address, {"sql": "DROP TABLE IF EXISTS rc_scope"})


def test_unresolvable_command_flushes_everything(server):
    """A command whose write set can't be parsed (SET changes
    evaluation semantics for anything) keeps the conservative
    whole-cache flush."""
    client_request(server.address, {"sql": Q})
    assert client_request(server.address, {"sql": Q}).get("cached") is True
    r = client_request(
        server.address, {"sql": "SET spark.sql.shuffle.partitions=32"}
    )
    assert r["status"] == "done", r
    refreshed = client_request(server.address, {"sql": Q})
    assert "cached" not in refreshed and refreshed["status"] == "done"


def test_drop_table_invalidates_its_entries(server, tmp_path):
    out = str(tmp_path / "t_drop")
    mk = client_request(
        server.address,
        {"sql": f"CREATE TABLE rc_drop USING parquet LOCATION '{out}' "
                "AS SELECT 1 AS one"},
    )
    assert mk["status"] == "done", mk
    qa = "SELECT sum(one) AS s FROM rc_drop"
    client_request(server.address, {"sql": qa})
    assert client_request(server.address, {"sql": qa}).get("cached") is True
    assert client_request(server.address, {"sql": "DROP TABLE rc_drop"})[
        "status"
    ] == "done"
    gone = client_request(server.address, {"sql": qa})
    assert gone["status"] == "error" and "cached" not in gone


def test_clean_sessions_share_results(server):
    """Cross-client sharing (VERDICT r5 #7): sessions that have never
    run a session-scoped command see exactly the shared catalog, so
    one execution serves every clean client — the reference's whole
    point was cross-client sharing."""
    a = client_request(server.address, {"sql": Q, "session": "alice"})
    assert "cached" not in a  # first execution anywhere
    b = client_request(server.address, {"sql": Q, "session": "bob"})
    assert b.get("cached") is True  # bob served from alice's run
    assert b["rows"] == a["rows"] and b["columns"] == a["columns"]
    root = client_request(server.address, {"sql": Q})
    assert root.get("cached") is True  # the root session shares too


def test_dirty_session_keys_privately(server):
    """The moment a session runs ANY command, its text may resolve
    differently (temp views shadow shared tables) — it must key
    privately from then on, and never poison the shared namespace."""
    # alice creates a temp view shadowing nothing — she is dirty now
    r = client_request(
        server.address,
        {
            "sql": "CREATE TEMPORARY VIEW rc_dirty_v AS SELECT 1 AS one",
            "session": "alice",
        },
    )
    assert r["status"] == "done", r
    a1 = client_request(server.address, {"sql": Q, "session": "alice"})
    assert "cached" not in a1  # command flushed the cache; fresh run
    # bob (clean) does NOT see alice's private entry: he executes once
    # into the shared namespace...
    b1 = client_request(server.address, {"sql": Q, "session": "bob"})
    assert "cached" not in b1
    # ...then alice's repeat hits her PRIVATE key, bob's the shared one
    a2 = client_request(server.address, {"sql": Q, "session": "alice"})
    b2 = client_request(server.address, {"sql": Q, "session": "bob"})
    assert a2.get("cached") is True and b2.get("cached") is True
    # alice's private view never leaks into the shared namespace: a
    # clean client asking for her view text gets a clean error, not
    # her cached rows
    v = client_request(
        server.address, {"sql": "SELECT * FROM rc_dirty_v", "session": "carol"}
    )
    assert v["status"] == "error"


def test_nondeterministic_query_not_cached(server):
    sql = "SELECT count(*) AS n FROM region WHERE rand() >= 0"
    client_request(server.address, {"sql": sql})
    again = client_request(server.address, {"sql": sql})
    assert "cached" not in again


def test_taint_starvation_is_scoped_and_counted():
    """VERDICT r7 ask #5: a steady stream of commands writing table A
    must not zero the hit rate for table B — refusal is scoped by
    keys_intersect — and every taint-refused put is observable via the
    counter. The worst case is characterized: puts READING the written
    table are refused while commands keep arriving plus one TTL, which
    is exactly the maybe-stale window; the live-taint list stays
    bounded by one TTL horizon's worth of commands."""
    rc = ResultCache()
    # 50 commands writing A arrive back to back (each taints A)
    for _ in range(50):
        rc.taint_tables(frozenset({"a"}), 5.0)
    # queries reading A are refused (their input may be mid-command) …
    ka = ResultCache.key(None, "SELECT * FROM a")
    for i in range(10):
        rc.put(ka, {"v": i}, tables=frozenset({"a"}))
    assert rc.get(ka) is None
    assert rc.stats()["result_cache_taint_refused"] == 10
    # … while unrelated-table queries cache at full hit rate THROUGHOUT
    for i in range(10):
        kb = ResultCache.key(None, f"SELECT {i} FROM b")
        rc.put(kb, {"v": i}, tables=frozenset({"b"}))
        assert rc.get(kb) == {"v": i}
    assert rc.stats()["result_cache_taint_refused"] == 10  # none refused
    # unknown read sets refuse conservatively under ANY live taint
    rc.put(ResultCache.key(None, "SELECT ?"), {"v": 1}, tables=None)
    assert rc.stats()["result_cache_taint_refused"] == 11
    # the live list is pruned, not accumulated forever
    assert rc.stats()["result_cache_live_taints"] == 50
    rc2 = ResultCache()
    for _ in range(50):
        rc2.taint_tables(frozenset({"a"}), 0.001)
    time.sleep(0.01)
    rc2.taint_tables(frozenset({"a"}), 5.0)  # prunes the expired 50
    assert rc2.stats()["result_cache_live_taints"] == 1
    # after expiry the written table caches again — the refusal horizon
    # is bounded by (last command arrival + TTL), never permanent
    rc3 = ResultCache()
    rc3.taint_tables(frozenset({"a"}), 0.05)
    time.sleep(0.06)
    rc3.put(ka, {"v": 99}, tables=frozenset({"a"}))
    assert rc3.get(ka) == {"v": 99}


def test_benign_jdbc_housekeeping_preserves_cache_and_substitution(server):
    """VERDICT r7 ask #1 (gateway half): whitelisted housekeeping
    through the JDBC gate neither flushes the result cache nor opens a
    taint, and answer_jdbc classifies it as benign passthrough so the
    proxy keeps the connection substitution-clean."""
    from sparksql_server_spark.server import client_request

    q = "SELECT count(*) AS n FROM region"
    client_request(server.address, {"sql": q})
    assert client_request(server.address, {"sql": q}).get("cached") is True
    for cmd in (
        "USE `default`",
        "use default",
        "SET",
        "SET -v",
        "SET hive.server2.thrift.resultset.max.fetch.size",
        "SET hive.server2.thrift.resultset.max.fetch.size=500",
        "RESET",
    ):
        server.prime(cmd)
        assert server.answer_jdbc(cmd) == {"passthrough": "benign"}, cmd
    # housekeeping left the cached entry alone
    assert client_request(server.address, {"sql": q}).get("cached") is True
    # non-benign commands still classify as demoting commands
    assert server.answer_jdbc("USE warehouse2") == {"passthrough": "command"}
    assert server.answer_jdbc("SET spark.sql.ansi.enabled=true") == {
        "passthrough": "command"
    }


def test_jdbc_command_taint_blocks_caching_in_the_window(spark):
    """ADVICE r6 + review r7: prime() flushes BEFORE the JDBC command
    executes on HiveServer2, and a fixed re-flush timer alone reopens
    the window for any command that outlives it. The write-set taint
    closes it in the safe direction: while the taint is live, queries
    READING the written table execute but are not cached (their input
    may reflect pre- or mid-command state); unrelated tables cache
    normally; after the taint expires, caching resumes."""
    from sparksql_server_spark.server import WorkSharingServer, client_request

    srv = WorkSharingServer(
        spark, SF_DIR, window_size=1, max_wait=0.1,
        jdbc_command_reflush_seconds=0.1,
        jdbc_command_taint_seconds=2.0,
    )
    srv.start()
    try:
        q = "SELECT count(*) AS n FROM region"
        q_other = "SELECT count(*) AS n FROM nation"
        # JDBC command arrives at the gate (flush #1 fires now; the
        # command itself would execute on HiveServer2 AFTER this)
        srv.prime("REFRESH TABLE region")
        # let the short re-flush timer pass so its generation bump
        # cannot race the puts this test asserts on
        time.sleep(0.3)
        # a racing gateway query over the WRITTEN table runs fine but
        # its result is refused by the taint — no stale entry can form
        # no matter how long HiveServer2 takes
        client_request(srv.address, {"sql": q})
        assert "cached" not in client_request(srv.address, {"sql": q})
        # an unrelated table is untouched by the scoped taint
        client_request(srv.address, {"sql": q_other})
        assert client_request(srv.address, {"sql": q_other}).get("cached") is True
        # after the taint horizon, the written table caches again
        time.sleep(2.1)
        client_request(srv.address, {"sql": q})
        assert client_request(srv.address, {"sql": q}).get("cached") is True
    finally:
        srv.shutdown()
        srv.executor.cache.clear()


# -- round 10 (VERDICT r9 ask #7): generative interleaving gate --------------
#
# The result cache's interaction surface with the merge path grew three
# rounds running (merged members seed the cache under their original
# SQL; derived tables, mirrored SETs and deadline pools all route
# through the same batch) while the cache tests stayed example-based.
# This pool interleaves MERGED BATCHES (same-signature aggregations
# submitted concurrently into one window), CACHE HITS (repeat texts)
# and INVALIDATING COMMANDS (OR REPLACE of a temp view the query pool
# reads), asserting after every operation that the served result —
# cached or fresh, merged or direct — equals an independent
# spark.sql() run against the CURRENT catalog state.

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# same-signature family (table + grouping keys match => one MRShare
# signature): exact-typed aggregates only — merged and direct plans may
# legitimately differ in float summation order, which is not what this
# gate is for
_MERGE_FAMILY = [
    "SELECT l_returnflag, l_linestatus, count(*) AS c FROM lineitem"
    " GROUP BY l_returnflag, l_linestatus",
    "SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sq FROM lineitem"
    " WHERE l_discount > 0.02 GROUP BY l_returnflag, l_linestatus",
    "SELECT l_returnflag, l_linestatus, max(l_extendedprice) AS mx FROM lineitem"
    " WHERE l_quantity >= 25 GROUP BY l_returnflag, l_linestatus",
    "SELECT l_returnflag, l_linestatus, min(l_shipdate) AS mn FROM lineitem"
    " WHERE l_linenumber = 1 GROUP BY l_returnflag, l_linestatus",
    "SELECT l_returnflag, l_linestatus, count(DISTINCT l_suppkey) AS ds"
    " FROM lineitem GROUP BY l_returnflag, l_linestatus",
]
# reads that observe the command pool's temp-view shadow
_NATION_QS = [
    "SELECT count(*) AS n FROM nation",
    "SELECT max(n_nationkey) AS m FROM nation",
    "SELECT n_regionkey, count(*) AS n FROM nation GROUP BY n_regionkey",
]
_NATION_SRC = f"parquet.`{SF_DIR}/nation.parquet`"
_COMMANDS = [
    f"CREATE OR REPLACE TEMP VIEW nation AS SELECT * FROM {_NATION_SRC}"
    f" WHERE n_regionkey <= {k}"
    for k in (0, 1, 3)
] + [f"CREATE OR REPLACE TEMP VIEW nation AS SELECT * FROM {_NATION_SRC}"]

_EXERCISED = {"hits": 0, "merges": 0, "cmds": 0}

_op = st.one_of(
    st.tuples(
        st.just("batch"),
        st.lists(
            st.sampled_from(range(len(_MERGE_FAMILY))),
            min_size=2, max_size=3, unique=True,
        ),
    ),
    st.tuples(
        st.just("q"),
        st.sampled_from(range(len(_MERGE_FAMILY) + len(_NATION_QS))),
    ),
    st.tuples(st.just("cmd"), st.sampled_from(range(len(_COMMANDS)))),
)


def _expected(spark, q):
    return sorted(tuple(r) for r in spark.sql(q).collect())


def _check(spark, resp, q, exp):
    __tracebackhide__ = True
    assert resp.get("status") == "done", (q, resp.get("error"))
    if resp.get("cached"):
        _EXERCISED["hits"] += 1
    got = sorted(tuple(r) for r in resp["rows"])
    assert got == exp, (q, resp.get("cached"), got[:3], exp[:3])


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(_op, min_size=3, max_size=8))
def test_cache_vs_merge_interleaving_property(spark, ops):
    import threading

    from sparksql_server_spark.catalog import register_tables

    srv = WorkSharingServer(spark, SF_DIR, window_size=1, max_wait=5.0).start()
    srv.executor.mrshare_min_bytes = 0
    try:
        for kind, arg in ops:
            if kind == "batch":
                qs = [_MERGE_FAMILY[i] for i in arg]
                exps = {q: _expected(spark, q) for q in qs}
                merged_before = srv.executor.stats["mrshare_plans"]
                srv.batcher.window_size = len(qs)
                resps: dict[str, dict] = {}
                ts = [
                    threading.Thread(
                        target=lambda q=q: resps.__setitem__(
                            q, srv.handle_request({"sql": q})
                        )
                    )
                    for q in qs
                ]
                for t in ts:
                    t.start()
                for t in ts:
                    t.join(timeout=300)
                srv.batcher.window_size = 1
                for q in qs:
                    _check(spark, resps[q], q, exps[q])
                _EXERCISED["merges"] += (
                    srv.executor.stats["mrshare_plans"] - merged_before
                )
            elif kind == "q":
                pool = _MERGE_FAMILY + _NATION_QS
                q = pool[arg]
                exp = _expected(spark, q)
                _check(spark, srv.handle_request({"sql": q}), q, exp)
            else:
                _EXERCISED["cmds"] += 1
                resp = srv.handle_request({"sql": _COMMANDS[arg]})
                assert resp.get("status") == "done", resp
        # closing sweep: every pool member must still serve rows equal
        # to an independent run against the CURRENT catalog state
        for q in _MERGE_FAMILY + _NATION_QS:
            _check(spark, srv.handle_request({"sql": q}), q, _expected(spark, q))
    finally:
        srv.shutdown()
        srv.executor.cache.clear()
        register_tables(spark, SF_DIR)  # restore the real nation view


def test_cache_vs_merge_interleaving_pool_was_not_vacuous():
    """Runs after the property pool (file order): the generated
    interleavings must actually have exercised cache hits, MRShare
    merges AND invalidating commands — an equality gate over paths
    that never fire proves nothing."""
    assert _EXERCISED["hits"] > 0, _EXERCISED
    assert _EXERCISED["merges"] > 0, _EXERCISED
    assert _EXERCISED["cmds"] > 0, _EXERCISED


def test_select_shape_semantic_keys():
    """Round 12: plain projection/selection statements (no aggregation)
    key by the spelling-insensitive select shape — conjunct order,
    IN-vs-OR, qualifier spelling, and join operand order hit ONE
    entry; anything observable (item order, output-name case, LIMIT
    value, ORDER BY direction) keys apart; DISTINCT / star / OFFSET /
    window / subquery shapes keep the text key."""
    K = lambda s: ResultCache.key(None, s)  # noqa: E731
    assert K(
        "SELECT r_regionkey, r_name FROM region"
        " WHERE r_regionkey > 1 AND r_name <> 'ASIA' ORDER BY r_regionkey"
    ) == K(
        "select r_regionkey, r_name from region"
        " where 'ASIA' <> r_name and 1 < r_regionkey order by r_regionkey ASC"
    )
    assert K(
        "SELECT o_orderkey FROM orders WHERE o_orderstatus IN ('O','F')"
    ) == K(
        "SELECT o_orderkey FROM orders"
        " WHERE o_orderstatus = 'F' OR o_orderstatus = 'O'"
    )
    # single-table alias qualifiers are unobservable
    assert K("SELECT c.c_name AS n FROM customer c WHERE c.c_acctbal > 100") == K(
        "SELECT c_name AS n FROM customer WHERE 100 < c_acctbal"
    )
    # join operand order with verbatim items
    assert K(
        "SELECT o_orderpriority AS p FROM orders JOIN lineitem"
        " ON o_orderkey = l_orderkey WHERE l_tax < 0.05"
    ) == K(
        "SELECT o_orderpriority AS p FROM lineitem JOIN orders"
        " ON l_orderkey = o_orderkey WHERE 0.05 > l_tax"
    )
    # observables key apart
    assert K("SELECT r_name FROM region") != K("SELECT R_NAME FROM region")
    assert K("SELECT r_name, r_regionkey FROM region") != K(
        "SELECT r_regionkey, r_name FROM region"
    )
    assert K("SELECT r_name FROM region LIMIT 3") != K(
        "SELECT r_name FROM region LIMIT 4"
    )
    assert K("SELECT r_name FROM region ORDER BY r_name") != K(
        "SELECT r_name FROM region ORDER BY r_name DESC"
    )
    # unaliased expression names are case-faithful but whitespace-blind
    assert K("SELECT r_regionkey+1 FROM region") == K(
        "SELECT r_regionkey + 1 FROM region"
    )
    assert K("SELECT r_regionkey + 1 FROM region") != K(
        "SELECT R_REGIONKEY + 1 FROM region"
    )
    # non-shape statements keep text keys (strings, not tuples);
    # window OVER items ADMIT (see test_window_items_key_semantically)
    for q in (
        "SELECT * FROM region",
        "SELECT DISTINCT r_name FROM region",
        "SELECT r_name FROM region OFFSET 2",
        "SELECT (SELECT max(r_regionkey) FROM region) AS m FROM region",
        "SELECT r_name FROM region"
        " WHERE r_regionkey IN (SELECT n_regionkey FROM nation)",
    ):
        assert isinstance(K(q)[1], str), q


def test_select_respelling_served_from_cache(server):
    q1 = (
        "SELECT o_orderkey, o_totalprice FROM orders"
        " WHERE o_orderstatus IN ('O','F') AND o_totalprice > 1000"
        " ORDER BY o_orderkey LIMIT 20"
    )
    q2 = (
        "select o_orderkey, o_totalprice from orders"
        " where 1000 < o_totalprice"
        " and (o_orderstatus = 'F' or o_orderstatus = 'O')"
        " order by o_orderkey ASC limit 20"
    )
    first = client_request(server.address, {"sql": q1})
    assert first["status"] == "done" and "cached" not in first
    second = client_request(server.address, {"sql": q2})
    assert second["status"] == "done" and second.get("cached") is True
    assert second["rows"] == first["rows"]
    assert second["columns"] == first["columns"]


def test_limit_subsumption_unit():
    """Round 12: a semantic-key miss differing ONLY in a smaller LIMIT
    serves the cached rows' prefix — an un-LIMITed source serves any
    LIMIT, a LIMIT-m source serves n <= m, never the reverse; text
    keys never subsume; namespaces stay disjoint."""
    rc = ResultCache(max_entries=8, ttl_seconds=60)
    base = "SELECT r_regionkey AS k FROM region ORDER BY r_regionkey"
    rows20 = [[i] for i in range(20)]
    rc.put(
        ResultCache.key(None, base + " LIMIT 20"),
        {"status": "done", "rows": rows20, "n_rows": 20, "columns": ["k"]},
    )
    out = rc.get(ResultCache.key(None, base + " LIMIT 5"))
    assert out is not None and out["rows"] == rows20[:5] and out["n_rows"] == 5
    assert rc.limit_subsumed_hits == 1
    # a LARGER limit must miss (the source may have clipped rows 21+)
    assert rc.get(ResultCache.key(None, base + " LIMIT 30")) is None
    # an un-LIMITed source serves any limit, even above its row count
    rc.put(
        ResultCache.key(None, base),
        {"status": "done", "rows": rows20, "n_rows": 20, "columns": ["k"]},
    )
    out = rc.get(ResultCache.key(None, base + " LIMIT 30"))
    assert out is not None and out["rows"] == rows20 and out["n_rows"] == 20
    # the cached source entry must not be mutated by slicing
    full = rc.get(ResultCache.key(None, base + " LIMIT 20"))
    assert full["rows"] == rows20 and full["n_rows"] == 20
    # respelled smaller-limit spelling subsumes too (semantic base)
    out = rc.get(
        ResultCache.key(
            None,
            "select r_regionkey as k from region order by r_regionkey"
            " ASC limit 3",
        )
    )
    assert out is not None and out["rows"] == rows20[:3]
    # namespaces stay disjoint
    assert rc.get(ResultCache.key("s1", base + " LIMIT 5")) is None
    # text keys never subsume
    rc.put(("", "some text key"), {"status": "done", "rows": rows20})
    assert rc.get(("", "some text key limit 5")) is None


def test_limit_subsumption_served_from_server(server):
    q_big = (
        "SELECT o_orderkey, o_totalprice FROM orders"
        " WHERE o_totalprice > 1000"
        " ORDER BY o_orderkey LIMIT 20"
    )
    q_small = (
        "select o_orderkey, o_totalprice from orders"
        " where 1000 < o_totalprice"
        " order by o_orderkey ASC limit 7"
    )
    first = client_request(server.address, {"sql": q_big})
    assert first["status"] == "done" and "cached" not in first
    second = client_request(server.address, {"sql": q_small})
    assert second["status"] == "done" and second.get("cached") is True
    assert second["rows"] == first["rows"][:7]
    assert second["columns"] == first["columns"]
    stats = client_request(server.address, {"server_stats": True})["stats"]
    assert stats["result_cache_limit_subsumed_hits"] >= 1


def test_limit_subsumption_after_exact_entry_expires():
    """Round-12 review: a TTL-expired exact entry must fall through to
    subsumption — the request is served exactly as it would be with no
    stale entry present."""
    import time as _time

    rc = ResultCache(max_entries=8, ttl_seconds=0.2)
    base = "SELECT r_regionkey AS k FROM region ORDER BY r_regionkey"
    rows = [[i] for i in range(10)]
    rc.put(
        ResultCache.key(None, base + " LIMIT 5"),
        {"status": "done", "rows": rows[:5], "n_rows": 5, "columns": ["k"]},
    )
    _time.sleep(0.25)  # exact entry expires
    rc.put(
        ResultCache.key(None, base),
        {"status": "done", "rows": rows, "n_rows": 10, "columns": ["k"]},
    )
    out = rc.get(ResultCache.key(None, base + " LIMIT 5"))
    assert out is not None and out["rows"] == rows[:5] and out["n_rows"] == 5
    assert rc.limit_subsumed_hits == 1


def test_window_items_key_semantically():
    """Round 12: window (OVER) items admit to the SELECT shape — the
    whole spec rides the item canon (any spec difference keys apart);
    the merge path keeps declining OVER (merging changes row
    multiplicity, which changes window results)."""
    K = lambda s: ResultCache.key(None, s)  # noqa: E731
    a = (
        "SELECT o_orderkey, row_number() OVER (ORDER BY o_totalprice DESC)"
        " AS rn FROM orders WHERE o_orderstatus IN ('O','F')"
    )
    b = (
        "select o_orderkey, ROW_NUMBER() over ( order by o_totalprice DESC )"
        " AS rn from orders where o_orderstatus = 'F' or o_orderstatus = 'O'"
    )
    assert K(a) == K(b) and not isinstance(K(a)[1], str)
    assert K(a) != K(a.replace("DESC", "ASC"))
    # windowed aggregations, QUALIFY, and named WINDOW stay on text keys
    for q in (
        "SELECT o_orderpriority, count(*) AS n,"
        " rank() OVER (ORDER BY count(*)) AS r"
        " FROM orders GROUP BY o_orderpriority",
        "SELECT a, row_number() OVER (ORDER BY a) AS rn FROM t"
        " QUALIFY rn = 1",
        "SELECT a, count(*) OVER w AS c FROM t WINDOW w AS (PARTITION BY a)",
    ):
        assert isinstance(K(q)[1], str), q


def test_window_respelling_served_from_cache(server):
    q1 = (
        "SELECT o_orderkey,"
        " rank() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rk"
        " FROM orders WHERE o_totalprice > 1000 ORDER BY rk LIMIT 10"
    )
    q2 = (
        "select o_orderkey,"
        " RANK() over (order by o_totalprice DESC, o_orderkey) as rk"
        " from orders where 1000 < o_totalprice order by rk ASC limit 10"
    )
    first = client_request(server.address, {"sql": q1})
    assert first["status"] == "done" and "cached" not in first
    second = client_request(server.address, {"sql": q2})
    assert second["status"] == "done" and second.get("cached") is True
    assert second["rows"] == first["rows"]


def test_limit_subsumption_on_aggregation_shape():
    """The subsumption rule is shape-agnostic: "sem" keys also carry
    LIMIT as the final element, so a cached un-LIMITed aggregation
    serves its LIMITed respellings."""
    rc = ResultCache(max_entries=8, ttl_seconds=60)
    base = (
        "SELECT l_returnflag, count(*) AS n FROM lineitem"
        " GROUP BY l_returnflag ORDER BY n DESC"
    )
    rows = [["A", 30], ["B", 20], ["C", 10]]
    rc.put(
        ResultCache.key(None, base),
        {"status": "done", "rows": rows, "n_rows": 3, "columns": ["l_returnflag", "n"]},
    )
    out = rc.get(
        ResultCache.key(
            None,
            "select l_returnflag, COUNT( * ) as n from lineitem"
            " group by l_returnflag order by n DESC limit 2",
        )
    )
    assert out is not None and out["rows"] == rows[:2] and out["n_rows"] == 2
    assert rc.limit_subsumed_hits == 1


def test_comment_markers_decline_semantic_keys():
    """Round-12 review: comment markers are unmodeled by the canon
    lexer — whitespace collapse could fuse `a - -1` toward `a --1`,
    whose `--…` Spark lexes as a line comment (a different statement).
    Any marker outside string literals declines to text keys, where
    byte-distinct spellings can never collide."""
    K = lambda s: ResultCache.key(None, s)  # noqa: E731
    assert not isinstance(K("SELECT a - -1 AS x FROM t")[1], str)
    assert isinstance(K("SELECT a --1 AS x FROM t")[1], str)
    assert K("SELECT a - -1 AS x FROM t") != K("SELECT a --1 AS x FROM t")
    assert isinstance(K("SELECT a AS x /* c */ FROM t")[1], str)
    # markers inside string literals are data, not comments
    assert not isinstance(
        K("SELECT o_orderkey FROM orders WHERE o_comment <> 'a--b'")[1], str
    )


def test_order_item_asc_parity_after_non_word_char():
    """Round-12 review: the grammar-default trailing ASC strips from
    the RAW order item, so parenthesized and window order items get
    the same ASC-is-default parity as bare columns."""
    K = lambda s: ResultCache.key(None, s)  # noqa: E731
    assert K("SELECT o_orderkey FROM orders ORDER BY (o_orderkey + 1)") == K(
        "SELECT o_orderkey FROM orders ORDER BY (o_orderkey + 1) ASC"
    )
    # a bare column named `asc` is not stripped to emptiness
    assert K("SELECT o_orderkey FROM orders ORDER BY asc") is not None
