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
HiveServer2 unmodified and in order. The only intervention is TIMING —
a frame carrying an ``ExecuteStatement`` call is held until the
gateway's window has admitted the statement as a prime-only job and the
batch (detection + cache rewrite) has run. Concurrent dashboard clients
therefore land in ONE window batch, their shared scan is detected and
cached ONCE, and each client's own HiveServer2 execution — the single
real execution per statement, there is no double-run — reads the
InMemoryRelation. The MERGE rewrite stays gateway-only by construction:
a pass-through cannot substitute a rewritten result into the Thrift
response stream (HiveServer2 computes its own answer), so merged
aggregation still requires the JSON gateway; the forgone increment is
measured in server/thrift.py's docstring.

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


def parse_call(buf: bytes, pos: int = 0) -> Optional[tuple[int, str, Optional[str]]]:
    """Parse one strict-TBinaryProtocol message starting at ``pos``.

    Returns ``(end, method_name, statement)`` — ``statement`` is the
    SQL text when the method is ExecuteStatement, else None — or None
    when the buffer ends mid-message (read more and retry). Raises
    ValueError on bytes that are not a strict Thrift message (caller
    demotes to blind pass-through)."""
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
        _need(buf, pos, 4)  # seqid
        pos += 4
        if name == "ExecuteStatement":
            pos, stmt = _statement_from_args(buf, pos)
        else:
            pos = _skip(buf, pos, _STRUCT)
            stmt = None
        return pos, name, stmt
    except _Incomplete:
        return None


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


class JdbcLineProxy:
    """TCP pass-through in front of a HiveServer2 port that gates
    ExecuteStatement frames through ``gate(sql)`` before forwarding.

    ``gate`` blocks until the statement has been through the sharing
    window (WorkSharingServer.prime). It must never raise — but if it
    does, the frame is forwarded anyway (sharing is best-effort; the
    client's query must not be)."""

    def __init__(
        self,
        upstream: tuple[str, int],
        gate: Callable[[str], None],
        host: str = "127.0.0.1",
        port: int = 0,
    ) -> None:
        self.upstream = upstream
        self.gate = gate
        # counters are read-modify-write from concurrent handler/pump
        # threads; dict += is not atomic in CPython (ADVICE r6)
        self._stats_lock = threading.Lock()
        self.stats = {
            "connections": 0,
            "statements_gated": 0,
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
                try:
                    t = threading.Thread(
                        target=outer._pump_blind,
                        args=(up, self.request),
                        daemon=True,
                    )
                    t.start()
                    outer._pump_client(self.request, up)
                    t.join(timeout=5)
                finally:
                    for s in (up, self.request):
                        try:
                            s.close()
                        except OSError:
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
    def _pump_blind(src: socket.socket, dst: socket.socket) -> None:
        """Upstream→client: verbatim copy (responses are never held)."""
        try:
            while True:
                chunk = src.recv(1 << 16)
                if not chunk:
                    break
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

    def _pump_client(self, client: socket.socket, up: socket.socket) -> None:
        """Client→upstream: forward complete protocol units in order,
        holding any unit that carries ExecuteStatement until the gate
        releases it. Mode fixes on the first byte: 0x80 = raw strict
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
                buf, demoted = self._drain(buf, up, mode)
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

    def _drain(self, buf: bytes, up: socket.socket, mode: str) -> tuple[bytes, bool]:
        """Forward every COMPLETE unit at the head of ``buf``; returns
        (unconsumed tail, demoted). ``demoted`` means the tail is not
        the protocol we thought — the caller flushes it and goes blind.
        Forwarded bytes are consumed from the tail immediately, so a
        mid-stream demotion can never re-send them."""
        while buf:
            if mode == "raw":
                try:
                    parsed = parse_call(buf, 0)
                except ValueError:
                    return buf, True
                if parsed is None:
                    break  # incomplete message
                end, name, stmt = parsed
                if name == "ExecuteStatement" and stmt:
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
            for stmt in statements_in_frame(buf[4 : 4 + n]):
                self._gate_safely(stmt)
            up.sendall(buf[: 4 + n])
            buf = buf[4 + n :]
        return buf, False
