"""Client library for the gateway — what the reference's SimpleAppClient
is to its server (SimpleAppClient/src/main/scala/SimpleAppClient.scala:34-81),
minus the DAG/jar shipping: one persistent line-JSON TCP connection,
synchronous or fire-and-poll submission, per-client named session.
"""

from __future__ import annotations

import json
import socket
from typing import Any


class SparkSQLClient:
    """Persistent connection to a WorkSharingServer.

    >>> with SparkSQLClient(("127.0.0.1", 9991), session="alice") as c:
    ...     c.sql("CREATE TEMP VIEW mine AS SELECT 1 AS v")
    ...     c.sql("SELECT v FROM mine")["rows"]
    [[1]]
    """

    def __init__(
        self,
        address: tuple[str, int],
        session: str | None = None,
        timeout: float = 300.0,
    ) -> None:
        self.address = (address[0], int(address[1]))
        self.session = session
        self._sock = socket.create_connection(self.address, timeout=timeout)
        self._rfile = self._sock.makefile("rb")

    # -- core round-trip ---------------------------------------------------

    def request(self, req: dict[str, Any]) -> dict[str, Any]:
        if self.session is not None and "session" not in req:
            req = {**req, "session": self.session}
        self._sock.sendall((json.dumps(req) + "\n").encode())
        line = self._rfile.readline()
        if not line:
            raise ConnectionError("server closed the connection")
        return json.loads(line.decode())

    # -- convenience surface ----------------------------------------------

    def sql(self, sql: str, output: str | None = None, **props: Any) -> dict[str, Any]:
        """Run a statement and wait for its result."""
        req: dict[str, Any] = {"sql": sql}
        if output is not None:
            req["output"] = output
        if props:
            req["props"] = props
        return self.request(req)

    def submit(self, sql: str, **props: Any) -> int:
        """Fire-and-forget; returns the job id for :meth:`poll`."""
        reply = self.request({"sql": sql, "wait": False, "props": props or {}})
        if "id" not in reply:
            raise RuntimeError(reply.get("error", "submit failed"))
        return int(reply["id"])

    def poll(self, job_id: int) -> dict[str, Any]:
        return self.request({"status": job_id})

    def cancel(self, job_id: int) -> bool:
        reply = self.request({"cancel": job_id})
        return bool(reply.get("cancelled"))

    def explain(self, sql: str, mode: str = "formatted") -> str:
        reply = self.request({"explain": mode, "sql": sql})
        if reply.get("status") != "done":
            raise RuntimeError(reply.get("error", "explain failed"))
        return reply["plan"]

    # -- lifecycle ---------------------------------------------------------

    def close(self) -> None:
        try:
            self._rfile.close()
        finally:
            self._sock.close()

    def __enter__(self) -> "SparkSQLClient":
        return self

    def __exit__(self, *exc: object) -> None:
        self.close()
