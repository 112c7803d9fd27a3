"""In-process fake of the Confluent Schema Registry REST API.

Implements the endpoints the engine's client uses — content-addressed
schema registration with per-subject version lists, id lookup, latest
lookup, and a compatibility check computed with the engine's own
structural :func:`can_read` — plus fault injection (``fail_first``: the
next N requests return HTTP 503) for exercising the client's retry path.
Listens on an ephemeral 127.0.0.1 port; no network leaves the process.
"""

from __future__ import annotations

import json
import threading
from contextlib import contextmanager
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class FakeRegistryState:
    def __init__(self) -> None:
        self.schemas: dict[int, str] = {}
        self.by_content: dict[str, int] = {}
        self.subjects: dict[str, list[tuple[int, int]]] = {}  # subject -> [(version, id)]
        self.next_id = 1
        self.fail_next = 0
        self.requests = 0
        self.lock = threading.Lock()

    def register(self, subject: str, schema: str) -> int:
        with self.lock:
            sid = self.by_content.get(schema)
            if sid is None:
                sid = self.next_id
                self.next_id += 1
                self.by_content[schema] = sid
                self.schemas[sid] = schema
            versions = self.subjects.setdefault(subject, [])
            if not versions or versions[-1][1] != sid:
                versions.append((len(versions) + 1, sid))
            return sid

    def latest(self, subject: str) -> tuple[int, int, str] | None:
        versions = self.subjects.get(subject)
        if not versions:
            return None
        version, sid = versions[-1]
        return version, sid, self.schemas[sid]


def _make_handler(state: FakeRegistryState):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # keep pytest output clean
            pass

        def _reply(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/vnd.schemaregistry.v1+json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _gate(self) -> bool:
            with state.lock:
                state.requests += 1
                if state.fail_next > 0:
                    state.fail_next -= 1
                    self._reply(503, {"error_code": 50301, "message": "injected"})
                    return False
            return True

        def do_GET(self):
            if not self._gate():
                return
            parts = self.path.strip("/").split("/")
            if parts[:2] == ["schemas", "ids"] and len(parts) == 3:
                sid = int(parts[2])
                schema = state.schemas.get(sid)
                if schema is None:
                    self._reply(404, {"error_code": 40403, "message": "Schema not found"})
                else:
                    self._reply(200, {"schema": schema})
                return
            if (
                len(parts) == 4
                and parts[0] == "subjects"
                and parts[2] == "versions"
                and parts[3] == "latest"
            ):
                got = state.latest(parts[1])
                if got is None:
                    self._reply(404, {"error_code": 40401, "message": "Subject not found"})
                else:
                    version, sid, schema = got
                    self._reply(
                        200,
                        {"subject": parts[1], "version": version, "id": sid, "schema": schema},
                    )
                return
            self._reply(404, {"error_code": 404, "message": f"no route {self.path}"})

        def do_POST(self):
            if not self._gate():
                return
            length = int(self.headers.get("Content-Length", "0"))
            body = json.loads(self.rfile.read(length).decode() or "{}")
            parts = self.path.strip("/").split("/")
            if len(parts) == 3 and parts[0] == "subjects" and parts[2] == "versions":
                sid = state.register(parts[1], body["schema"])
                self._reply(200, {"id": sid})
                return
            if (
                len(parts) == 5
                and parts[0] == "compatibility"
                and parts[1] == "subjects"
                and parts[3] == "versions"
                and parts[4] == "latest"
            ):
                from anglerfish_spark.sources.schema_registry import can_read

                got = state.latest(parts[2])
                if got is None:
                    self._reply(404, {"error_code": 40401, "message": "Subject not found"})
                    return
                _, _, latest_schema = got
                reasons = can_read(latest_schema, body["schema"])
                self._reply(200, {"is_compatible": not reasons})
                return
            self._reply(404, {"error_code": 404, "message": f"no route {self.path}"})

    return Handler


@contextmanager
def fake_registry():
    """Start a fake registry on an ephemeral port; yields (base_url, state)."""
    state = FakeRegistryState()
    server = ThreadingHTTPServer(("127.0.0.1", 0), _make_handler(state))
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        yield f"http://127.0.0.1:{server.server_address[1]}", state
    finally:
        server.shutdown()
        server.server_close()
