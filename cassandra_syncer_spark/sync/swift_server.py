"""Loopback OpenStack-Swift/Cloud-Files REST server for target testing.

The reference's primary deployment target is Rackspace Cloud Files over
HTTPS (vendored node-cloudfiles: auth ``core.js:83-116``, container ops
``:118-161``, paginated listing ``:238-310``, streamed GET ``:336-368``,
PUT with response-ETag verification ``:377-418``).  Cloud Files IS the
OpenStack Swift API, which is publicly documented — this module
implements the subset those call sites use, over the repo's
:class:`~cassandra_syncer_spark.sync.object_store.ObjectStore`, so the
HTTP target (``http_target.py``) can be exercised against real request/
response semantics on 127.0.0.1 (the sandbox has no external network).

Endpoints (TempAuth v1.0 + storage API v1):

- ``GET /auth/v1.0``  with ``X-Auth-User``/``X-Auth-Key`` headers →
  ``X-Storage-Url`` + ``X-Auth-Token`` (the legacy auth flow the
  reference's ``setAuth`` performs).
- ``PUT /v1/<acct>/<container>`` → 201 (create), idempotent 202 on reput.
- ``GET /v1/<acct>?format=json`` → container list.
- ``GET /v1/<acct>/<container>?format=json&prefix=&marker=&limit=`` →
  paginated object listing (Swift field names: ``name bytes hash
  last_modified content_type``).
- ``PUT /v1/<acct>/<container>/<name>`` → store body (chunk-spooled, never
  fully buffered), verify optional request ``ETag`` (422 on mismatch —
  Swift's documented unprocessable-entity response), reply 201 with the
  computed ``ETag`` header.
- ``GET/HEAD /v1/<acct>/<container>/<name>`` → bytes/metadata with
  ``ETag``, ``Content-Length``, ``Content-Type``; 404 when absent.
- ``DELETE /v1/<acct>/<container>/<name>`` → 204, 404 when absent.

Every storage request must carry the ``X-Auth-Token`` issued by the auth
endpoint; anything else is 401 — so client code is forced through the
same auth-then-storage-url flow a real store requires.

Deliberate exclusion — the CDN-container variant.  The vendored client
also exposes Rackspace's CDN management surface (``getContainers(cdn=
true)`` listing CDN-enabled containers and the per-container ``cdnUrl``
attribute — ``core.js:85-126,452``): a second service endpoint
(``X-CDN-Management-Url``) whose only job is toggling/inspecting edge
caching for PUBLIC content delivery.  Nothing in the reference's
backup/restore dataflow calls it (``bin/cassandra-syncer`` and
``bin/cassandra-syncer-restore`` only auth, list, get, put, delete), it
is Rackspace-proprietary rather than OpenStack-Swift-standard, and a
backup store is by definition not publicly served — so this server
intentionally does NOT implement it.  Documented here (and in SURVEY.md
§0) so the one un-mirrored reference surface is an explicit decision,
not an omission.
"""

from __future__ import annotations

import hashlib
import json
import os
import secrets
import tempfile
import threading
from datetime import datetime, timezone
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, unquote, urlsplit

from cassandra_syncer_spark.sync.object_store import ObjectStore

ACCOUNT = "AUTH_test"
_SPOOL_CHUNK = 8 << 20


def _iso(ms: int) -> str:
    return (
        datetime.fromtimestamp(ms / 1000.0, tz=timezone.utc)
        .replace(tzinfo=None)
        .isoformat()
    )


class _Handler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"
    server_version = "cassandra-syncer-swift/1.0"

    # quiet: tests assert on results, not on an access log
    def log_message(self, fmt, *args):  # noqa: D102
        pass

    # -- helpers ---------------------------------------------------------

    @property
    def store(self) -> ObjectStore:
        return self.server.store  # type: ignore[attr-defined]

    def _reply(self, code: int, body: bytes = b"", headers: dict | None = None) -> None:
        self.send_response(code)
        for k, v in (headers or {}).items():
            self.send_header(k, v)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        if body and self.command != "HEAD":
            self.wfile.write(body)

    def _authed(self) -> bool:
        return self.headers.get("X-Auth-Token") == self.server.token  # type: ignore[attr-defined]

    def _route(self):
        """→ ("auth", None, None) | ("storage", container|None, name|None) | None."""
        parts = urlsplit(self.path)
        segs = [unquote(s) for s in parts.path.split("/") if s != ""]
        if segs[:2] == ["auth", "v1.0"]:
            return ("auth", None, None)
        if len(segs) >= 2 and segs[0] == "v1" and segs[1] == ACCOUNT:
            container = segs[2] if len(segs) >= 3 else None
            name = "/".join(segs[3:]) if len(segs) >= 4 else None
            return ("storage", container, name)
        return None

    def _drain_body_to_tmp(self) -> tuple[str, str, int]:
        """Spool the request body to a temp file in chunks (a multi-GB
        SSTable upload must never buffer in server memory); returns
        (tmp_path, md5_hex, n_bytes)."""
        length = int(self.headers.get("Content-Length", "0"))
        h = hashlib.md5()
        fd, tmp = tempfile.mkstemp(prefix=".swift-upload-")
        n = 0
        with os.fdopen(fd, "wb") as out:
            while n < length:
                chunk = self.rfile.read(min(_SPOOL_CHUNK, length - n))
                if not chunk:
                    break
                h.update(chunk)
                out.write(chunk)
                n += len(chunk)
        return tmp, h.hexdigest(), n

    # -- verbs -----------------------------------------------------------

    def do_GET(self):  # noqa: N802
        route = self._route()
        if route is None:
            return self._reply(404)
        kind, container, name = route
        if kind == "auth":
            srv = self.server  # type: ignore[assignment]
            if (
                self.headers.get("X-Auth-User") == srv.user
                and self.headers.get("X-Auth-Key") == srv.key
            ):
                return self._reply(
                    204,
                    headers={
                        "X-Storage-Url": f"http://{srv.server_address[0]}:{srv.server_address[1]}/v1/{ACCOUNT}",
                        "X-Auth-Token": srv.token,
                    },
                )
            return self._reply(401)
        if not self._authed():
            return self._reply(401)
        if container is None:  # account listing
            body = json.dumps(
                [{"name": c} for c in self.store.list_containers()]
            ).encode()
            return self._reply(200, body, {"Content-Type": "application/json"})
        if name is None:  # container listing
            if not self.store.container_exists(container):
                return self._reply(404)
            q = parse_qs(urlsplit(self.path).query)
            metas = self.store.list_objects(
                container,
                prefix=q.get("prefix", [""])[0],
                marker=q.get("marker", [""])[0],
                limit=int(q.get("limit", ["10000"])[0]),
            )
            body = json.dumps(
                [
                    {
                        "name": m["name"],
                        "bytes": m["bytes"],
                        "hash": m["etag"],
                        "last_modified": _iso(m["last_modified_ms"]),
                        "content_type": m["content_type"],
                    }
                    for m in metas
                ]
            ).encode()
            return self._reply(200, body, {"Content-Type": "application/json"})
        # object GET
        meta = self.store.stat_object(container, name)
        if meta is None:
            return self._reply(404)
        data = self.store.get_object(container, name)
        return self._reply(
            200,
            data,
            {"ETag": meta["etag"], "Content-Type": meta["content_type"]},
        )

    def do_HEAD(self):  # noqa: N802
        route = self._route()
        if route is None or route[0] != "storage":
            return self._reply(404)
        if not self._authed():
            return self._reply(401)
        _, container, name = route
        if name is None:
            return self._reply(204 if self.store.container_exists(container) else 404)
        meta = self.store.stat_object(container, name)
        if meta is None:
            return self._reply(404)
        self.send_response(200)
        self.send_header("ETag", meta["etag"])
        self.send_header("Content-Length", str(meta["bytes"]))
        self.send_header("Content-Type", meta["content_type"])
        self.send_header("X-Timestamp", str(meta["last_modified_ms"] / 1000.0))
        self.end_headers()

    def do_PUT(self):  # noqa: N802
        route = self._route()
        if route is None or route[0] != "storage":
            return self._reply(404)
        if not self._authed():
            return self._reply(401)
        _, container, name = route
        if name is None:
            existed = self.store.container_exists(container)
            self.store.create_container(container)
            return self._reply(202 if existed else 201)
        tmp, md5, _n = self._drain_body_to_tmp()
        try:
            want = self.headers.get("ETag")
            if want is not None and want.strip('"').lower() != md5:
                # Swift's documented integrity response for a bad ETag
                return self._reply(422)
            etag, _stored = self.store.put_file(
                container,
                name,
                tmp,
                content_type=self.headers.get(
                    "Content-Type", "application/octet-stream"
                ),
            )
        finally:
            try:
                os.remove(tmp)
            except FileNotFoundError:
                pass
        return self._reply(201, headers={"ETag": etag})

    def do_DELETE(self):  # noqa: N802
        route = self._route()
        if route is None or route[0] != "storage":
            return self._reply(404)
        if not self._authed():
            return self._reply(401)
        _, container, name = route
        if name is None:
            return self._reply(404)
        return self._reply(204 if self.store.delete_object(container, name) else 404)


class SwiftServer:
    """Threaded loopback Swift server over a filesystem-backed ObjectStore.

    Usage::

        srv = SwiftServer(root); srv.start()
        client = SwiftClient(srv.auth_url, user=srv.user, key=srv.key)
        ...
        srv.stop()
    """

    def __init__(self, root: str, user: str = "test:tester", key: str = "testing"):
        self.root = root
        self.user = user
        self.key = key
        self._httpd: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None

    def start(self) -> "SwiftServer":
        httpd = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
        httpd.daemon_threads = True
        httpd.store = ObjectStore(self.root)  # type: ignore[attr-defined]
        httpd.token = secrets.token_hex(16)  # type: ignore[attr-defined]
        httpd.user = self.user  # type: ignore[attr-defined]
        httpd.key = self.key  # type: ignore[attr-defined]
        self._httpd = httpd
        self._thread = threading.Thread(target=httpd.serve_forever, daemon=True)
        self._thread.start()
        return self

    @property
    def port(self) -> int:
        assert self._httpd is not None, "server not started"
        return self._httpd.server_address[1]

    @property
    def auth_url(self) -> str:
        return f"http://127.0.0.1:{self.port}/auth/v1.0"

    def stop(self) -> None:
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()
            self._httpd = None
