"""Minimal threaded HTTP framework (stdlib-only).

The reference serves through FastAPI/uvicorn — neither is in this image, and
an asyncio loop would anyway be the wrong shape here: the reference calls the
blocking analysis inside async handlers, stalling its event loop for the
whole video (server/server.py:611, SURVEY.md §2.3).  A thread-per-request
server with an explicit device lock keeps the API responsive while one
analysis owns the TPU.
"""

from __future__ import annotations

import json
import logging
import mimetypes
import re
import threading
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Callable, Dict, List, Optional, Tuple
from urllib.parse import parse_qs, urlparse

logger = logging.getLogger(__name__)

CORS_HEADERS = {
    "Access-Control-Allow-Origin": "*",
    "Access-Control-Allow-Credentials": "true",
    "Access-Control-Allow-Methods": "*",
    "Access-Control-Allow-Headers": "*",
}


@dataclass
class Request:
    method: str
    path: str
    query: Dict[str, str]
    body: bytes = b""
    path_params: Dict[str, str] = field(default_factory=dict)

    def json(self) -> Any:
        if not self.body:
            return None
        return json.loads(self.body.decode("utf-8"))


@dataclass
class Response:
    status: int = 200
    content: bytes = b""
    content_type: str = "application/json"
    headers: Dict[str, str] = field(default_factory=dict)

    @classmethod
    def json(cls, payload: Any, status: int = 200) -> "Response":
        return cls(
            status=status,
            content=json.dumps(payload).encode("utf-8"),
            content_type="application/json",
        )

    @classmethod
    def html(cls, text: str, status: int = 200) -> "Response":
        return cls(status=status, content=text.encode("utf-8"),
                   content_type="text/html; charset=utf-8")

    @classmethod
    def error(cls, detail_or_payload, status: int) -> "Response":
        if isinstance(detail_or_payload, str):
            payload = {"detail": detail_or_payload}
        else:
            payload = detail_or_payload
        return cls.json(payload, status=status)

    @classmethod
    def file(cls, path: str, media_type: Optional[str] = None) -> "Response":
        if media_type is None:
            media_type = mimetypes.guess_type(path)[0] or "application/octet-stream"
        with open(path, "rb") as f:
            return cls(status=200, content=f.read(), content_type=media_type)


Handler = Callable[[Request], Response]


class Router:
    """Tiny pattern router: "/view/{result_id}" style path params."""

    def __init__(self):
        self._routes: List[Tuple[str, re.Pattern, Handler]] = []

    def add(self, method: str, pattern: str, handler: Handler) -> None:
        regex = re.sub(r"\{(\w+)\}", r"(?P<\1>[^/]+)", pattern)
        self._routes.append((method.upper(), re.compile(f"^{regex}$"), handler))

    def route(self, method: str, path: str) -> Optional[Tuple[Handler, Dict[str, str]]]:
        for m, regex, handler in self._routes:
            if m != method.upper():
                continue
            match = regex.match(path)
            if match:
                return handler, match.groupdict()
        return None

    def dispatch(self, request: Request) -> Response:
        found = self.route(request.method, request.path)
        if found is None:
            return Response.error("Not Found", 404)
        handler, params = found
        request.path_params = params
        try:
            return handler(request)
        except Exception as e:  # uniform 500s, like the reference's handlers
            logger.exception("handler error on %s %s", request.method, request.path)
            return Response.error(f"Internal server error: {e}", 500)


class _HTTPHandler(BaseHTTPRequestHandler):
    router: Router = None  # set by make_server
    protocol_version = "HTTP/1.1"

    def _respond(self, resp: Response) -> None:
        self.send_response(resp.status)
        self.send_header("Content-Type", resp.content_type)
        self.send_header("Content-Length", str(len(resp.content)))
        for k, v in {**CORS_HEADERS, **resp.headers}.items():
            self.send_header(k, v)
        self.end_headers()
        self.wfile.write(resp.content)

    def _handle(self, method: str) -> None:
        parsed = urlparse(self.path)
        query = {k: v[0] for k, v in parse_qs(parsed.query).items()}
        length = int(self.headers.get("Content-Length") or 0)
        body = self.rfile.read(length) if length else b""
        request = Request(method=method, path=parsed.path, query=query, body=body)
        self._respond(self.router.dispatch(request))

    def do_GET(self):
        self._handle("GET")

    def do_POST(self):
        self._handle("POST")

    def do_OPTIONS(self):
        self._respond(Response(status=204, content=b"", content_type="text/plain"))

    def log_message(self, fmt, *args):  # route through logging, not stderr
        logger.info("%s - %s", self.address_string(), fmt % args)


def make_server(router: Router, host: str, port: int) -> ThreadingHTTPServer:
    handler_cls = type("BoundHTTPHandler", (_HTTPHandler,), {"router": router})
    return ThreadingHTTPServer((host, port), handler_cls)


def serve_forever_in_thread(server: ThreadingHTTPServer) -> threading.Thread:
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return thread
