"""Minimal REST server over a FulltextIndex — the role of the reference's
Rocket server (/root/reference/server/rocket_server.rs:197-235):

    POST /<db>/search        JSON request body (SURVEY.md §2.5 shape)
    GET  /<db>/search?query=...&top=10   query-string language
    GET  /<db>/suggest?query=...&field=text          (or fields=a,b → multi)
    GET  /<db>/_id/<doc_id>
    GET  /<db>/_idtree/<doc_id>   document reconstructed from the index
                                  (reference rocket_server.rs:205)

Stdlib-only (``http.server``); one Spark session serves all requests —
Spark's FAIR scheduler can be enabled for concurrent queries. This is a
driver-side convenience front end, not a cluster service mesh.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse


def make_handler(indices: dict):
    from veloci_spark.query import search_query
    from veloci_spark.search import (get_doc, read_data, search, suggest,
                                     suggest_multi)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _send(self, code: int, payload):
            body = json.dumps(payload, default=str).encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _index(self, db):
            idx = indices.get(db)
            if idx is None:
                self._send(404, {"error": f"unknown index: {db}"})
            return idx

        def do_POST(self):
            parts = urlparse(self.path).path.strip("/").split("/")
            if len(parts) == 2 and parts[1] == "search":
                idx = self._index(parts[0])
                if idx is None:
                    return
                n = int(self.headers.get("Content-Length", 0))
                try:
                    req = json.loads(self.rfile.read(n) or b"{}")
                    self._send(200, search(idx, req))
                except Exception as e:  # noqa: BLE001
                    self._send(400, {"error": str(e)})
                return
            self._send(404, {"error": "not found"})

        def do_GET(self):
            u = urlparse(self.path)
            parts = u.path.strip("/").split("/")
            q = {k: v[0] for k, v in parse_qs(u.query).items()}
            try:
                if len(parts) == 2 and parts[1] == "search":
                    idx = self._index(parts[0])
                    if idx is None:
                        return
                    kw = {"top": int(q.get("top", 10)),
                          "skip": int(q.get("skip", 0))}
                    if "fields" in q:   # restrict searched fields
                        kw["search_fields"] = q["fields"].split(",")
                    if "filter" in q:   # ids-only filter query (lev 0)
                        kw["filter_query"] = q["filter"]
                    self._send(200, search_query(idx, q["query"], **kw))
                    return
                if len(parts) == 2 and parts[1] == "suggest":
                    idx = self._index(parts[0])
                    if idx is None:
                        return
                    if "fields" in q:
                        out = suggest_multi(idx, q["fields"].split(","),
                                            q["query"], top=int(q.get("top", 10)))
                    else:
                        out = suggest(idx, q.get("field", "text"), q["query"],
                                      top=int(q.get("top", 10)))
                    self._send(200, {"suggestions": out})
                    return
                if len(parts) == 3 and parts[1] == "_idtree":
                    idx = self._index(parts[0])
                    if idx is None:
                        return
                    doc = read_data(idx, int(parts[2]))
                    if doc is None:
                        self._send(404, {"error": "no such doc"})
                    else:
                        doc.pop("html", None)
                        self._send(200, doc)
                    return
                if len(parts) == 3 and parts[1] == "_id":
                    idx = self._index(parts[0])
                    if idx is None:
                        return
                    doc = get_doc(idx, int(parts[2]))
                    if doc is None:
                        self._send(404, {"error": "no such doc"})
                    else:
                        doc.pop("html", None)  # binary not JSON-serializable
                        self._send(200, doc)
                    return
            except Exception as e:  # noqa: BLE001
                self._send(400, {"error": str(e)})
                return
            self._send(404, {"error": "not found"})

    return Handler


def serve(indices: dict, host: str = "127.0.0.1", port: int = 8080,
          background: bool = False) -> ThreadingHTTPServer:
    """Serve {db_name: FulltextIndex}. With ``background=True`` returns the
    server immediately (daemon thread); call ``.shutdown()`` to stop."""
    httpd = ThreadingHTTPServer((host, port), make_handler(indices))
    if background:
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        return httpd
    try:
        httpd.serve_forever()
    finally:
        httpd.server_close()
    return httpd
