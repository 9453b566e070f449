"""Live-HTTP fetcher (operators/httpfetch.py) against a loopback
http.server: the production C12 implementation's contract — body
spans, un-followed redirects, failed attempts on 404/timeout, robots
ingestion — exercised over real sockets (127.0.0.1, no DNS)."""

from __future__ import annotations

import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from crawlspark.operators import httpfetch

PAGES = {
    "/": '<html><a href="/a.html">a</a> <a href="/redir">r</a></html>',
    "/a.html": "<html>alpha page</html>",
    "/robots.txt": "User-agent: *\nDisallow: /private\nCrawl-delay: 1\n",
}


class _Handler(BaseHTTPRequestHandler):
    def do_GET(self):  # noqa: N802 (stdlib naming)
        if self.path == "/redir":
            self.send_response(301)
            self.send_header("Location", "/a.html")
            self.end_headers()
            return
        if self.path == "/slow":
            time.sleep(3)
            self.send_response(200)
            self.end_headers()
            return
        body = PAGES.get(self.path)
        if body is None:
            self.send_error(404)
            return
        payload = body.encode("utf-8")
        self.send_response(200)
        self.send_header("Content-Type", "text/html; charset=utf-8")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def log_message(self, *a):  # silence
        pass


@pytest.fixture(scope="module")
def server():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _batch(spark, host, paths):
    rows = [
        (f"http://{host}{p}", host, 0, i, 1) for i, p in enumerate(paths)
    ]
    return spark.createDataFrame(
        rows, "url_norm string, host string, depth int, batch_pos int, attempt int"
    )


def test_http_fetch_contract(spark, server):
    b = _batch(spark, server, ["/", "/a.html", "/redir", "/missing"])
    out = {
        r["url_norm"].rsplit(server, 1)[1]: r
        for r in httpfetch.http_fetch_batch(b, cycle_id=1, timeout_s=5.0).collect()
    }
    # success: body as one text span at offset 0
    assert out["/"]["ok"] and out["/"]["redirect_to"] is None
    assert out["/"]["spans"][0]["kind"] == "text"
    assert 'href="/a.html"' in out["/"]["spans"][0]["text"]
    assert out["/"]["spans"][0]["offset"] == 0
    assert out["/a.html"]["ok"] and "alpha page" in out["/a.html"]["spans"][0]["text"]
    # 301: successful terminal fetch of the alias, Location surfaced
    # un-followed, no spans (the engine owns redirect admission)
    assert out["/redir"]["ok"] and out["/redir"]["redirect_to"] == "/a.html"
    assert out["/redir"]["spans"] == []
    # 404: failed attempt (the engine's TTR retry path)
    assert not out["/missing"]["ok"] and out["/missing"]["spans"] == []
    # schema parity with the synthetic fetcher
    assert out["/"]["fetch_cycle"] == 1 and out["/"]["doc_id"].endswith("/")


def test_http_fetch_timeout_is_failed_attempt(spark, server):
    b = _batch(spark, server, ["/slow"])
    row = httpfetch.http_fetch_batch(b, cycle_id=2, timeout_s=0.5).collect()[0]
    assert not row["ok"] and row["spans"] == []


def test_http_fetch_links_extract(spark, server):
    """The fetched spans feed C13 unchanged: extract_links finds the
    page's hrefs in document order."""
    from crawlspark.operators import fetch as fetch_ops

    b = _batch(spark, server, ["/"])
    docs = httpfetch.http_fetch_batch(b, cycle_id=1, timeout_s=5.0)
    links = fetch_ops.extract_links(docs).orderBy("link_pos").collect()
    assert [r["raw_url"] for r in links] == ["/a.html", "/redir"]


def test_fetch_robots_live(spark, server):
    hosts = spark.createDataFrame([(server,), ("127.0.0.1:9",)], "host string")
    out = {r["host"]: r["robots_txt"] for r in
           httpfetch.fetch_robots(hosts, timeout_s=2.0).collect()}
    assert "Disallow: /private" in out[server]
    assert out["127.0.0.1:9"] is None  # unreachable -> null, parser default
    # C6 parser consumes it unchanged
    from crawlspark.robots import parse_robots

    rules, delay_ms = parse_robots(out[server])
    assert delay_ms == 1000
    assert any(not r["allow"] and r["prefix"] == "/private" for r in rules)
