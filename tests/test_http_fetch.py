"""S1 fetch strategy loop against an in-process HTTP server."""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from magicxml_spark.sources.http_fetch import fetch_xml, looks_like_xml

XML_BODY = b"<?xml version='1.0'?><offers><offer id='1'><price>5</price></offer></offers>"


class Handler(BaseHTTPRequestHandler):
    def do_GET(self):  # noqa: N802
        if self.path == "/feed.xml":
            self.send_response(200)
            self.send_header("Content-Type", "application/xml")
            self.end_headers()
            self.wfile.write(XML_BODY)
        elif self.path == "/picky":
            # refuses plain clients: only responds XML once a UA is set
            if self.headers.get("User-Agent"):
                self.send_response(200)
                self.send_header("Content-Type", "text/xml")
                self.end_headers()
                self.wfile.write(XML_BODY)
            else:
                self.send_response(403)
                self.end_headers()
                self.wfile.write(b"forbidden")
        else:
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.end_headers()
            self.wfile.write(b"<html>not a feed</html>")

    def log_message(self, *args):  # quiet
        pass


@pytest.fixture(scope="module")
def server():
    httpd = HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_port}"
    httpd.shutdown()


def test_first_chance_fetch(server):
    assert fetch_xml(f"{server}/feed.xml", retry_sleep=0) == XML_BODY.decode()


def test_strategy_escalation(server):
    # plain request 403s; strategy 2 (UA header) succeeds
    assert fetch_xml(f"{server}/picky", retry_sleep=0) == XML_BODY.decode()


def test_html_exhausts_strategies(server):
    with pytest.raises(ValueError, match="could not fetch XML"):
        fetch_xml(f"{server}/page.html", retry_sleep=0)


def test_sniffing():
    assert looks_like_xml("application/xml", "")
    assert looks_like_xml("", "<?xml version='1.0'?><x/>")
    assert looks_like_xml("text/plain", "  <yml_catalog date='x'>")
    assert not looks_like_xml("text/html", "<html></html>")
