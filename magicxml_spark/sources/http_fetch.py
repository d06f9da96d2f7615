"""S1: HTTP XML fetch with escalating browser-emulation header
strategies (reference main.py:1586-1741).

Reference behavior: GET with a first-chance plain request; if the
response doesn't look like XML (content-type + body sniffing), retry
through up to 4 increasingly browser-like header sets with a pause
between attempts; 60 s total timeout; redirects followed.

This is driver-side I/O (one document per request — the reference's
envelope caps it at 100 MB); the fetched text then enters the
distributed pipeline via plans.convert. stdlib urllib only.
"""

from __future__ import annotations

import time
import urllib.request

from magicxml_spark.sources.xml_source import decode_bytes

# Escalating header strategies (reference main.py:1629-1681 builds four
# progressively more browser-like header sets; these mirror the shape
# without copying the exact strings).
HEADER_STRATEGIES: list[dict[str, str]] = [
    {},
    {"User-Agent": "Mozilla/5.0 (X11; Linux x86_64)"},
    {
        "User-Agent": "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36",
        "Accept": "text/xml,application/xml,application/xhtml+xml,*/*;q=0.8",
    },
    {
        "User-Agent": "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
        "(KHTML, like Gecko) Chrome/120.0 Safari/537.36",
        "Accept": "text/html,application/xhtml+xml,application/xml;q=0.9,*/*;q=0.8",
        "Accept-Language": "ru-RU,ru;q=0.9,en-US;q=0.8",
        "Referer": "https://www.google.com/",
    },
]


def looks_like_xml(content_type: str, body: str) -> bool:
    """Content-type + body sniffing (main.py:1612-1618, 1693-1707)."""
    if "xml" in (content_type or "").lower():
        return True
    head = body.lstrip()[:200].lower()
    return head.startswith("<?xml") or any(
        m in head for m in ("<yml_catalog", "<catalog", "<offers", "<products", "<shop")
    )


def fetch_xml(
    url: str,
    timeout: float = 60.0,
    retry_sleep: float = 2.0,
    opener: urllib.request.OpenerDirector | None = None,
) -> str:
    """GET ``url``; first strategy that yields XML-looking content wins.
    Raises ValueError when every strategy fails (like the reference's
    final error path)."""
    opener = opener or urllib.request.build_opener()
    deadline = time.monotonic() + timeout
    last_error: Exception | None = None
    for i, headers in enumerate(HEADER_STRATEGIES):
        if time.monotonic() > deadline:
            break
        try:
            req = urllib.request.Request(url, headers=headers)
            with opener.open(req, timeout=max(1.0, deadline - time.monotonic())) as resp:
                body = decode_bytes(resp.read())
                ctype = resp.headers.get("Content-Type", "")
            if looks_like_xml(ctype, body):
                return body
            last_error = ValueError(f"non-XML response (content-type {ctype!r})")
        except Exception as exc:  # noqa: BLE001 — every failure escalates
            last_error = exc
        if i < len(HEADER_STRATEGIES) - 1:
            time.sleep(retry_sleep)
    raise ValueError(f"could not fetch XML from {url}: {last_error}")


def fetch_to_file(url: str, dst: str, **kwargs) -> str:
    text = fetch_xml(url, **kwargs)
    with open(dst, "w", encoding="utf-8") as f:
        f.write(text)
    return dst
