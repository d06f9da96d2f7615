"""K11 webhook callback + K12 download path guard (reference
main.py:2303-2310, 2331-2342; path_utils.py:6-22)."""

from __future__ import annotations

from pathlib import Path


def post_webhook(return_url: str, payload: dict, timeout: int = 10) -> bool:
    """K11: POST the result JSON; errors swallowed (main.py:2303-2310)."""
    try:
        import urllib.request

        req = urllib.request.Request(
            return_url,
            data=__import__("json").dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
        )
        urllib.request.urlopen(req, timeout=timeout)
        return True
    except Exception:
        return False


def validated_file_path(base_dir: str, filename: str) -> Path:
    """K12: resolve + containment check (path_utils.py:6-22); also the
    reference's explicit '..'/'/'/'\\' rejection (main.py:2335)."""
    if ".." in filename or "/" in filename or "\\" in filename:
        raise ValueError("Invalid filename")
    base = Path(base_dir).resolve()
    candidate = (base / filename).resolve()
    candidate.relative_to(base)  # raises ValueError on escape
    if not candidate.is_file():
        raise FileNotFoundError(filename)
    return candidate
