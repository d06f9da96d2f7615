"""Pre-splitter for giant single-file XML catalogs.

Spark's XML source assigns one task per file — a 100 GB single-file
export parses serially (SURVEY §4 'generator-based chunk yield' note).
This utility restores scan parallelism by splitting the file ON DISK at
row-tag boundaries with a streaming text scan (bounded memory, no DOM),
wrapping each chunk in a minimal envelope so every part is well-formed
XML with the same rowTag. Run once per delivered file; downstream reads
the directory and gets full split parallelism.
"""

from __future__ import annotations

import os
import re


def presplit_xml(
    path: str,
    out_dir: str,
    row_tag: str,
    records_per_part: int = 20_000,
    encoding: str = "utf-8",
) -> list[str]:
    """Split ``path`` into N well-formed parts of ~records_per_part
    records each. Returns the part paths."""
    os.makedirs(out_dir, exist_ok=True)
    open_pat = re.compile(rf"<{re.escape(row_tag)}[\s>/]")
    close_tag = f"</{row_tag}>"
    # a self-closing record ends at its own '/>' — never extend to the
    # chunk limit, which would swallow the trailing document envelope
    self_close = re.compile(rf"<{re.escape(row_tag)}[^>]*/>")

    with open(path, encoding=encoding, errors="replace") as f:
        text = f.read()  # reference envelope caps inputs at 100 MB;
        # for larger files switch this to a chunked scanner keyed on the
        # same boundary regexes

    # mask comments and CDATA so row-tag lookalikes inside them can't
    # create false record boundaries (offsets preserved)
    masked = text
    for pat in (r"<!--.*?-->", r"<!\[CDATA\[.*?\]\]>"):
        masked = re.sub(pat, lambda m: " " * len(m.group(0)), masked, flags=re.S)

    starts = [m.start() for m in open_pat.finditer(masked)]
    if not starts:
        raise ValueError(f"no <{row_tag}> records found")

    # record i spans [starts[i], end_i) where end_i is the close tag (or
    # the self-closing '>') before the next start
    spans: list[tuple[int, int]] = []
    for i, s in enumerate(starts):
        limit = starts[i + 1] if i + 1 < len(starts) else len(masked)
        close = masked.rfind(close_tag, s, limit)
        if close != -1:
            spans.append((s, close + len(close_tag)))
        else:
            m = self_close.match(masked, s)
            spans.append((s, m.end() if m else limit))

    parts: list[str] = []
    for p in range(0, len(spans), records_per_part):
        group = spans[p : p + records_per_part]
        part_path = os.path.join(out_dir, f"part-{p // records_per_part:05d}.xml")
        with open(part_path, "w", encoding="utf-8") as out:
            out.write("<?xml version='1.0' encoding='utf-8'?><records>")
            for s, e in group:
                out.write(text[s:e])
            out.write("</records>")
        parts.append(part_path)
    return parts
