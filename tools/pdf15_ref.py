"""Independent PDF 1.5 writer for testing pdf_xref (codec-fuzz pattern).

Same role as jpeg_progressive_ref.py: a REFERENCE GENERATOR written
directly from the spec (ISO 32000-1 §7.5.7 cross-reference streams,
§7.5.8 object streams) and sharing NO code with pdf_lite/pdf_xref, so a
round-trip through the repo's parser is a genuine cross-check, not a
tautology. It produces what modern PDF writers emit and pdf_lite's
classic-xref writer never does:

- catalog / page tree / page dicts / font / Info packed into a
  /Type /ObjStm object stream (FlateDecode),
- located by a /Type /XRef cross-reference STREAM with a 3-field /W,
  optional split /Index subsections, and optional PNG /Predictor 12
  (Up) row filtering,
- optionally a second incremental-update revision chained via /Prev
  (new page appended, its objects in a second ObjStm).

Content streams stay top-level (the spec forbids streams inside object
streams) and are FlateDecode-compressed, with an optional INDIRECT
/Length object — another modern-writer habit the regex parsers choke
on.
"""

from __future__ import annotations

import zlib


def _png_up_filter(rows: list[bytes]) -> bytes:
    """Apply PNG filter type 2 (Up) to every row — the predictor-12
    encoding real writers use for xref streams."""
    out = bytearray()
    prev = bytes(len(rows[0])) if rows else b""
    for row in rows:
        out.append(2)
        out += bytes((row[i] - prev[i]) & 0xFF for i in range(len(row)))
        prev = row
    return bytes(out)


def _xref_stream_obj(
    num: int,
    entries: dict[int, tuple],
    size: int,
    root: int,
    info: int,
    use_predictor: bool,
    prev: int | None = None,
    split_index: bool = False,
) -> bytes:
    """Serialize the /Type /XRef object. ``entries`` maps objnum ->
    (1, offset) | (2, container, idx); this xref stream's own entry
    must already be present. W = [1 4 2]."""
    nums = sorted(entries)
    # subsections: contiguous runs (optionally forced into >=2 runs)
    runs: list[list[int]] = []
    for n in nums:
        if runs and n == runs[-1][-1] + 1:
            runs[-1].append(n)
        else:
            runs.append([n])
    if split_index and len(runs) == 1 and len(runs[0]) > 2:
        mid = len(runs[0]) // 2
        runs = [runs[0][:mid], runs[0][mid:]]
    rows = []
    index: list[int] = []
    for run in runs:
        index += [run[0], len(run)]
        for n in run:
            e = entries[n]
            if e[0] == 1:
                rows.append(
                    bytes([1])
                    + e[1].to_bytes(4, "big")
                    + (0).to_bytes(2, "big")
                )
            elif e[0] == 2:
                rows.append(
                    bytes([2])
                    + e[1].to_bytes(4, "big")
                    + e[2].to_bytes(2, "big")
                )
            else:
                rows.append(bytes([0]) + bytes(6))
    if use_predictor:
        payload = zlib.compress(_png_up_filter(rows))
        parms = b" /DecodeParms << /Predictor 12 /Columns 7 >>"
    else:
        payload = zlib.compress(b"".join(rows))
        parms = b""
    idx = b" ".join(str(i).encode() for i in index)
    d = (
        b"<< /Type /XRef /Size "
        + str(size).encode()
        + b" /W [1 4 2] /Index ["
        + idx
        + b"] /Root "
        + str(root).encode()
        + b" 0 R /Info "
        + str(info).encode()
        + b" 0 R /Filter /FlateDecode"
        + parms
        + (b" /Prev " + str(prev).encode() if prev is not None else b"")
        + b" /Length "
        + str(len(payload)).encode()
        + b" >>"
    )
    return (
        str(num).encode()
        + b" 0 obj\n"
        + d
        + b"\nstream\n"
        + payload
        + b"\nendstream\nendobj\n"
    )


def _objstm(num: int, members: list[tuple[int, bytes]]) -> bytes:
    """Serialize a /Type /ObjStm containing ``members`` (objnum, body)."""
    offsets = []
    blob = bytearray()
    for objnum, body in members:
        offsets.append((objnum, len(blob)))
        blob += body + b"\n"
    header = b" ".join(
        str(objnum).encode() + b" " + str(off).encode()
        for objnum, off in offsets
    ) + b"\n"
    payload = zlib.compress(header + bytes(blob))
    d = (
        b"<< /Type /ObjStm /N "
        + str(len(members)).encode()
        + b" /First "
        + str(len(header)).encode()
        + b" /Filter /FlateDecode /Length "
        + str(len(payload)).encode()
        + b" >>"
    )
    return (
        str(num).encode()
        + b" 0 obj\n"
        + d
        + b"\nstream\n"
        + payload
        + b"\nendstream\nendobj\n"
    )


def _content_stream(lines: list[str], x: int = 50, y: int = 780) -> bytes:
    ops = [b"BT", b"/F1 10 Tf", b"14 TL",
           b"1 0 0 1 %d %d Tm" % (x, y)]
    for line in lines:
        esc = line.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")
        ops.append(b"(" + esc.encode("latin-1", "replace") + b") '")
    ops.append(b"ET")
    return zlib.compress(b"\n".join(ops))


def write_pdf15(
    pages_lines: list[list[str]],
    use_predictor: bool = True,
    split_index: bool = False,
    indirect_length: bool = False,
    incremental_page: list[str] | None = None,
    hybrid: bool = False,
    title: str = "pdf15-ref",
) -> bytes:
    """A complete PDF 1.5 document: page text in ``pages_lines``,
    structure objects in an ObjStm, xref as an XRef stream. With
    ``incremental_page`` a second revision appends one more page via
    /Prev chaining (its page dict in a second ObjStm, the updated
    /Pages node re-emitted there too — the shadowing case)."""
    # numbering: 1 catalog, 2 pages, 3 font, 4.. page dicts, then
    # content streams, then [length objects], objstm, xref stream
    n_pages = len(pages_lines)
    page_ids = [4 + i for i in range(n_pages)]
    content_ids = [4 + n_pages + i for i in range(n_pages)]
    next_id = 4 + 2 * n_pages
    length_ids = {}
    if indirect_length:
        for cid in content_ids:
            length_ids[cid] = next_id
            next_id += 1
    info_id = next_id
    objstm_id = next_id + 1
    xref_id = next_id + 2
    size = xref_id + 1

    kids = b" ".join(b"%d 0 R" % pid for pid in page_ids)
    members = [
        (1, b"<< /Type /Catalog /Pages 2 0 R >>"),
        (2, b"<< /Type /Pages /Kids [" + kids + b"] /Count %d >>" % n_pages),
        (3, b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"),
    ]
    for pid, cid in zip(page_ids, content_ids):
        members.append(
            (
                pid,
                b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 595 842] "
                b"/Resources << /Font << /F1 3 0 R >> >> /Contents %d 0 R >>"
                % cid,
            )
        )
    esc_title = title.replace("(", r"\(").replace(")", r"\)")
    members.append(
        (
            info_id,
            b"<< /Producer (pdf15-ref-writer) /Title ("
            + esc_title.encode()
            + b") >>",
        )
    )

    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for cid, lines in zip(content_ids, pages_lines):
        payload = _content_stream(lines)
        offsets[cid] = len(out)
        if indirect_length:
            ldecl = b"/Length %d 0 R" % length_ids[cid]
        else:
            ldecl = b"/Length %d" % len(payload)
        out += (
            b"%d 0 obj\n<< /Filter /FlateDecode " % cid
            + ldecl
            + b" >>\nstream\n"
            + payload
            + b"\nendstream\nendobj\n"
        )
        if indirect_length:
            offsets[length_ids[cid]] = len(out)
            out += b"%d 0 obj\n%d\nendobj\n" % (length_ids[cid], len(payload))
    offsets[objstm_id] = len(out)
    out += _objstm(objstm_id, members)

    entries: dict[int, tuple] = {0: (0,)}
    for i, (objnum, _) in enumerate(members):
        entries[objnum] = (2, objstm_id, i)
    for objnum, off in offsets.items():
        entries[objnum] = (1, off)
    xref_at = len(out)
    entries[xref_id] = (1, xref_at)
    out += _xref_stream_obj(
        xref_id, entries, size, root=1, info=info_id,
        use_predictor=use_predictor, split_index=split_index,
    )
    if hybrid:
        # hybrid-reference file (§7.5.8.4): a CLASSIC table that marks
        # the ObjStm-packed objects FREE (so pre-1.5 readers skip them)
        # plus a trailer /XRefStm pointing at the real xref stream —
        # the stream's entries must take precedence over the frees
        table_at = len(out)
        out += b"xref\n0 %d\n" % size
        for n in range(size):
            e = entries.get(n, (0,))
            if e[0] == 1:
                out += b"%010d 00000 n \n" % e[1]
            else:
                out += b"0000000000 65535 f \n"
        out += (
            b"trailer\n<< /Size %d /Root 1 0 R /Info %d 0 R /XRefStm %d >>\n"
            % (size, info_id, xref_at)
        )
        out += b"startxref\n%d\n%%%%EOF\n" % table_at
        return bytes(out)
    out += b"startxref\n%d\n%%%%EOF\n" % xref_at

    if incremental_page is None:
        return bytes(out)

    # --- second revision: append one page, shadow the /Pages node ----
    new_page_id = size
    new_content_id = size + 1
    objstm2_id = size + 2
    xref2_id = size + 3
    size2 = xref2_id + 1
    payload = _content_stream(incremental_page)
    off_content = len(out)
    out += (
        b"%d 0 obj\n<< /Filter /FlateDecode /Length %d >>\nstream\n"
        % (new_content_id, len(payload))
        + payload
        + b"\nendstream\nendobj\n"
    )
    kids2 = kids + b" %d 0 R" % new_page_id
    members2 = [
        (
            2,
            b"<< /Type /Pages /Kids ["
            + kids2
            + b"] /Count %d >>" % (n_pages + 1),
        ),
        (
            new_page_id,
            b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 595 842] "
            b"/Resources << /Font << /F1 3 0 R >> >> /Contents %d 0 R >>"
            % new_content_id,
        ),
    ]
    off_objstm2 = len(out)
    out += _objstm(objstm2_id, members2)
    entries2: dict[int, tuple] = {
        2: (2, objstm2_id, 0),
        new_page_id: (2, objstm2_id, 1),
        new_content_id: (1, off_content),
        objstm2_id: (1, off_objstm2),
    }
    xref2_at = len(out)
    entries2[xref2_id] = (1, xref2_at)
    out += _xref_stream_obj(
        xref2_id, entries2, size2, root=1, info=info_id,
        use_predictor=use_predictor, prev=xref_at,
    )
    out += b"startxref\n%d\n%%%%EOF\n" % xref2_at
    return bytes(out)
