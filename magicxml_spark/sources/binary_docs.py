"""S9-S11: PDF / image sources over Spark's binaryFile format, with
K8-K10 sink counterparts (reference main.py:886-1381).

The Spark-side plumbing (binaryFile scan, schema, Arrow-batched
``mapInPandas`` decode, lineage columns) is real and tested; the
actual PDF/image codecs (pdfplumber, PIL, fitz, reportlab) are NOT in
this image, so each decode step is import-gated: with the libraries
present it runs them; without, ``deterministic_stub=True`` yields a
deterministic fake derived from the bytes (so pipelines and tests
exercise the full distributed path), else NotImplementedError.

This module also stubs ``png_to_jpg`` — the reference CALLS
process_png_to_jpg (main.py:2078) but never defines it (latent
NameError); the engine implements the missing operator.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PDF_TABLE_SCHEMA = (
    "path string, pdf_page int, table_number int, cell_row int, cell_json string"
)
PDF_DOC_SCHEMA = "path string, pages_count int, text string, meta_json string"
IMAGE_META_SCHEMA = "path string, format string, width int, height int, mode string"


def read_binary(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """binaryFile scan: (path, modificationTime, length, content)."""
    return spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)


def _have(module: str) -> bool:
    try:
        __import__(module)
        return True
    except ImportError:
        return False


def extract_pdf_tables(
    binary_df: DataFrame, deterministic_stub: bool = False
) -> DataFrame:
    """S9 (main.py:914-978): per-page extract_tables with pdf_page /
    table_number lineage columns. Arrow-batched; one PDF per input row."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import json

        use_real = _have("pdfplumber")
        for pdf in it:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                if use_real:
                    import io

                    import pdfplumber

                    with pdfplumber.open(io.BytesIO(content)) as doc:
                        for pageno, page in enumerate(doc.pages, 1):
                            for tno, tbl in enumerate(page.extract_tables() or [], 1):
                                for rno, row in enumerate(tbl):
                                    rows.append(
                                        (path, pageno, tno, rno, json.dumps(row))
                                    )
                    continue
                # no pdfplumber: pdf_lite reads back tables IT authored
                # (render_pdf_report / excel_to_pdf output — Producer-
                # marked fixed-layout lines); foreign PDFs fall through
                from magicxml_spark.sources import pdf_lite

                lite = pdf_lite.extract_table_rows(bytes(content))
                if lite:
                    for pageno, rno, cells in lite:
                        rows.append((path, pageno, 1, rno, json.dumps(cells)))
                    continue
                # foreign TEXT pdf, ruled layout first (the pdfplumber
                # 'lattice' analog — cell boundaries from line geometry,
                # text assigned by Tm/Td position), then the
                # whitespace-column heuristic; image-only/exotic PDFs
                # fall on the stub/gate
                from magicxml_spark.sources.pdf_raster import (
                    extract_table_rows_ruled,
                )

                heur = extract_table_rows_ruled(
                    bytes(content)
                ) or pdf_lite.extract_table_rows_heuristic(bytes(content))
                if heur:
                    for pageno, tno, rno, cells in heur:
                        rows.append((path, pageno, tno, rno, json.dumps(cells)))
                elif deterministic_stub:
                    digest = hashlib.md5(bytes(content)).hexdigest()
                    rows.append((path, 1, 1, 0, json.dumps([digest[:8], digest[8:16]])))
                else:
                    raise NotImplementedError(
                        "pdfplumber not installed and no table-like text "
                        "layout found; pass deterministic_stub=True"
                    )
            yield pd.DataFrame(
                rows, columns=["path", "pdf_page", "table_number", "cell_row", "cell_json"]
            )

    return binary_df.select("path", "content").mapInPandas(
        batches, schema=PDF_TABLE_SCHEMA
    )


def extract_image_meta(
    binary_df: DataFrame, deterministic_stub: bool = False
) -> DataFrame:
    """S11 (main.py:886-905): PIL open + mode normalization metadata."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        use_real = _have("PIL")
        for pdf in it:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                if use_real:
                    import io

                    from PIL import Image

                    with Image.open(io.BytesIO(content)) as im:
                        mode = "RGB" if im.mode in ("RGBA", "LA") else im.mode
                        rows.append((path, im.format, im.width, im.height, mode))
                    continue
                # no PIL: the lite codecs decode PNG/BMP/GIF/JPEG
                # (sources/image_lite.py) — other formats fall through
                from magicxml_spark.sources import image_lite

                dec = image_lite.decode_image(bytes(content))
                if dec is not None:
                    fmt_, w, h, mode, _ = dec
                    rows.append(
                        (path, fmt_, w, h, "RGB" if mode in ("RGBA", "LA") else mode)
                    )
                elif deterministic_stub:
                    digest = hashlib.md5(bytes(content)).digest()
                    rows.append(
                        (path, "STUB", digest[0] + 1, digest[1] + 1, "RGB")
                    )
                else:
                    raise NotImplementedError(
                        "PIL not installed and not a lite-decodable "
                        "PNG/BMP/GIF/JPEG; pass deterministic_stub=True"
                    )
            yield pd.DataFrame(
                rows, columns=["path", "format", "width", "height", "mode"]
            )

    return binary_df.select("path", "content").mapInPandas(
        batches, schema=IMAGE_META_SCHEMA
    )


def png_to_jpg(binary_df: DataFrame, deterministic_stub: bool = False) -> DataFrame:
    """The operator the reference calls but never defines
    (process_png_to_jpg, main.py:2078). Returns (path, jpg_content)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        use_real = _have("PIL")
        for pdf in it:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                if use_real:
                    import io

                    from PIL import Image

                    with Image.open(io.BytesIO(content)) as im:
                        if im.mode in ("RGBA", "LA"):
                            bg = Image.new("RGB", im.size, (255, 255, 255))
                            bg.paste(im, mask=im.split()[-1])
                            im = bg
                        buf = io.BytesIO()
                        im.convert("RGB").save(buf, "JPEG", quality=95)
                        rows.append((path, buf.getvalue()))
                    continue
                # no PIL: lite decode (PNG/BMP/GIF) + jpeg_lite baseline
                # encode — the reference's undefined process_png_to_jpg
                from magicxml_spark.sources import image_lite, jpeg_lite, png_lite

                dec = image_lite.decode_image(bytes(content))
                if dec is not None:
                    _, w0, h0, mode, px = dec
                    rgb = png_lite.flatten_to_rgb(w0, h0, mode, px)
                    rows.append(
                        (path, jpeg_lite.encode_jpeg(w0, h0, "RGB", rgb, quality=95))
                    )
                elif deterministic_stub:
                    rows.append((path, hashlib.md5(bytes(content)).digest()))
                else:
                    raise NotImplementedError(
                        "PIL not installed and not a lite-decodable "
                        "PNG/BMP/GIF; pass deterministic_stub=True"
                    )
            yield pd.DataFrame(rows, columns=["path", "jpg_content"])

    return binary_df.select("path", "content").mapInPandas(
        batches, schema="path string, jpg_content binary"
    )


def pdf_report_rows(df: DataFrame, style: str = "table") -> DataFrame:
    """K8 row-capping semantics (main.py:1100, 1133): 'table' keeps the
    first 50 rows, 'summary' the first 5."""
    return df.limit(50 if style == "table" else 5)


def render_pdf_report(
    df: DataFrame, out_path: str, style: str = "table", title: str = "Report"
) -> str:
    """K8 for real (main.py:1056-1133): capped rows -> a paginated
    text-table PDF on disk. reportlab renders when installed (full
    Unicode fonts); otherwise sources/pdf_lite.py writes the document
    from the open PDF 1.4 spec — either way the caller gets an actual
    .pdf a viewer opens, and extract_pdf_tables reads the lite output
    back (round-trip test-pinned). Driver-side by design: the input is
    already capped at 50 rows, same as the reference's report surface."""
    capped = pdf_report_rows(df, style)
    columns = list(capped.columns)
    rows = [["" if v is None else str(v) for v in r] for r in capped.collect()]
    if _have("reportlab"):  # pragma: no cover - library absent in CI image
        from reportlab.lib.pagesizes import A4
        from reportlab.platypus import SimpleDocTemplate, Table

        doc = SimpleDocTemplate(out_path, pagesize=A4, title=title)
        doc.build([Table([columns] + rows)])
        return out_path
    from magicxml_spark.sources import pdf_lite

    with open(out_path, "wb") as fh:
        fh.write(pdf_lite.write_table_pdf(columns, rows, title=title))
    return out_path


def extract_pdf_documents(
    binary_df: DataFrame, deterministic_stub: bool = False
) -> DataFrame:
    """S10 (main.py:981-1034): whole-document extraction — page count,
    concatenated text, metadata JSON — one nested record per PDF."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import json

        use_real = _have("pdfplumber")
        for pdf in it:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                if use_real:
                    import io

                    import pdfplumber

                    with pdfplumber.open(io.BytesIO(content)) as doc:
                        texts = [p.extract_text() or "" for p in doc.pages]
                        rows.append(
                            (
                                path,
                                len(doc.pages),
                                "\n".join(texts),
                                json.dumps(dict(doc.metadata or {})),
                            )
                        )
                    continue
                # no pdfplumber: pdf_lite handles text PDFs (its own
                # output AND foreign writers with plain/Flate text
                # streams); image-only/exotic PDFs fall through
                from magicxml_spark.sources import pdf_lite

                lite_pages = pdf_lite.extract_text_pages(bytes(content))
                if lite_pages:
                    rows.append(
                        (
                            path,
                            len(lite_pages),
                            "\n".join("\n".join(p) for p in lite_pages),
                            json.dumps(pdf_lite.document_info(bytes(content))),
                        )
                    )
                elif deterministic_stub:
                    digest = hashlib.md5(bytes(content)).hexdigest()
                    rows.append(
                        (path, 1, f"stub text {digest[:12]}", json.dumps({"stub": digest[:8]}))
                    )
                else:
                    raise NotImplementedError(
                        "pdfplumber not installed and no text streams found; "
                        "pass deterministic_stub=True"
                    )
            yield pd.DataFrame(rows, columns=["path", "pages_count", "text", "meta_json"])

    return binary_df.select("path", "content").mapInPandas(batches, schema=PDF_DOC_SCHEMA)


def resize_images(
    binary_df: DataFrame,
    width: int,
    height: int,
    deterministic_stub: bool = False,
) -> DataFrame:
    """Multimodal resize: (path, content) -> (path, width, height,
    resized binary). PIL-gated; the stub emits md5-derived bytes of a
    size proportional to the target so batch-shape behavior is real."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        use_real = _have("PIL")
        for pdf in it:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                if use_real:
                    import io

                    from PIL import Image

                    with Image.open(io.BytesIO(content)) as im:
                        buf = io.BytesIO()
                        im.resize((width, height)).save(buf, im.format or "PNG")
                        rows.append((path, width, height, buf.getvalue()))
                    continue
                # no PIL: nearest-neighbor resample on the lite-codec
                # path (PNG/BMP/GIF/JPEG in, PNG out)
                from magicxml_spark.sources import image_lite, png_lite

                dec = image_lite.decode_image(bytes(content))
                if dec is not None:
                    _, w0, h0, mode, px = dec
                    resized = png_lite.resize_nearest(w0, h0, mode, px, width, height)
                    rows.append(
                        (path, width, height, png_lite.encode_png(width, height, mode, resized))
                    )
                elif deterministic_stub:
                    seed = hashlib.md5(bytes(content)).digest()
                    fake = (seed * ((width * height) // len(seed) + 1))[: width * height]
                    rows.append((path, width, height, fake))
                else:
                    raise NotImplementedError(
                        "PIL not installed and not a lite-decodable "
                        "PNG/BMP/GIF/JPEG; pass deterministic_stub=True"
                    )
            yield pd.DataFrame(
                rows, columns=["path", "width", "height", "resized"]
            )

    return binary_df.select("path", "content").mapInPandas(
        batches, schema="path string, width int, height int, resized binary"
    )


# --- K10: image -> PDF (reference main.py:1173-1241) ---------------------

#: A4 page box in points and the reference's px->pt ratio (72/96).
PDF_MAX_WIDTH_PT = 595.0
PDF_MAX_HEIGHT_PT = 842.0
PX_TO_PT = 72.0 / 96.0
PDF_MIN_PAGE_PT = 72.0
PDF_DEFAULT_DPI = 300  # reference default (main.py:2245, 2267)


def fit_image_to_pdf_page(width_px: int, height_px: int) -> dict[str, float]:
    """The reference's pt-scaling/centering math (main.py:1195-1225),
    as a pure function so it is testable without any codec.

    px -> pt at 72/96; images larger than A4 (595x842 pt) are scaled to
    fit and placed on an A4 page, smaller ones get a page of their own
    size; pages are floored at 72 pt per side; the image is centered.
    """
    img_w_pt = width_px * PX_TO_PT
    img_h_pt = height_px * PX_TO_PT
    if img_w_pt > PDF_MAX_WIDTH_PT or img_h_pt > PDF_MAX_HEIGHT_PT:
        scale = min(PDF_MAX_WIDTH_PT / img_w_pt, PDF_MAX_HEIGHT_PT / img_h_pt)
        pdf_w, pdf_h = img_w_pt * scale, img_h_pt * scale
        page_w, page_h = PDF_MAX_WIDTH_PT, PDF_MAX_HEIGHT_PT
    else:
        pdf_w, pdf_h = img_w_pt, img_h_pt
        page_w, page_h = img_w_pt, img_h_pt
    page_w = max(page_w, PDF_MIN_PAGE_PT)
    page_h = max(page_h, PDF_MIN_PAGE_PT)
    return {
        "page_width_pt": page_w,
        "page_height_pt": page_h,
        "pdf_width_pt": pdf_w,
        "pdf_height_pt": pdf_h,
        "x_offset_pt": (page_w - pdf_w) / 2,
        "y_offset_pt": (page_h - pdf_h) / 2,
    }


IMAGE_TO_PDF_SCHEMA = (
    "path string, pdf_filename string, page_width_pt double, page_height_pt double, "
    "pdf_width_pt double, pdf_height_pt double, x_offset_pt double, y_offset_pt double, "
    "pdf_content binary"
)


def image_to_pdf(binary_df: DataFrame, deterministic_stub: bool = False) -> DataFrame:
    """K10 image->PDF (main.py:1173-1241): RGBA/LA flattened onto a
    white background, page sized by ``fit_image_to_pdf_page``, image
    centered, one PDF per input image named ``{base}.pdf``.

    The geometry columns are computed with the real reference math in
    every mode; only the pixel decode (PIL) and PDF render (reportlab)
    are import-gated. Stub mode derives image dimensions from
    md5(content) — matching ``extract_image_meta``'s stub — and emits
    md5-derived bytes as the pdf payload."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import os

        use_real = _have("PIL") and _have("reportlab")
        for pdf in it:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                base = os.path.splitext(os.path.basename(path))[0]
                if use_real:  # pragma: no cover - codecs not in image
                    from PIL import Image
                    from reportlab.lib.utils import ImageReader
                    from reportlab.pdfgen import canvas

                    with Image.open(io.BytesIO(content)) as im:
                        if im.mode in ("RGBA", "LA"):
                            bg = Image.new("RGB", im.size, (255, 255, 255))
                            bg.paste(im, mask=im.split()[-1] if im.mode == "RGBA" else None)
                            im = bg
                        elif im.mode != "RGB":
                            im = im.convert("RGB")
                        geo = fit_image_to_pdf_page(im.width, im.height)
                        buf = io.BytesIO()
                        c = canvas.Canvas(
                            buf, pagesize=(geo["page_width_pt"], geo["page_height_pt"])
                        )
                        c.drawImage(
                            ImageReader(im),
                            geo["x_offset_pt"],
                            geo["y_offset_pt"],
                            geo["pdf_width_pt"],
                            geo["pdf_height_pt"],
                        )
                        c.save()
                        payload = buf.getvalue()
                    rows.append(
                        (
                            path,
                            f"{base}.pdf",
                            geo["page_width_pt"],
                            geo["page_height_pt"],
                            geo["pdf_width_pt"],
                            geo["pdf_height_pt"],
                            geo["x_offset_pt"],
                            geo["y_offset_pt"],
                            payload,
                        )
                    )
                    continue
                # no PIL/reportlab: lite decode (PNG/BMP/GIF/JPEG) +
                # pdf_lite image XObject embed — a real image PDF
                from magicxml_spark.sources import image_lite, pdf_lite, png_lite

                dec = image_lite.decode_image(bytes(content))
                if dec is not None:
                    _, w0, h0, mode, px = dec
                    geo = fit_image_to_pdf_page(w0, h0)
                    payload = pdf_lite.write_image_pdf(
                        png_lite.flatten_to_rgb(w0, h0, mode, px),
                        w0,
                        h0,
                        geo["page_width_pt"],
                        geo["page_height_pt"],
                        geo["pdf_width_pt"],
                        geo["pdf_height_pt"],
                        geo["x_offset_pt"],
                        geo["y_offset_pt"],
                        title=base,
                    )
                elif deterministic_stub:
                    digest = hashlib.md5(bytes(content)).digest()
                    # stub dims match extract_image_meta's stub, scaled up
                    # so both fit branches occur across inputs
                    geo = fit_image_to_pdf_page(
                        (digest[0] + 1) * 8, (digest[1] + 1) * 8
                    )
                    payload = hashlib.md5(b"pdf" + bytes(content)).digest()
                else:
                    raise NotImplementedError(
                        "PIL/reportlab not installed; pass deterministic_stub=True"
                    )
                rows.append(
                    (
                        path,
                        f"{base}.pdf",
                        geo["page_width_pt"],
                        geo["page_height_pt"],
                        geo["pdf_width_pt"],
                        geo["pdf_height_pt"],
                        geo["x_offset_pt"],
                        geo["y_offset_pt"],
                        payload,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "path",
                    "pdf_filename",
                    "page_width_pt",
                    "page_height_pt",
                    "pdf_width_pt",
                    "pdf_height_pt",
                    "x_offset_pt",
                    "y_offset_pt",
                    "pdf_content",
                ],
            )

    return binary_df.select("path", "content").mapInPandas(
        batches, schema=IMAGE_TO_PDF_SCHEMA
    )


# --- K10: PDF -> images per page @ dpi (reference main.py:1244-1381) -----

PDF_TO_IMAGES_SCHEMA = (
    "path string, page int, page_filename string, width int, height int, "
    "img_content binary"
)


def pdf_to_images(
    binary_df: DataFrame,
    output_format: str = "png",
    dpi: int = PDF_DEFAULT_DPI,
    deterministic_stub: bool = False,
) -> DataFrame:
    """K10 pdf->image (main.py:1244-1381): render every page at ``dpi``
    (fitz matrix dpi/72, pdf2image fallback), one output row per page.

    Filenames follow the reference: a single-page PDF yields
    ``{base}.{fmt}``; a multipage one yields ``page_{n:03d}.{fmt}``
    entries destined for ``{base}_images.zip`` (see
    ``write_image_outputs`` for the zip assembly). The page fan-out is
    the Spark-side shape that scales — one task renders one PDF's
    pages, downstream operators see per-page rows.

    pdf_lite-authored documents AND mainstream foreign PDFs render
    for REAL without fitz: the embedded 5x7-font rasterizer
    (sources/pdf_raster.py) draws text pages, and image XObjects decode
    through the lite codecs — DCTDecode via jpeg_lite (baseline +
    progressive), FlateDecode samples (PNG/TIFF predictors) in
    DeviceRGB/DeviceGray/Indexed color, 1-bit stencils. Only
    JPX/CCITT/JBIG2/ICC-flavored or encrypted documents still fall
    through to the fitz gate below.

    Stub mode (codecs absent, foreign PDF): page count =
    1 + md5(content)[0] % 3 and pixel dims = A4 points x dpi/72 — so
    the dpi parameter is honored observably and multipage fan-out is
    exercised."""
    fmt = "jpg" if output_format.lower() == "jpg" else "png"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import os

        from magicxml_spark.sources.pdf_raster import (
            rasterize_pdf,
            rasterize_text_pdf,
        )

        use_real = _have("fitz") or _have("pdf2image")
        for pdf in it:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                base = os.path.splitext(os.path.basename(path))[0]
                lite = None if use_real else rasterize_pdf(bytes(content), dpi)
                if lite is None and not use_real:
                    # foreign PDFs render through the same
                    # interpreter — text via the 5x7 font
                    # (layout-faithful, substituted glyphs), images via
                    # the lite codecs (DCT/Flate), compressed-xref and
                    # ObjStm files via pdf_xref; only exotic-filter
                    # (JPX/CCITT/JBIG2) or encrypted documents still
                    # fall to the fitz gate below
                    lite = rasterize_text_pdf(bytes(content), dpi)
                if use_real:  # pragma: no cover - codecs not in image
                    pages = _render_pdf_pages(bytes(content), fmt, dpi)
                elif lite is not None:
                    pages = [
                        (w, h, _encode_raster_png(img, fmt)) for w, h, img in lite
                    ]
                elif deterministic_stub:
                    n_pages = 1 + hashlib.md5(bytes(content)).digest()[0] % 3
                    w = round(PDF_MAX_WIDTH_PT * dpi / 72)
                    h = round(PDF_MAX_HEIGHT_PT * dpi / 72)
                    pages = [
                        (w, h, hashlib.md5(bytes(content) + bytes([p])).digest())
                        for p in range(n_pages)
                    ]
                else:
                    raise NotImplementedError(
                        "fitz/pdf2image not installed; pass deterministic_stub=True"
                    )
                single = len(pages) == 1
                for pageno, (w, h, img) in enumerate(pages, 1):
                    name = (
                        f"{base}.{fmt}" if single else f"page_{pageno:03d}.{fmt}"
                    )
                    rows.append((path, pageno, name, w, h, img))
            yield pd.DataFrame(
                rows,
                columns=["path", "page", "page_filename", "width", "height", "img_content"],
            )

    return binary_df.select("path", "content").mapInPandas(
        batches, schema=PDF_TO_IMAGES_SCHEMA
    )


def _encode_raster_png(png_bytes: bytes, fmt: str) -> bytes:
    """jpg requested -> transcode the rasterized PNG page through the
    lite codecs (decode_png -> encode_jpeg); png passes through."""
    if fmt != "jpg":
        return png_bytes
    from magicxml_spark.sources.jpeg_lite import encode_jpeg
    from magicxml_spark.sources.png_lite import decode_png, flatten_to_rgb

    w, h, mode, pix = decode_png(png_bytes)
    return encode_jpeg(w, h, "RGB", flatten_to_rgb(w, h, mode, pix), quality=95)


def _render_pdf_pages(content: bytes, fmt: str, dpi: int):  # pragma: no cover
    """Real render path: PyMuPDF first, pdf2image fallback — the
    reference's exact library preference (main.py:1249, 1324)."""
    import io

    pages = []
    try:
        import fitz

        doc = fitz.open(stream=content, filetype="pdf")
        try:
            for page in doc:
                pix = page.get_pixmap(matrix=fitz.Matrix(dpi / 72, dpi / 72))
                img = _encode_pix(pix.tobytes("png"), fmt)
                pages.append((pix.width, pix.height, img))
        finally:
            doc.close()
    except ImportError:
        from pdf2image import convert_from_bytes

        for im in convert_from_bytes(content, dpi=dpi):
            buf = io.BytesIO()
            if fmt == "jpg":
                if im.mode in ("RGBA", "LA"):
                    from PIL import Image

                    bg = Image.new("RGB", im.size, (255, 255, 255))
                    bg.paste(im, mask=im.split()[-1] if im.mode == "RGBA" else None)
                    im = bg
                elif im.mode != "RGB":
                    im = im.convert("RGB")
                im.save(buf, "JPEG", quality=95, optimize=True)
            else:
                im.save(buf, "PNG", optimize=True)
            pages.append((im.width, im.height, buf.getvalue()))
    return pages


def _encode_pix(png_bytes: bytes, fmt: str) -> bytes:  # pragma: no cover
    if fmt != "jpg":
        return png_bytes
    import io

    from PIL import Image

    with Image.open(io.BytesIO(png_bytes)) as im:
        if im.mode in ("RGBA", "LA"):
            bg = Image.new("RGB", im.size, (255, 255, 255))
            bg.paste(im, mask=im.split()[-1] if im.mode == "RGBA" else None)
            im = bg
        elif im.mode != "RGB":
            im = im.convert("RGB")
        buf = io.BytesIO()
        im.save(buf, "JPEG", quality=95, optimize=True)
        return buf.getvalue()


def write_image_outputs(images_df: DataFrame, out_dir: str) -> list[str]:
    """K10 delivery step (main.py:1259-1320): single-page PDFs produce a
    bare image file, multipage ones ``{base}_images.zip`` with
    ``page_{n:03d}.{fmt}`` members in page order.

    Driver-side by design — this is the bounded per-file export the
    reference serves over HTTP (100 MB envelope); page rows stream
    through ``toLocalIterator`` sorted by (path, page) so only one
    file's pages are held at a time. The distributed part (render) has
    already happened in ``pdf_to_images``."""
    import os
    import zipfile

    os.makedirs(out_dir, exist_ok=True)
    written: list[str] = []
    current_path, current_pages = None, []

    def flush(src_path: str, pages: list) -> None:
        base = os.path.splitext(os.path.basename(src_path))[0]
        if len(pages) == 1:
            target = os.path.join(out_dir, pages[0][0])
            with open(target, "wb") as fh:
                fh.write(pages[0][1])
        else:
            target = os.path.join(out_dir, f"{base}_images.zip")
            with zipfile.ZipFile(target, "w") as zf:
                for name, payload in pages:
                    zf.writestr(name, payload)
        written.append(target)

    ordered = images_df.select("path", "page", "page_filename", "img_content").sort(
        "path", "page"
    )
    for row in ordered.toLocalIterator():
        if row["path"] != current_path:
            if current_path is not None:
                flush(current_path, current_pages)
            current_path, current_pages = row["path"], []
        current_pages.append((row["page_filename"], bytes(row["img_content"])))
    if current_path is not None:
        flush(current_path, current_pages)
    return written


def sample_video_frames(
    binary_df: DataFrame,
    every_n: int = 30,
    max_frames: int = 8,
    deterministic_stub: bool = False,
) -> DataFrame:
    """Multimodal frame sampling: one row per sampled frame with a
    frame_index lineage column. REAL for Motion-JPEG AVI containers
    (riff_media walks the movi list; each emitted frame is the JPEG
    bytes, decodable downstream by image_lite/jpeg_lite); inter-frame
    codecs (h264 etc.) stay on the cv2/av gate, with the
    deterministic stub preserving the explode shape for them."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from magicxml_spark.sources.riff_media import iter_mjpeg_frames

        use_real = _have("cv2") or _have("av")
        for pdf in it:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                if use_real:  # pragma: no cover - codec not in image
                    raise NotImplementedError("wire cv2/av decode here")
                mjpeg = list(iter_mjpeg_frames(bytes(content)))
                if mjpeg:
                    sampled = [
                        (fidx, jpeg)
                        for fidx, jpeg in mjpeg
                        if fidx % every_n == 0
                    ][:max_frames]
                    rows += [(path, fidx, jpeg) for fidx, jpeg in sampled]
                    continue
                if deterministic_stub:
                    for k in range(max_frames):
                        frame_index = k * every_n
                        rows.append(
                            (
                                path,
                                frame_index,
                                hashlib.md5(
                                    bytes(content) + str(frame_index).encode()
                                ).digest(),
                            )
                        )
                else:
                    raise NotImplementedError(
                        "no video codec installed; pass deterministic_stub=True"
                    )
            yield pd.DataFrame(rows, columns=["path", "frame_index", "frame"])

    return binary_df.select("path", "content").mapInPandas(
        batches, schema="path string, frame_index int, frame binary"
    )


def chunk_audio(
    binary_df: DataFrame,
    chunk_seconds: float = 10.0,
    sample_rate: int = 16_000,
    max_chunks: int = 16,
    deterministic_stub: bool = False,
) -> DataFrame:
    """Multimodal audio chunking: one row per fixed-duration chunk with
    (chunk_index, start_s, end_s, pcm) lineage — the shard shape an
    ASR/audio-training pipeline feeds downstream. Audio codecs are
    absent from this image (librosa/soundfile/pydub), so the stub
    derives per-chunk bytes from md5(content, index) and a duration
    from the byte length; the explode shape, ordering, and typed
    metadata columns are real and tested.

    Scale shape: mapInPandas over the binaryFile source — Arrow batches
    of (path, content), each task emits its own chunk rows; no shuffle
    until a downstream groupBy. Partition sizing is the binaryFile
    source's maxPartitionBytes, so giant audio files spread across
    tasks by file boundary (split-by-time inside one file happens here,
    per row).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from magicxml_spark.sources.riff_media import decode_wav

        use_real = _have("soundfile") or _have("librosa") or _have("pydub")
        for pdf in it:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                if use_real:  # pragma: no cover - codec not in image
                    raise NotImplementedError("wire soundfile/librosa decode here")
                wav = decode_wav(bytes(content))
                if wav is not None:
                    # REAL path: integer-PCM WAV — true duration from
                    # the sample count, chunk = the actual PCM slice
                    rate, ch, bits, n_frames, pcm = wav
                    frame_bytes = ch * bits // 8
                    # clamp: sub-frame chunk_seconds must still advance
                    # one frame per chunk, never slice empty [0,0) spans
                    per_chunk = max(1, int(chunk_seconds * rate))
                    n = min(
                        max_chunks,
                        max(1, -(-n_frames // per_chunk)),
                    )
                    for k in range(n):
                        f0 = k * per_chunk
                        f1 = min(n_frames, f0 + per_chunk)
                        rows.append(
                            (
                                path,
                                k,
                                round(f0 / rate, 3),
                                round(f1 / rate, 3),
                                rate,
                                pcm[f0 * frame_bytes : f1 * frame_bytes],
                            )
                        )
                    continue
                if not deterministic_stub:
                    raise NotImplementedError(
                        "no audio codec installed; pass deterministic_stub=True"
                    )
                # stub duration: pretend 1 byte = 1 sample at sample_rate
                total_s = len(content) / float(sample_rate)
                n = min(max_chunks, max(1, int(total_s // chunk_seconds) + 1))
                for k in range(n):
                    start = k * chunk_seconds
                    end = min(total_s, start + chunk_seconds)
                    rows.append(
                        (
                            path,
                            k,
                            round(start, 3),
                            round(end, 3),
                            sample_rate,
                            hashlib.md5(bytes(content) + str(k).encode()).digest(),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=["path", "chunk_index", "start_s", "end_s", "sample_rate", "pcm"],
            )

    return binary_df.select("path", "content").mapInPandas(
        batches,
        schema=(
            "path string, chunk_index int, start_s double, end_s double, "
            "sample_rate int, pcm binary"
        ),
    )
