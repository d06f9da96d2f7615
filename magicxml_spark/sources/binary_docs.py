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
                elif deterministic_stub:
                    digest = hashlib.md5(bytes(content)).hexdigest()
                    rows.append((path, 1, 1, 0, json.dumps([digest[:8], digest[8:16]])))
                else:
                    raise NotImplementedError(
                        "pdfplumber not installed; pass deterministic_stub=True"
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
                elif deterministic_stub:
                    digest = hashlib.md5(bytes(content)).digest()
                    rows.append(
                        (path, "STUB", digest[0] + 1, digest[1] + 1, "RGB")
                    )
                else:
                    raise NotImplementedError(
                        "PIL not installed; pass deterministic_stub=True"
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
                elif deterministic_stub:
                    rows.append((path, hashlib.md5(bytes(content)).digest()))
                else:
                    raise NotImplementedError(
                        "PIL not installed; pass deterministic_stub=True"
                    )
            yield pd.DataFrame(rows, columns=["path", "jpg_content"])

    return binary_df.select("path", "content").mapInPandas(
        batches, schema="path string, jpg_content binary"
    )


def pdf_report_rows(df: DataFrame, style: str = "table") -> DataFrame:
    """K8 row-capping semantics (main.py:1100, 1133): 'table' keeps the
    first 50 rows, 'summary' the first 5 — the rendering itself is
    reportlab (absent); the capped DataFrame is the engine's output."""
    return df.limit(50 if style == "table" else 5)


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
                elif deterministic_stub:
                    digest = hashlib.md5(bytes(content)).hexdigest()
                    rows.append(
                        (path, 1, f"stub text {digest[:12]}", json.dumps({"stub": digest[:8]}))
                    )
                else:
                    raise NotImplementedError(
                        "pdfplumber not installed; pass deterministic_stub=True"
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
                elif deterministic_stub:
                    seed = hashlib.md5(bytes(content)).digest()
                    fake = (seed * ((width * height) // len(seed) + 1))[: width * height]
                    rows.append((path, width, height, fake))
                else:
                    raise NotImplementedError(
                        "PIL not installed; pass deterministic_stub=True"
                    )
            yield pd.DataFrame(
                rows, columns=["path", "width", "height", "resized"]
            )

    return binary_df.select("path", "content").mapInPandas(
        batches, schema="path string, width int, height int, resized binary"
    )


def sample_video_frames(
    binary_df: DataFrame,
    every_n: int = 30,
    max_frames: int = 8,
    deterministic_stub: bool = False,
) -> DataFrame:
    """Multimodal frame sampling: one row per sampled frame with a
    frame_index lineage column (video codecs absent from this image —
    the stub derives per-frame bytes from md5(content, index) so the
    explode shape, ordering, and lineage columns are real and tested)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        use_real = _have("cv2") or _have("av")
        for pdf in it:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                if use_real:  # pragma: no cover - codec not in image
                    raise NotImplementedError("wire cv2/av decode here")
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
