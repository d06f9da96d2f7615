"""XML ingestion: S2 encoding cascade, S3 parse+repair, S4 structure
validation, S5 dialect auto-detection (reference main.py:1384-1475,
1786-1797).

Division of labor, Spark-first:

* Document-level concerns (encoding probe, structure validation,
  dialect detection, repair) are cheap text passes over a HEAD SAMPLE
  on the driver — the same trick Spark's own schema inference uses.
* Record parsing is Spark's native XML source (``format("xml")`` with
  ``rowTag`` per dialect) — distributed, streaming per file split.
  ``inferSchema=false`` keeps every leaf a string, matching the
  reference's all-strings data model (SURVEY §1.1) and preserving
  values like "1234.50" byte-for-byte.
* Repair (bare ``&``, control chars) is a text rewrite. For the
  100 TB path this is a ``spark.read.text`` -> ``regexp_replace`` ->
  write pre-pass; the in-memory helper here covers the reference's
  single-document envelope (its inputs are capped at 100 MB,
  main.py:1779).
"""

from __future__ import annotations

import os
import re
import tempfile

from pyspark.sql import DataFrame, SparkSession

# S2: the reference's decode cascade (main.py:1786-1797).
ENCODING_CASCADE = ("utf-8", "windows-1251", "latin1", "iso-8859-1", "cp1252")

# S5: probe order is significant (main.py:1463-1475).
DIALECTS = ("offer", "product", "russian", "service")
_ROW_TAGS = {
    "offer": "offer",
    "product": "product",
    "russian": "ЭлементСправочника",
    "service": "service",
}

_CONTROL_CHARS = re.compile(r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]")
_BARE_AMP = re.compile(r"&(?![a-zA-Z0-9#]+;)")
_INVALID_XML_CHARS = re.compile(r"[^\x09\x0A\x0D\x20-퟿-�]")

_STRUCTURE_MARKERS = (
    "<yml_catalog",
    "<catalog",
    "<offers",
    "<offer",
    "<products",
    "<product",
    "<shop",
    "<categories",
    "<category",
    "<корневой",
    "<элементсправочника",
    "<service",
)


def decode_bytes(raw: bytes) -> str:
    """S2: utf-8 -> windows-1251 -> latin1 -> iso-8859-1 -> cp1252 ->
    utf-8(errors=replace), first decoder that succeeds wins."""
    for enc in ENCODING_CASCADE:
        try:
            return raw.decode(enc)
        except (UnicodeDecodeError, LookupError):
            continue
    return raw.decode("utf-8", errors="replace")


def validate_xml_structure(text: str) -> None:
    """S4 (main.py:1390-1424): reject HTML pages and error pages;
    require at least one known catalog marker."""
    lowered = text.strip().lower()
    if lowered.startswith("<html") or lowered.startswith("<!doctype html"):
        raise ValueError("Data contains an HTML page instead of XML/YML.")
    if (
        ("error" in lowered or "not found" in lowered or "404" in lowered)
        and not text.strip().startswith("<?xml")
        and not any(m in lowered for m in _STRUCTURE_MARKERS[:6])
    ):
        raise ValueError("Data contains an error page.")
    cleaned = text.strip().lstrip("﻿")
    if not cleaned.startswith("<"):
        raise ValueError("Received data is not an XML file.")
    if not any(m in lowered for m in _STRUCTURE_MARKERS):
        raise ValueError(
            "XML does not contain expected elements (yml_catalog, catalog, "
            "offers, products, shop, categories, 1C, or service markers)."
        )


def clean_xml_text(text: str) -> str:
    """S3 first-chance cleanup (main.py:1430-1438): strip BOM and
    XML-illegal control characters."""
    cleaned = text.strip().lstrip("﻿")
    return _CONTROL_CHARS.sub("", cleaned)


def repair_xml_text(text: str) -> str:
    """S3 repair retry (main.py:1444-1448): escape bare '&', drop
    characters outside the XML 1.0 range."""
    repaired = _BARE_AMP.sub("&amp;", text)
    return _INVALID_XML_CHARS.sub("", repaired)


def detect_dialect(text: str) -> str:
    """S5 (main.py:1463-1475): probe for row elements in fixed order.
    A regex probe over the text sample mirrors the reference's
    findall('.//tag') without requiring a full parse."""
    for dialect in DIALECTS:
        tag = _ROW_TAGS[dialect]
        if re.search(rf"<{tag}[\s>/]", text):
            return dialect
    # service root-as-record fallback (main.py:107)
    if re.match(r"^\s*(<\?xml[^>]*\?>\s*)?<service[\s>]", text):
        return "service"
    raise ValueError("Unsupported XML format, auto-detection failed.")


def row_tag(dialect: str) -> str:
    return _ROW_TAGS[dialect]


# In-process presplit reuse: (abspath, size, mtime) -> parts dir. A
# re-ingest of the SAME file bytes (the preview->convert double-read,
# steady-state pipelines) skips re-splitting; any content change misses.
_PRESPLIT_CACHE: dict[tuple[str, int, float], str] = {}

# Content signatures that already parsed successfully under their
# registered schema — lets the registered-schema fast path skip its
# corruption head-probe for byte-identical re-ingests.
_VERIFIED_CONTENT: dict[tuple[str, str], tuple[int, float]] = {}

# Tiny category dimensions cached per exact file content (the rows, not
# the plan — bounded at _CATEGORY_CACHE_MAX_ROWS). Saves a full-file
# scan per re-ingest just to re-find ~100 <category> elements.
_CATEGORY_CACHE: dict[tuple[str, int, float], tuple] = {}
_CATEGORY_CACHE_MAX_ROWS = 100_000


def read_xml_records(
    spark: SparkSession,
    path: str,
    dialect: str | None = None,
    sample_bytes: int = 1 << 20,
    presplit_threshold: int = 16 << 20,
    feed_key: str | None = None,
    refresh_schema: bool = False,
) -> tuple[DataFrame, str]:
    """Read one XML catalog file into a (records_df, dialect) pair.

    Driver reads a head sample for validate/detect; Spark's XML source
    does the record parsing. If the initial parse yields only corrupt
    records, the repaired text is re-read (PERMISSIVE + repair pre-pass).

    Files above ``presplit_threshold`` bytes are auto-split at row-tag
    boundaries into a temp directory first — the XML source assigns one
    task per file, so without this a big single-file export would do
    BOTH its passes (structure inference + parse) serially.

    Re-ingest fast path: the first successful read registers its
    discovered StructType in ``schema_registry.DEFAULT_REGISTRY`` under
    ``(dialect, feed_key or abspath)``; later reads pass it as an
    explicit ``.schema()`` and skip the structure-discovery scan — one
    pass over the data instead of two. A head-sample drift check (any
    record tag/attribute missing from the registered schema) forces
    re-discovery, and ``refresh_schema=True`` forces it manually.
    """
    import atexit
    import shutil

    from magicxml_spark.sources.schema_registry import (
        DEFAULT_REGISTRY,
        sample_record_names,
        schema_covers,
    )

    with open(path, "rb") as f:
        sample = decode_bytes(f.read(sample_bytes))
    validate_xml_structure(sample)
    if dialect is None:
        dialect = detect_dialect(sample)

    orig_path = path
    if (
        os.path.isfile(path)
        and presplit_threshold
        and os.path.getsize(path) > presplit_threshold
    ):
        from magicxml_spark.sources.xml_split import presplit_xml

        st = os.stat(path)
        cache_key = (os.path.abspath(path), st.st_size, st.st_mtime)
        parts_dir = _PRESPLIT_CACHE.get(cache_key)
        if parts_dir is None or not os.path.isdir(parts_dir):
            parts_dir = tempfile.mkdtemp(prefix="mxs_presplit_")
            atexit.register(shutil.rmtree, parts_dir, ignore_errors=True)
            presplit_xml(path, parts_dir, _ROW_TAGS[dialect])
            _PRESPLIT_CACHE[cache_key] = parts_dir
        path = parts_dir

    key = feed_key or os.path.abspath(orig_path)
    schema = None if refresh_schema else DEFAULT_REGISTRY.get(dialect, key)
    if schema is not None:
        names = sample_record_names(sample, _ROW_TAGS[dialect])
        if names is not None and not schema_covers(schema, names):
            schema = None  # feed grew a field -> re-discover

    def _read(p: str) -> DataFrame:
        reader = (
            spark.read.format("xml")
            .option("rowTag", _ROW_TAGS[dialect])
            .option("inferSchema", "false")
            .option("mode", "PERMISSIVE")
        )
        if schema is not None:
            reader = reader.schema(schema)
        return reader.load(p)

    content_sig = None
    if os.path.isfile(orig_path):
        st = os.stat(orig_path)
        content_sig = (st.st_size, st.st_mtime)

    df = _read(path)
    if schema is not None:
        # Registered-schema fast path skipped discovery, so a feed that
        # turned corrupt since registration would silently parse to
        # all-null rows under PERMISSIVE instead of tripping the
        # corrupt-record check below. One head-row probe guards it —
        # skipped when these exact bytes already parsed fine.
        if _VERIFIED_CONTENT.get((dialect, key)) != content_sig:
            head = df.head(1)
            if not head or all(v is None for v in head[0]):
                DEFAULT_REGISTRY.invalidate(dialect, key)
                return read_xml_records(
                    spark,
                    orig_path,
                    dialect,
                    sample_bytes,
                    presplit_threshold,
                    feed_key,
                    refresh_schema=True,
                )
            if content_sig is not None:
                _VERIFIED_CONTENT[(dialect, key)] = content_sig
    elif df.columns and df.columns != ["_corrupt_record"]:
        DEFAULT_REGISTRY.put(dialect, key, df.schema)
        if content_sig is not None:
            _VERIFIED_CONTENT[(dialect, key)] = content_sig
    if not df.columns or df.columns == ["_corrupt_record"]:
        # parse produced nothing usable -> repair and retry. Always
        # repair from the ORIGINAL file — `path` may have been swapped
        # for the presplit parts directory (a repaired document parses
        # serially; corrupt giants are the rare path).
        with open(orig_path, "rb") as f:
            text = decode_bytes(f.read())
        repaired = repair_xml_text(clean_xml_text(text))
        tmp = tempfile.NamedTemporaryFile(
            "w", suffix=".xml", delete=False, encoding="utf-8"
        )
        tmp.write(repaired)
        tmp.close()
        # materialize before deleting the temp file — the scan is lazy
        df = _read(tmp.name).localCheckpoint(eager=True)
        os.unlink(tmp.name)
    return df, dialect


def read_categories(spark: SparkSession, path: str) -> DataFrame:
    """Category dimension (id, parent_id, name) from <category>
    elements (reference main.py:1477-1484). Tiny table — feeds the
    broadcast path builder (operators.category_path).

    Both the discovery scan and the resolved rows are cached per exact
    file content (path, size, mtime) — the preview->convert double-read
    and unchanged-feed re-ingests skip the full-file pass entirely; any
    content change misses and re-reads, so there is no drift risk. The
    row cache is bounded (dimension tables only); oversized results
    fall back to plain re-reads."""
    from pyspark.sql import functions as F

    from magicxml_spark.sources.schema_registry import DEFAULT_REGISTRY

    _SCHEMA = "id string, parent_id string, name string"
    key = os.path.abspath(path)
    sig_key = None
    if os.path.isfile(path):
        st = os.stat(path)
        sig_key = (key, st.st_size, st.st_mtime)
        key = f"{key}:{st.st_size}:{st.st_mtime}"
        cached = _CATEGORY_CACHE.get(sig_key)
        if cached is not None:
            return spark.createDataFrame(list(cached), _SCHEMA)
    schema = DEFAULT_REGISTRY.get("category", key)
    reader = (
        spark.read.format("xml")
        .option("rowTag", "category")
        .option("inferSchema", "false")
    )
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.load(path)
    if schema is None and df.columns:
        DEFAULT_REGISTRY.put("category", key, df.schema)
    cols = set(df.columns)
    if "_id" not in cols:  # no <category> elements in this document
        if sig_key is not None:
            _cache_categories(sig_key, ())
        return spark.createDataFrame([], _SCHEMA)
    parent = (
        F.col("_parentId").cast("string")
        if "_parentId" in cols
        else F.lit(None).cast("string")
    )
    name = (
        F.col("_VALUE").cast("string") if "_VALUE" in cols else F.lit(None).cast("string")
    )
    out = df.select(
        F.col("_id").cast("string").alias("id"),
        parent.alias("parent_id"),
        F.coalesce(name, F.lit("Undefined")).alias("name"),
    )
    if sig_key is None:
        return out
    # dimension-sized results are collected once and replayed from the
    # driver on re-ingest; oversized results stay lazy and uncached
    rows = out.limit(_CATEGORY_CACHE_MAX_ROWS + 1).collect()
    if len(rows) > _CATEGORY_CACHE_MAX_ROWS:
        return out
    _cache_categories(sig_key, tuple(rows))
    return spark.createDataFrame(list(rows), _SCHEMA) if rows else (
        spark.createDataFrame([], _SCHEMA)
    )


def _cache_categories(sig_key: tuple, rows: tuple) -> None:
    if len(_CATEGORY_CACHE) >= 16:  # bound driver memory; evict oldest
        _CATEGORY_CACHE.pop(next(iter(_CATEGORY_CACHE)))
    _CATEGORY_CACHE[sig_key] = rows
