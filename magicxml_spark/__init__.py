"""magicxml_spark — a PySpark-native analytics & format-conversion engine.

Brand-new engine (NOT a port) with the query and data-processing
capabilities of the reference repo Solrikk/MagicXML (see SURVEY.md),
re-expressed as idiomatic Spark: DataFrame/SQL plans optimized by
Catalyst, Arrow-batched pandas UDFs only where built-ins can't express
the semantics, Structured Streaming for the streaming extension.

Layout:
    session     -- SparkSession factory tuned for local[] and cluster use
    tables      -- testdata table loaders / temp-view registration
    functions/  -- pure Column-level scalar functions (string surgery etc.)
    operators/  -- DataFrame->DataFrame operators (flatten, dedup, ...)
    sources/    -- readers: XML (4 dialects), CSV sniffing, JSON, Excel, PDF
    sinks/      -- writers: CSV (BOM), YML/simple XML, JSON envelope, ...
    plans/      -- end-to-end conversion pipelines composed from the above
    streaming/  -- Structured Streaming views of the events table
    analytics/  -- LLM-data-pipeline ops: dedup, similarity, text quality
"""

__version__ = "0.1.0"

from magicxml_spark.session import get_spark  # noqa: F401
