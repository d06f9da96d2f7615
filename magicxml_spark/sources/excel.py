"""S7/K5: Excel source & sink (reference main.py:734, 683-718).

Excel is not a Spark-native format; the reference shells out to
pandas/openpyxl and so do we — driver-side and bounded by an explicit
row limit (the reference's inputs are capped at 100 MB uploads).
Import-gated: openpyxl may be absent."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def _require_openpyxl() -> None:
    try:
        import openpyxl  # noqa: F401
    except ImportError as exc:  # pragma: no cover
        raise NotImplementedError(
            "Excel support requires openpyxl (not installed in this image)"
        ) from exc


def read_excel(spark: SparkSession, path: str) -> DataFrame:
    _require_openpyxl()
    import pandas as pd

    pdf = pd.read_excel(path).fillna("")
    return spark.createDataFrame(pdf.astype(str))


def write_excel(df: DataFrame, path: str, max_rows: int = 1_000_000) -> str:
    """K5: driver-side writer with the reference's per-column
    auto-width = min(max len + 2, 50) (main.py:683-718)."""
    _require_openpyxl()
    from openpyxl.utils import get_column_letter

    pdf = df.limit(max_rows).toPandas()
    with __import__("pandas").ExcelWriter(path, engine="openpyxl") as writer:
        pdf.to_excel(writer, index=False, sheet_name="Data")
        ws = writer.sheets["Data"]
        for i, col in enumerate(pdf.columns, 1):
            width = max(
                [len(str(col))] + [len(str(v)) for v in pdf[col].head(1000)]
            )
            ws.column_dimensions[get_column_letter(i)].width = min(width + 2, 50)
    return path


def excel_to_pdf_rows(spark: SparkSession, path: str, style: str = "table") -> DataFrame:
    """K9 (main.py:1155-1170): Excel -> (CSV-shaped rows) -> PDF report
    composition; the reportlab render is gated like K8, so the engine's
    output is the capped row set the report would contain."""
    from magicxml_spark.sources.binary_docs import pdf_report_rows

    return pdf_report_rows(read_excel(spark, path), style=style)
