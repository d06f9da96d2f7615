"""K1/K2: the flagship CSV sink (reference main.py:1566-1582).

Reference format: ';' delimiter, header, QUOTE_MINIMAL with '"'->'""'
escaping, utf-8-sig (BOM), newline->space per value, size-field
'?'-strip, ROOM_TYPE/PURPOSE ', '->'///' rewrite.

Two modes:
* distributed (default): ``df.write.csv`` — one part per partition,
  quoting/escaping handled by the writer. The 100 TB path.
* single_file: coalesce(1) + driver-side rename + BOM prepend —
  byte-compatible with the reference's output for bounded exports
  (an explicit scalability tradeoff, SURVEY §7 hard-part (e)).
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from magicxml_spark.functions.strings import csv_normalize_value
from magicxml_spark.operators.pruning import prune_columns


def _c(name: str):
    # backtick-quote: flattened columns may contain '.', '-' etc.
    return F.col("`" + name.replace("`", "") + "`")


def normalize_for_csv(df: DataFrame) -> DataFrame:
    """P19 value normalization over every string column."""
    exprs = []
    for name, dtype in df.dtypes:
        if dtype == "string":
            exprs.append(csv_normalize_value(name, _c(name)).alias(name))
        else:
            exprs.append(_c(name))
    return df.select(*exprs)


def write_csv(
    df: DataFrame,
    path: str,
    single_file: bool = False,
    prune: bool = True,
    delimiter: str = ";",
) -> str:
    """Write the conversion-boundary CSV. Returns the output path
    (a directory of parts, or the single file in single_file mode)."""
    out = prune_columns(df) if prune else df
    out = normalize_for_csv(out)
    # repartition(1), NOT coalesce(1): coalesce would collapse the whole
    # upstream compute into one task; the shuffle boundary keeps
    # flatten/normalize parallel and only the final write is serial
    writer = (
        out.repartition(1) if single_file else out
    ).write.mode("overwrite").options(
        header=True, sep=delimiter, quote='"', escape='"', emptyValue=""
    )
    if not single_file:
        writer.csv(path)
        return path
    tmp_dir = path + "._parts"
    writer.csv(tmp_dir)
    part = glob.glob(os.path.join(tmp_dir, "part-*.csv"))[0]
    with open(path, "wb") as dst:
        dst.write(b"\xef\xbb\xbf")  # utf-8-sig BOM (main.py:1566)
        with open(part, "rb") as src:
            shutil.copyfileobj(src, dst)
    shutil.rmtree(tmp_dir)
    return path
