"""K6/K7: JSON sinks (reference main.py:809-883).

K6 'array' format: a JSON array of row objects.
K6 'object' format: {"data": [...], "total": N, "exported_at": ts}.
K7 XML->JSON document conversion: @attr / #text conventions with
repeated tags promoted to lists — the Spark spelling is a rename pass
over the XML reader's struct (attrs are '_'-prefixed, text is _VALUE)
followed by to_json.
"""

from __future__ import annotations

import json

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def write_json_rows(df: DataFrame, path: str) -> str:
    """Distributed JSON-lines write (the scale path)."""
    df.write.mode("overwrite").json(path)
    return path


def write_json_array(df: DataFrame, path: str) -> str:
    """K6 'array': one JSON array document (bounded; streams rows)."""
    with open(path, "w", encoding="utf-8") as f:
        f.write("[")
        first = True
        for row in df.toJSON().toLocalIterator():
            if not first:
                f.write(",")
            f.write(row)
            first = False
        f.write("]")
    return path


def write_json_envelope(df: DataFrame, path: str, exported_at: str = "") -> str:
    """K6 'object': {data, total, exported_at} (main.py:814-828).
    total = count() — one extra action, the data streams."""
    total = df.count()
    with open(path, "w", encoding="utf-8") as f:
        f.write('{"data":[')
        first = True
        for row in df.toJSON().toLocalIterator():
            if not first:
                f.write(",")
            f.write(row)
            first = False
        f.write(f'],"total":{total},"exported_at":{json.dumps(exported_at)}}}')
    return path


def xml_struct_to_json_conventions(dt: T.DataType, c: Column) -> Column:
    """K7 (main.py:841-862): rebuild a struct column with '@' attribute
    prefixes and '#text' for element text; repeated tags are already
    lists in the reader's schema."""
    if isinstance(dt, T.StructType):
        fields = []
        for f in dt.fields:
            sub = xml_struct_to_json_conventions(f.dataType, c[f.name])
            if f.name.startswith("_") and f.name != "_VALUE":
                fields.append(sub.alias("@" + f.name[1:]))
            elif f.name == "_VALUE":
                fields.append(sub.alias("#text"))
            else:
                fields.append(sub.alias(f.name))
        return F.struct(*fields)
    if isinstance(dt, T.ArrayType):
        if isinstance(dt.elementType, (T.StructType, T.ArrayType)):
            return F.transform(
                c, lambda e: xml_struct_to_json_conventions(dt.elementType, e)
            )
        return c
    return c


def xml_records_to_json(df: DataFrame) -> DataFrame:
    """K7: one JSON document string per XML record."""
    converted = xml_struct_to_json_conventions(
        T.StructType(df.schema.fields), F.struct(*[F.col(f.name) for f in df.schema.fields])
    )
    return df.select(F.to_json(converted).alias("json"))
