"""Pure Column-level scalar functions (SURVEY.md §2.3).

Everything here is built from `pyspark.sql.functions` so it stays
JVM-side inside whole-stage codegen — no Python in the hot path.
"""

from magicxml_spark.functions.strings import (  # noqa: F401
    csv_normalize_value,
    decimal_comma_quirk,
    dedup_delimited,
    default_available,
    first_wins,
    md5_short_id,
    sanitize_name,
    strip_size_question,
)
from magicxml_spark.functions.html import clean_description  # noqa: F401
