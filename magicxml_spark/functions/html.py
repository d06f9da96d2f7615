"""P17: description HTML cleaning (reference main.py:57-76).

Reference semantics: parse HTML, unwrap every tag except <p> and <br>
(keeping inner text), wrap bare top-level text in <p>...</p>.

Two implementations:

* ``clean_description`` — JVM-side regexp chain (the hot path). Strips
  all tags except p/br, then wraps the result in <p> if it doesn't
  already start with one. Covers the common product-feed cases without
  leaving whole-stage codegen.
* ``clean_description_udf`` — faithful BeautifulSoup route as an
  Arrow-batched pandas UDF, gated behind an import-try (bs4 may be
  absent); use only when exact parser fidelity is required.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tags to keep. Everything else (open or close, with attrs) is unwrapped.
_DROP_TAG = "(?i)</?(?!p\\b|br\\b)[a-zA-Z][^>]*>"


def clean_description(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.trim(F.regexp_replace(c, _DROP_TAG, ""))
    wrapped = F.when(
        (stripped == "") | stripped.rlike("(?i)^<(p|br)\\b"),
        stripped,
    ).otherwise(F.concat(F.lit("<p>"), stripped, F.lit("</p>")))
    return F.coalesce(wrapped, F.lit(""))


def _bs4_clean(text: str) -> str:
    # Mirrors reference main.py:57-76 semantics (parser-fallback chain,
    # unwrap non-p/br, wrap bare text); reimplemented, not copied.
    if not text:
        return ""
    try:
        from bs4 import BeautifulSoup
    except ImportError:  # pragma: no cover - bs4 absent in this image
        raise NotImplementedError("bs4 not installed; use clean_description()")
    for parser in ("html5lib", "lxml", "html.parser"):
        try:
            soup = BeautifulSoup(text, parser)
            break
        except Exception:
            continue
    for tag in soup.find_all(True):
        if tag.name not in ("p", "br"):
            tag.unwrap()
    for node in list(soup.contents):
        if isinstance(node, str) and node.strip():
            p = soup.new_tag("p")
            p.string = node.strip()
            node.replace_with(p)
    return str(soup)


def clean_description_udf() -> Column:
    """Factory for the faithful pandas-UDF variant (Arrow-batched)."""
    import pandas as pd

    @F.pandas_udf("string")
    def _clean(s: pd.Series) -> pd.Series:
        return s.fillna("").map(_bs4_clean)

    return _clean
