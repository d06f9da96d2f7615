"""DataFrame->DataFrame operators (SURVEY.md §2 + LLM-pipeline extension)."""

from magicxml_spark.operators.category_path import build_category_paths  # noqa: F401
