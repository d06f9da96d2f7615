"""Analytics extension (SURVEY §2.7 A1-A5 + LLM-pipeline dedup
clustering)."""

from magicxml_spark.analytics.ml import pca_project, tfidf_vectors  # noqa: F401
from magicxml_spark.analytics.clusters import dedup_clusters  # noqa: F401
