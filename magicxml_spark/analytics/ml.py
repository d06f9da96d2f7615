"""A1/A2: TF-IDF vectorization + PCA projection via Spark ML
(reference assets/TF-IDF Visualization/main.py:26-30 uses sklearn's
TfidfVectorizer + PCA(3); the Spark spelling is the ML Pipeline —
distributed fit, no driver-side matrix).

These produce ML vectors (float-heavy, sign/basis-indeterminate for
PCA), so they're covered by property tests rather than the DuckDB
value oracle; the SQL-checkable scalar core of TF-IDF lives in
queries/analytics.q_tfidf_top_terms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tfidf_vectors(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "tfidf",
    num_features: int = 1 << 12,
) -> DataFrame:
    """Tokenize -> HashingTF -> IDF. Returns df + a Vector column."""
    from pyspark.ml.feature import IDF, HashingTF, RegexTokenizer

    tok = RegexTokenizer(
        inputCol=text_col, outputCol="_tokens", pattern="\\s+", toLowercase=True
    )
    tf = HashingTF(inputCol="_tokens", outputCol="_tf", numFeatures=num_features)
    with_tf = tf.transform(tok.transform(df))
    idf = IDF(inputCol="_tf", outputCol=out_col).fit(with_tf)
    return idf.transform(with_tf).drop("_tokens", "_tf")


def pca_project(
    df: DataFrame, vec_col: str = "tfidf", out_col: str = "pca", k: int = 3
) -> DataFrame:
    """PCA(k) over a Vector column (reference projects TF-IDF to 3-D)."""
    from pyspark.ml.feature import PCA

    model = PCA(k=k, inputCol=vec_col, outputCol=out_col).fit(df)
    return model.transform(df)


def embedding_to_vector(df: DataFrame, arr_col: str, out_col: str) -> DataFrame:
    """array<float> -> ML Vector (bridges the embeddings table into
    Spark ML ops like BucketedRandomProjectionLSH)."""
    from pyspark.ml.functions import array_to_vector

    return df.withColumn(out_col, array_to_vector(F.col(arr_col)))
