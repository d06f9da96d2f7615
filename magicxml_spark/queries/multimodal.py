"""Multimodal near-dup invariant queries — driver-visible correctness
gates for the image / video / audio fingerprint stacks.

The driver testdata has no media tables, so each query synthesizes a
deterministic corpus from ``documents`` ids (sources/synth_media) and
plants an EXACT byte copy of every k-th item under the negative id
``-id - 1`` (collision-free at any scale factor). Byte-identical
content provably fingerprints identically through every stack —
identical pHash (Hamming 0), identical MinHash signatures (same band
buckets), jaccard exactly 1.0 — so with the exact uncapped pair path
(``max_bucket_size=None``, the q_winnow_pairs precedent for
driver-gated exact emission; the capped production defaults are
pytest-pinned in test_phash/test_audio_features) every planted copy
MUST pair with its original: ``planted_missed`` is pinned 0 and the
row counts are plain-SQL algebra. This is the established
invariant-oracle pattern (q_embedding_cluster_dedup,
q_lsh_xxhash64_recall) for non-SQL-expressible operators.

Sizing: moduli keep the synthesized corpora small relative to the SF
(images n/5, audio n/10, videos n/25 of the documents table) so the
queries stay cheap at driver SF while still scaling with the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from magicxml_spark.queries import query
from magicxml_spark.sources.synth_media import (
    planted_invariant_stats,
    synth_media_df,
)
from magicxml_spark.tables import table


def _ids(spark: SparkSession, sf_dir: str, mod: int) -> DataFrame:
    return (
        table(spark, sf_dir, "documents")
        .select("doc_id")
        .filter(F.col("doc_id") % mod == 0)
    )


def _planted_oracle(mod: int, plant_mod: int) -> str:
    return f"""
    WITH b AS (SELECT doc_id FROM documents WHERE doc_id % {mod} = 0)
    SELECT CAST(count(*) + count(CASE WHEN doc_id % {plant_mod} = 0 THEN 1 END)
                AS BIGINT) AS n_input,
           CAST(count(CASE WHEN doc_id % {plant_mod} = 0 THEN 1 END)
                AS BIGINT) AS n_planted,
           CAST(0 AS BIGINT) AS planted_missed
    FROM b
    """


# --- Image near-dup: pHash + pigeonhole Hamming join --------------------------
@query("q_image_near_dup", oracle=_planted_oracle(5, 10))
def q_image_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic PNGs (png_lite encode, image_lite decode — the real
    S11 path) hashed by the DCT pHash; exact copies are Hamming-0 and
    must survive the pigeonhole banded join."""
    from magicxml_spark.operators.phash import image_near_dup_pairs

    ids = _ids(spark, sf_dir, 5)
    media = synth_media_df(ids, "png", plant_mod=10)
    pairs = image_near_dup_pairs(
        media, "id", "content", max_hamming=7, max_bucket_size=None
    )
    return planted_invariant_stats(ids, 10, pairs)


# --- Video near-dup: frame pHash tokens through MinHash-LSH -------------------
@query("q_video_near_dup", oracle=_planted_oracle(25, 50))
def q_video_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic MJPEG AVIs (jpeg_lite + riff_media) rendered as
    frame-token documents; exact copies share every token (jaccard
    1.0) and must survive MinHash banding + the Jaccard verify."""
    from magicxml_spark.operators.phash import video_near_dup_pairs

    ids = _ids(spark, sf_dir, 25)
    media = synth_media_df(ids, "avi", plant_mod=50)
    pairs = video_near_dup_pairs(
        media, "id", "content", min_jaccard=0.9, max_bucket_size=None
    )
    return planted_invariant_stats(ids, 50, pairs)


# --- Audio near-dup: Haitsma-Kalker fingerprints through MinHash --------------
@query("q_audio_near_dup", oracle=_planted_oracle(10, 20))
def q_audio_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic three-tone WAVs through the real DSP chain (Hann STFT
    -> log-mel -> HK sign-of-delta-delta fingerprints); exact copies
    share every fingerprint token and must pair at jaccard 1.0."""
    from magicxml_spark.operators.audio_features import audio_near_dup_pairs

    ids = _ids(spark, sf_dir, 10)
    media = synth_media_df(ids, "wav", plant_mod=20)
    pairs = audio_near_dup_pairs(
        media, "id", "content", min_jaccard=0.9, max_bucket_size=None
    )
    return planted_invariant_stats(ids, 20, pairs)
