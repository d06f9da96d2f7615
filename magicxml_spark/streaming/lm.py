"""Streaming frozen-LM scoring — CCNet's score-the-crawl lifecycle as
a stream (Wenzek et al. 2020 §4.2: a crawl feed scored against a
frozen target-domain LM). Scoring against a :func:`write_lm_snapshot`
snapshot is a STATELESS map per micro-batch: every position of a
document arrives inside the document's own row, so no state crosses
batch boundaries — each batch joins against the frozen parquet tables
and aggregates per document, exactly the batch scorer, applied per
trigger. This completes the snapshot family's lifecycle symmetry
(dedup and IVF snapshots already have streaming/incremental arms;
VERDICT r8 "What's missing #3").

Sink: overwrite-by-batch-id parquet (the stream_to_csv_exactly_once
recipe) — a replayed batch lands in the same directory instead of
duplicating scores, so the harness's read-back is exactly-once without
a transactional sink.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

from magicxml_spark.streaming.dedup import read_documents_stream
from magicxml_spark.streaming.events import _checkpoint_dir, _stream_tuning


def _run_frozen_score(
    spark: SparkSession,
    sf_dir: str,
    score_fn,
    out_dir: str,
    name_prefix: str,
    doc_filter=None,
    state_partitions: int = 2,
    max_files_per_trigger: int | None = None,
    path_glob: str = "documents.parquet",
) -> DataFrame:
    """Shared frozen-model stream scorer: stateless map per
    micro-batch (``score_fn(batch_df) -> scored_df``), overwrite-by-
    batch-id parquet sink (exactly-once), checkpoint cleaned up after
    the availableNow run drains. Both public scorers are this body
    with a different frozen model behind ``score_fn``."""
    name = f"{name_prefix}_{uuid.uuid4().hex[:8]}"

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        score_fn(batch_df.select("doc_id", "text")).write.mode(
            "overwrite"
        ).parquet(os.path.join(out_dir, f"batch={batch_id}"))

    with _stream_tuning(spark, state_partitions):
        docs = read_documents_stream(
            spark,
            sf_dir,
            max_files_per_trigger=max_files_per_trigger,
            path_glob=path_glob,
        )
        if doc_filter is not None:
            docs = docs.filter(doc_filter)
        q = (
            docs.writeStream.outputMode("append")
            .foreachBatch(sink)
            .option("checkpointLocation", _checkpoint_dir(name))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    shutil.rmtree(_checkpoint_dir(name), ignore_errors=True)
    return spark.read.parquet(os.path.join(out_dir, "batch=*"))


def run_stream_lm_score(
    spark: SparkSession,
    sf_dir: str,
    snapshot_path: str,
    out_dir: str,
    doc_filter=None,
    lam: float = 0.75,
    state_partitions: int = 2,
    max_files_per_trigger: int | None = None,
    path_glob: str = "documents.parquet",
) -> DataFrame:
    """Score the document stream under ``sf_dir`` against the frozen
    LM snapshot at ``snapshot_path``; returns the scored frame
    (doc_id, n_tokens, surprisal) read back from the per-batch parquet
    under ``out_dir``. ``doc_filter`` (a Column predicate) selects the
    streamed subset (e.g. the odd-doc crawl half of a train/score
    split); ``max_files_per_trigger`` forces multi-batch execution so
    tests can prove per-batch statelessness.

    Scale shape: each micro-batch is one pass over the batch joined
    against the snapshot parquet (hint-free — AQE broadcasts the
    tables while they measure small); the only cross-batch artifact
    is the immutable snapshot itself. State stores hold NOTHING —
    there is no watermark and no stateful operator in the plan."""
    from magicxml_spark.operators.curation import score_with_lm_snapshot

    return _run_frozen_score(
        spark,
        sf_dir,
        lambda batch: score_with_lm_snapshot(batch, snapshot_path, lam=lam),
        out_dir,
        "lm_score",
        doc_filter=doc_filter,
        state_partitions=state_partitions,
        max_files_per_trigger=max_files_per_trigger,
        path_glob=path_glob,
    )


def run_stream_dsir_score(
    spark: SparkSession,
    sf_dir: str,
    model_path: str,
    out_dir: str,
    doc_filter=None,
    state_partitions: int = 2,
    max_files_per_trigger: int | None = None,
    path_glob: str = "documents.parquet",
) -> DataFrame:
    """Streaming twin of :func:`operators.dsir.score_with_dsir_model`:
    score a document stream against a frozen DSIR bucket model — the
    same stateless shape as :func:`run_stream_lm_score` (shared body).
    Returns (doc_id, n_grams, log_w) read back from ``out_dir``."""
    from magicxml_spark.operators.dsir import score_with_dsir_model

    return _run_frozen_score(
        spark,
        sf_dir,
        lambda batch: score_with_dsir_model(batch, model_path),
        out_dir,
        "dsir_score",
        doc_filter=doc_filter,
        state_partitions=state_partitions,
        max_files_per_trigger=max_files_per_trigger,
        path_glob=path_glob,
    )


def run_stream_chunk(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    chunk_tokens: int = 64,
    overlap: int = 16,
    doc_filter=None,
    state_partitions: int = 2,
    max_files_per_trigger: int | None = None,
    path_glob: str = "documents.parquet",
) -> DataFrame:
    """Streaming twin of :func:`operators.extraction.chunk_documents`
    (VERDICT r9 #9): chunking is a pure per-document map — no model,
    no state, no cross-batch artifact at all — so the shared stateless
    foreachBatch body applies it per micro-batch with the
    overwrite-by-batch-id exactly-once sink. Completes the chunk/pack
    lifecycle symmetry (stream == batch pinned in tests; intentionally
    NOT a registered query — the batch operator already carries the
    oracle).

    Returns (doc_id, chunk_id, start_tok, n_tokens, chunk_text) read
    back from ``out_dir``."""
    from magicxml_spark.operators.extraction import chunk_documents

    return _run_frozen_score(
        spark,
        sf_dir,
        lambda batch: chunk_documents(
            batch, chunk_tokens=chunk_tokens, overlap=overlap
        ),
        out_dir,
        "chunk",
        doc_filter=doc_filter,
        state_partitions=state_partitions,
        max_files_per_trigger=max_files_per_trigger,
        path_glob=path_glob,
    )


def run_stream_lang_id(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    doc_filter=None,
    state_partitions: int = 2,
    max_files_per_trigger: int | None = None,
    path_glob: str = "documents.parquet",
) -> DataFrame:
    """Streaming twin of :func:`operators.langid.lang_id` — langid is
    the stage-0 gate of a crawl-ingest stream, and like chunking it is
    a pure per-document map (embedded profile tables, no model files,
    no state). Stream == batch pinned in tests; not a registered query
    (the batch operator carries the oracle). Returns
    (doc_id, script, lang, hits, n_letters) read back from
    ``out_dir``."""
    from magicxml_spark.operators.langid import lang_id

    return _run_frozen_score(
        spark,
        sf_dir,
        lambda batch: lang_id(batch),
        out_dir,
        "lang_id",
        doc_filter=doc_filter,
        state_partitions=state_partitions,
        max_files_per_trigger=max_files_per_trigger,
        path_glob=path_glob,
    )


def run_stream_normalize(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    doc_filter=None,
    state_partitions: int = 2,
    max_files_per_trigger: int | None = None,
    path_glob: str = "documents.parquet",
) -> DataFrame:
    """Streaming twin of :func:`operators.normalize.normalize_text` —
    pre-hash normalization is the stage-0 map of a crawl-ingest
    stream, stateless per document (the Arrow NFC stage included: a
    pandas UDF is a plain per-batch map under Structured Streaming).
    Stream == batch pinned in tests; not a registered query (the
    batch operator carries the oracle). Returns (doc_id, norm_fp,
    n_strip_len) read back from ``out_dir``: ``norm_fp`` fingerprints
    the FULLY normalized text (all stages including the Arrow NFC
    pass), while ``n_strip_len`` is deliberately the ``form=None``
    strip-only length — a pure-Column signal that keeps the second
    output entirely JVM-side instead of running the Arrow stage
    twice per batch (NFC is length-changing only on decomposed
    input, which the fp already catches)."""
    from pyspark.sql import functions as F

    from magicxml_spark.operators.normalize import norm_text_col

    def score(batch: DataFrame) -> DataFrame:
        return batch.select(
            "doc_id",
            F.md5(norm_text_col(F.col("text"))).alias("norm_fp"),
            F.length(norm_text_col(F.col("text"), form=None)).cast(
                "long"
            ).alias("n_strip_len"),
        )

    return _run_frozen_score(
        spark,
        sf_dir,
        score,
        out_dir,
        "normalize",
        doc_filter=doc_filter,
        state_partitions=state_partitions,
        max_files_per_trigger=max_files_per_trigger,
        path_glob=path_glob,
    )


def run_stream_paragraph_curation(
    spark: SparkSession,
    sf_dir: str,
    snapshot_path: str,
    out_dir: str,
    doc_filter=None,
    keep_lang: str = "en",
    max_surprisal: float | None = None,
    synth=None,
    state_partitions: int = 2,
    max_files_per_trigger: int | None = None,
    path_glob: str = "documents.parquet",
) -> DataFrame:
    """Streaming twin of
    :func:`operators.curation.paragraph_curation` — once the LM is
    frozen, the whole paragraph decision (split -> langid ->
    frozen-LM surprisal -> keep -> rebuild) is DOCUMENT-LOCAL: every
    paragraph of a doc arrives inside the doc's own row, every
    aggregate keys on the doc id, and no state crosses batch
    boundaries — curation is a stateless map per micro-batch, the
    :func:`run_stream_lm_score` shape. ``synth`` optionally rewrites
    each batch before curation (the registered query injects its
    synthesis corpus there). Returns
    (doc_id, n_paras, n_kept, text_fp) read back from ``out_dir``."""
    from pyspark.sql import functions as F

    from magicxml_spark.operators.curation import paragraph_curation

    def score(batch: DataFrame) -> DataFrame:
        if synth is not None:
            batch = synth(batch)
        out = paragraph_curation(
            batch,
            snapshot_path,
            keep_lang=keep_lang,
            max_surprisal=max_surprisal,
        )
        return out.select(
            "doc_id",
            "n_paras",
            "n_kept",
            F.md5("text_kept").alias("text_fp"),
        )

    return _run_frozen_score(
        spark,
        sf_dir,
        score,
        out_dir,
        "para_cur",
        doc_filter=doc_filter,
        state_partitions=state_partitions,
        max_files_per_trigger=max_files_per_trigger,
        path_glob=path_glob,
    )
