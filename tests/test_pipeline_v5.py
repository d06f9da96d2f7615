"""Stage-effect pins for the composed curation v5 pipeline — every
stage must do REAL work on the synthesis corpus (the non-vacuity
standard: a rule with no over-threshold docs is a rule the parity
gate never exercises). Runs the EXACT synth frame the registered
query uses (_v5_synth_spark is shared, not copied)."""

from __future__ import annotations

from pyspark.sql import functions as F

from magicxml_spark.operators.curation import c4_span_dedup, gopher_quality
from magicxml_spark.operators.extraction import justext_boilerplate
from magicxml_spark.operators.langid import with_lang
from magicxml_spark.queries.pipeline import _v5_synth_spark

SF = "/root/testdata/sf0.001"


def test_v5_every_stage_is_non_vacuous(spark):
    synth = _v5_synth_spark(spark, SF).localCheckpoint(eager=True)
    n0 = synth.count()

    # stage 0: the COMPUTED langid gate removes exactly the injected
    # German (doc%10==7) and Russian (doc%10==3) documents
    langed = with_lang(synth).localCheckpoint(eager=True)
    dropped = langed.filter(F.col("lang") != "en")
    drop_rows = dropped.select("doc_id", "lang").collect()
    assert len(drop_rows) > 0
    for r in drop_rows:
        assert r["doc_id"] % 10 in (3, 7)
        assert r["lang"] == ("de" if r["doc_id"] % 10 == 7 else "ru")
    en = langed.filter(F.col("lang") == "en").select("doc_id", "text")
    n1 = en.count()
    assert n1 == n0 - len(drop_rows) and n1 < n0

    # stage 1: jusText removes material from every doc (the keyword
    # soup para always dies; copyright docs lose that para too)
    main = (
        justext_boilerplate(en)
        .select("doc_id", "n_paras", "n_good", F.col("text_main").alias("text"))
        .localCheckpoint(eager=True)
    )
    assert main.filter(F.col("n_good") >= F.col("n_paras")).count() == 0
    assert main.filter(F.col("n_good") == 0).count() == 0  # nothing emptied

    # stage 2: the Gopher gate kills EXACTLY the doc%9 repetition
    # bombs (their 'we do it and' run trips the dup-5gram cap; no
    # clean doc trips any cap)
    gq = gopher_quality(main.select("doc_id", "text"))
    killed = [r["doc_id"] for r in gq.filter(~F.col("keep")).select("doc_id").collect()]
    assert len(killed) > 0 and all(i % 9 == 0 for i in killed)
    surviving_nine = en.filter(F.col("doc_id") % 9 == 0).count()
    assert len(killed) == surviving_nine  # every bomb doc dies

    # stage 3: corpus-wide span dedup removes the shared boilerplate
    # paragraph's 3-sentence span from every doc EXCEPT the single
    # first-occurrence keeper
    gated = main.select("doc_id", "text").join(
        gq.filter(F.col("keep")).select("doc_id"), "doc_id"
    )
    cs = c4_span_dedup(gated)
    n2 = gated.count()
    untouched = cs.filter(F.col("n_kept") == F.col("n_sentences")).count()
    assert untouched == 1  # the keeper doc alone retains the boiler span
    assert cs.filter(F.col("n_kept") < F.col("n_sentences")).count() == n2 - 1
