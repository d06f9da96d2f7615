"""Stage-effect pins for the composed curation v6 pipeline (the
FineWeb recipe) — every stage must do REAL work on the synthesis
corpus, including the two r11 additions: the langid SCORE threshold
and the MinHash fuzzy-dedup stage. Runs the EXACT synth frame the
registered query uses (_v6_synth_spark is shared, not copied)."""

from __future__ import annotations

from pyspark.sql import functions as F

from magicxml_spark.analytics.clusters import dedup_clusters
from magicxml_spark.operators.curation import fineweb_quality, gopher_quality
from magicxml_spark.operators.dedup import lsh_candidate_pairs
from magicxml_spark.operators.extraction import justext_boilerplate
from magicxml_spark.operators.langid import with_lang
from magicxml_spark.queries.pipeline import _V6_MIN_SCORE, _v6_synth_spark

SF = "/root/testdata/sf0.001"


def test_v6_every_stage_is_non_vacuous(spark):
    synth = _v6_synth_spark(spark, SF).localCheckpoint(eager=True)
    n0 = synth.count()

    # stage 0a: WITHOUT the threshold, only the DE/RU docs are
    # non-English; the class-1 (jusText-stopword) docs still read 'en'
    plain = with_lang(synth, max_chars=1000).localCheckpoint(eager=True)
    for r in plain.filter(F.col("lang") != "en").select(
        "doc_id", "lang"
    ).collect():
        assert r["doc_id"] % 10 in (3, 7)
        assert r["lang"] == ("de" if r["doc_id"] % 10 == 7 else "ru")

    # stage 0b: WITH the threshold, the class-1 docs flip to 'und' —
    # the score gate is LOAD-BEARING (the pinned gate-decision diff)
    gated_lang = with_lang(
        synth, max_chars=1000, min_score=_V6_MIN_SCORE
    ).localCheckpoint(eager=True)
    # (%9==0 class-1 docs keep 'en': the bomb's 'it'/'and' repetitions
    # push their score just over the gate — they die at Gopher instead;
    # deterministic in both engines)
    flipped = gated_lang.filter(F.col("lang") == "und").filter(
        F.col("doc_id") % 10 == 1
    )
    n_class1_clean = synth.filter(
        (F.col("doc_id") % 10 == 1) & (F.col("doc_id") % 9 != 0)
    ).count()
    assert flipped.count() == n_class1_clean > 0
    # their evidence survives: en margin small but positive via
    # the 'the'/'with' plants
    sample = gated_lang.filter(
        (F.col("doc_id") % 10 == 1) & (F.col("doc_id") % 9 != 0)
    ).select("lang_margin", "lang_score").first()
    assert sample["lang_margin"] > 0
    assert 0 < sample["lang_score"] < _V6_MIN_SCORE

    en = gated_lang.filter(F.col("lang") == "en").select("doc_id", "text")
    n1 = en.count()
    assert n1 < n0 - n_class1_clean + 1  # DE+RU+clean class-1 all gone

    # stage 1: jusText removes the soup/copyright material; no doc
    # empties (body paragraphs are stopword-dense and >200 chars)
    main = (
        justext_boilerplate(en)
        .select(
            "doc_id", "n_paras", "n_good", F.col("text_main").alias("text")
        )
        .localCheckpoint(eager=True)
    )
    assert main.filter(F.col("n_good") == 0).count() == 0
    assert main.filter(F.col("text").contains("Copyright")).count() == 0
    trimmed = main.filter(F.col("n_good") < F.col("n_paras")).count()
    assert trimmed > 0  # copyright/soup docs lost paragraphs

    # stage 2: Gopher kills EXACTLY the %9 bombs
    gq = gopher_quality(main.select("doc_id", "text"))
    killed = [
        r["doc_id"]
        for r in gq.filter(~F.col("keep")).select("doc_id").collect()
    ]
    assert len(killed) > 0 and all(i % 9 == 0 for i in killed)
    assert len(killed) == en.filter(F.col("doc_id") % 9 == 0).count()

    gated = main.select("doc_id", "text").join(
        gq.filter(F.col("keep")).select("doc_id"), "doc_id"
    )

    # stage 3: FineWeb custom gate kills EXACTLY the %10==6 listy docs
    fw = fineweb_quality(gated)
    fw_killed = [
        r["doc_id"]
        for r in fw.filter(~F.col("keep")).select("doc_id").collect()
    ]
    assert len(fw_killed) > 0 and all(i % 10 == 6 for i in fw_killed)
    assert len(fw_killed) == gated.filter(F.col("doc_id") % 10 == 6).count()
    fwgated = gated.join(
        fw.filter(F.col("keep")).select("doc_id"), "doc_id"
    ).localCheckpoint(eager=True)

    # stage 4: MinHash dedup drops EXACTLY the class-5 near-dups whose
    # partner (d-1) survived; nothing else clusters (u-words are
    # collision-free by construction)
    pairs = lsh_candidate_pairs(fwgated, "doc_id", "text")
    clusters = dedup_clusters(
        fwgated.select(F.col("doc_id").alias("id")), pairs
    )
    dropped = [
        r["id"]
        for r in clusters.filter(F.col("id") != F.col("cluster_id")).collect()
    ]
    assert len(dropped) > 0 and all(i % 10 == 5 for i in dropped)
    surviving = {
        r["doc_id"] for r in fwgated.select("doc_id").collect()
    }
    for i in dropped:
        assert i - 1 in surviving  # the kept partner is the min id
    # every surviving class-5 doc whose partner also survived is dropped
    expected = {
        i for i in surviving if i % 10 == 5 and (i - 1) in surviving
    }
    assert set(dropped) == expected


def test_v6_runs_end_to_end_and_packs(spark):
    from magicxml_spark.queries import QUERIES

    out = QUERIES["q_curation_v6"](spark, SF).collect()
    assert len(out) > 0
    # packing tiles: per sequence the segment lengths fit 128
    by_seq: dict[int, int] = {}
    for r in out:
        assert 0 < r["seg_len"] <= 128
        by_seq[r["seq_id"]] = by_seq.get(r["seq_id"], 0) + r["seg_len"]
    full = [s for s, tot in by_seq.items() if tot == 128]
    assert len(full) >= len(by_seq) - 1  # only the tail may be short
