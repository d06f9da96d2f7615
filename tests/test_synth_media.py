"""Synthetic media generators + planted-twin invariant harness: byte
determinism, seed distinctness, planting rule, and the stats gate's
exact (planted, original) matching."""

from __future__ import annotations

import numpy as np

from magicxml_spark.sources.synth_media import (
    planted_invariant_stats,
    synth_avi,
    synth_gray,
    synth_media_df,
    synth_png,
    synth_wav,
)


def test_synth_determinism_and_distinctness():
    # pure functions: same seed -> same bytes, different seeds -> different
    for gen in (synth_png, synth_wav, synth_avi):
        assert gen(7) == gen(7)
        assert gen(7) != gen(8)
    # seed digits drive visibly different content, not just a header bit
    assert np.abs(
        synth_gray(3).astype(int) - synth_gray(3 + 53).astype(int)
    ).mean() > 1.0


def test_synth_decodes_through_production_codecs():
    from magicxml_spark.operators.audio_features import _wav_to_mono_float
    from magicxml_spark.sources.image_lite import decode_image
    from magicxml_spark.sources.riff_media import iter_mjpeg_frames

    fmt, w, h, mode, _ = decode_image(synth_png(11))
    assert (fmt, w, h) == ("PNG", 64, 48)
    arr, rate = _wav_to_mono_float(synth_wav(11))
    assert rate == 8000 and len(arr) == 4000
    frames = list(iter_mjpeg_frames(synth_avi(11)))
    assert len(frames) == 4


def test_synth_media_df_planting_rule(spark):
    ids = spark.createDataFrame([(0,), (3,), (10,), (15,)], "doc_id long")
    rows = synth_media_df(ids, "wav", plant_mod=5).collect()
    got = {r["id"]: bytes(r["content"]) for r in rows}
    # originals 0,3,10,15 plus planted copies of 0, 10, 15 (div by 5)
    assert set(got) == {0, 3, 10, 15, -1, -11, -16}
    assert got[-1] == got[0] and got[-11] == got[10] and got[-16] == got[15]
    assert got[0] != got[3]


def test_planted_invariant_stats_exact_matching(spark):
    ids = spark.createDataFrame([(0,), (2,), (4,), (5,)], "doc_id long")
    # planted (mod 2): -1<->0, -3<->2, -5<->4. Pairs: the -1/0 and -5/4
    # matches present; (-3, 4) is a WRONG-partner pair and must not
    # credit planted -3; (0, 2) is an original-original pair (ignored).
    pairs = spark.createDataFrame(
        [(-1, 0), (-5, 4), (-3, 4), (0, 2)], "id_a long, id_b long"
    )
    row = planted_invariant_stats(ids, 2, pairs).collect()[0]
    assert (row["n_input"], row["n_planted"], row["planted_missed"]) == (7, 3, 1)
