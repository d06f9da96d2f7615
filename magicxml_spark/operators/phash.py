"""Perceptual image hashing (pHash) + image near-duplicate pairs —
the image arm of the dedup family.

The classic DCT perceptual hash (public algorithm, e.g. Zauner,
"Implementation and Benchmarking of Perceptual Image Hash Functions",
2010): decode -> grayscale -> 32x32 downsample -> 2D DCT-II -> keep
the 8x8 low-frequency block -> threshold each coefficient against the
median of the 63 AC coefficients -> 64-bit signature. Visually
identical images (re-encodes, mild brightness/scale changes) land
within a few bits; unrelated images are ~32 bits apart (random).

Spark shape: hashing is one Arrow-batched ``mapInPandas`` pass over
binary image rows (decode via the pure-stdlib image_lite codecs — the
same PNG/BMP/GIF/JPEG/TIFF subset as S11); pair finding reuses the
generic pigeonhole ``hamming_near_dup_pairs`` — one shuffle on the
(slice index, slice value) key, never all-pairs, mega-buckets capped.
Together they give image near-dup the exact scale contract the text
dedup family has.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_N = 32  # downsample grid
_K = 8  # low-frequency block


def _dct_matrix(n: int) -> "np.ndarray":
    """Orthonormal DCT-II basis (same formula as jpeg_lite's 8x8 _C,
    generalized): C[k, i] = a(k) * cos((2i+1) k pi / 2n)."""
    c = np.zeros((n, n))
    for k in range(n):
        for i in range(n):
            c[k, i] = np.cos((2 * i + 1) * k * np.pi / (2 * n))
    c *= np.sqrt(2.0 / n)
    c[0, :] *= 1 / np.sqrt(2)
    return c


_C32 = _dct_matrix(_N)


def phash64_bytes(data: bytes) -> int | None:
    """64-bit perceptual hash of one encoded image; None when the
    bytes don't decode through the lite codecs (caller triages, the
    job never fails on a corrupt member)."""
    from magicxml_spark.sources.image_lite import decode_image

    dec = decode_image(bytes(data))
    if dec is None:
        return None
    _, w, h, mode, pix = dec
    if w <= 0 or h <= 0:
        return None
    arr = np.frombuffer(bytes(pix), dtype=np.uint8)
    ch = len(mode)
    if arr.size < w * h * ch:
        return None
    arr = arr[: w * h * ch].reshape(h, w, ch).astype(np.float64)
    if ch >= 3:
        gray = 0.299 * arr[:, :, 0] + 0.587 * arr[:, :, 1] + 0.114 * arr[:, :, 2]
    else:
        gray = arr[:, :, 0]
    # nearest-neighbor 32x32 downsample (deterministic; matches the
    # raster blit convention elsewhere in the repo)
    ys = (np.arange(_N) * h) // _N
    xs = (np.arange(_N) * w) // _N
    small = gray[np.ix_(ys, xs)]
    coefs = _C32 @ small @ _C32.T
    block = coefs[:_K, :_K].flatten()
    med = np.median(block[1:])  # AC median; DC would swamp it
    bits = 0
    for i, v in enumerate(block):
        if v > med:
            bits |= 1 << i
    # bigint-safe: Python ints are unbounded, Spark longs are not —
    # map to signed 64-bit two's complement
    return bits - (1 << 64) if bits >= (1 << 63) else bits


def image_phash(
    df: DataFrame, id_col: str = "path", content_col: str = "content"
) -> DataFrame:
    """(id, phash) per decodable image row; undecodable rows surface
    with a NULL phash (triage, not failure)."""
    import pandas as pd

    id_dtype = dict(df.dtypes)[id_col]

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "id": pdf[id_col],
                    "phash": [
                        phash64_bytes(c) if c is not None else None
                        for c in pdf[content_col]
                    ],
                }
            )

    return df.select(id_col, content_col).mapInPandas(
        batches, schema=f"id {id_dtype}, phash long"
    )


def image_near_dup_pairs(
    df: DataFrame,
    id_col: str = "path",
    content_col: str = "content",
    max_hamming: int = 7,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Image near-duplicate pairs (id_a < id_b, hamming <= cap) over
    binary image rows: pHash then pigeonhole-banded Hamming join.
    ``max_bucket_size=None`` here delegates to the dedup module's
    default cap (ON)."""
    from magicxml_spark.operators.dedup import (
        DEFAULT_MAX_BUCKET_SIZE,
        hamming_near_dup_pairs,
    )

    cap = DEFAULT_MAX_BUCKET_SIZE if max_bucket_size is None else max_bucket_size
    hashed = image_phash(df, id_col, content_col).filter(F.col("phash").isNotNull())
    return hamming_near_dup_pairs(
        hashed,
        "id",
        "phash",
        n_bits=64,
        max_hamming=max_hamming,
        n_slices=8,
        max_bucket_size=cap,
    )
