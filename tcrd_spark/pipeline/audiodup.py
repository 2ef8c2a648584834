"""Audio near-dup fingerprinting — time-normalized envelope dHash
over PCM WAV payloads.

Completes the multimodal dedup story (text: `pipeline/dedup.py`;
image: `pipeline/imagedup.py`): a re-encoded copy of the same
recording (different sample rate, different bit depth) has different
BYTES but the same loudness CONTOUR, so the fingerprint is computed
from the time-normalized amplitude envelope — 65 mean-|amplitude|
frames spanning the clip, 64 difference bits (frame f+1 louder than
frame f), kept as four 16-bit bands. Candidate pairs and verification
REUSE `imagedup.image_near_dup_pairs` — the banding machinery is
modality-agnostic over any (id, b0..b3) fingerprint table.

Time normalization is what buys the invariance: frames index the
clip's DURATION, not its samples, so 8 kHz and 16 kHz encodings of
one recording produce the same envelope (pytest-pinned, including an
8-bit re-quantization); a different recording lands far away.

Decode is the same stdlib RIFF/WAVE PCM parse as
`multimodal._decode_wav` (compressed formats raise — the honest stub
boundary); runs in Arrow-batched mapInPandas, payloads never shuffle,
only the four band ints do.

No registered query: a synthetic-WAV corpus has no DuckDB-expressible
twin (the envelope needs PCM decode), and the shared band-join
discipline is already oracle-adjudicated through `image_near_dups` —
this module's contract is pinned by tests/test_audiodup.py instead
(declared, the streaming-runtime rule).

Reference parity: none (multimodal extension).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from tcrd_spark.pipeline.imagedup import BANDS, FP_SCHEMA

_FRAMES = 65  # 64 difference bits -> 4 x 16-bit bands


def _wav_samples(payload: bytes) -> list[float]:
    """RIFF/WAVE PCM → mono float samples in [-1, 1] (channels
    averaged). The parse is the shared `multimodal.wav_pcm` (one
    chunk walk and format gate for both audio consumers); compressed
    formats raise."""
    from tcrd_spark.pipeline.multimodal import wav_pcm

    fmt, raw, scale = wav_pcm(payload, what="audio fingerprint")
    channels = fmt[1]
    ch = max(1, channels)
    return [
        sum(raw[j:j + ch]) / ch / scale
        for j in range(0, len(raw) - ch + 1, ch)
    ]


def _envelope_bands(samples: list[float]) -> list[int]:
    """65 time-normalized mean-|amplitude| frames → 64 difference
    bits → 4 band ints (the imagedup bit layout)."""
    n = len(samples)
    env = []
    for f in range(_FRAMES):
        lo = (f * n) // _FRAMES
        hi = max(lo + 1, ((f + 1) * n) // _FRAMES)
        seg = samples[lo:hi] or [0.0]
        env.append(sum(abs(s) for s in seg) / len(seg))
    bands = []
    for j in range(BANDS):
        v = 0
        for k in range(16):
            b = j * 16 + k
            if env[b + 1] > env[b]:
                v |= 1 << k
        bands.append(v)
    return bands


def audio_fingerprints(
    media: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """mapInPandas envelope dHash over WAV payloads → (id, b0..b3),
    the same fingerprint schema `imagedup.image_near_dup_pairs`
    consumes for banded pair generation."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                _envelope_bands(_wav_samples(bytes(p)))
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    **{f"b{j}": [r[j] for r in rows] for j in range(BANDS)},
                }
            )

    return media.mapInPandas(run, FP_SCHEMA)
