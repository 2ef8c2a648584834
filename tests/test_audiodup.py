"""Audio near-dup pins (pipeline/audiodup.py): the time-normalized
envelope fingerprint is sample-rate- and bit-depth-invariant (a
re-encoded copy of the same recording collides through the shared
banded pair join), a different recording does not collide, and
compressed formats keep the honest NotImplementedError boundary."""

from __future__ import annotations

import math
import struct

import pytest

from tcrd_spark.pipeline import audiodup
from tcrd_spark.pipeline.imagedup import image_near_dup_pairs

# a fixed bumpy loudness contour, one slot per envelope frame — large
# steps so the difference bits are stable under any resampling
_LEVELS = [((i * 37) % 13) / 13.0 * 0.8 + 0.15 for i in range(65)]
_LEVELS_B = [((i * 29 + 5) % 11) / 11.0 * 0.8 + 0.15 for i in range(65)]


def _wav(rate: int, levels: list[float], bits: int = 16) -> bytes:
    """1-second 440 Hz tone, amplitude stepped per 1/65 s from
    `levels` — an independent encoder (mirrors the test_multimodal
    builder, not the implementation)."""
    n = rate
    samples = []
    for t in range(n):
        amp = levels[min(64, (t * 65) // n)]
        s = amp * math.sin(2 * math.pi * 440 * t / rate)
        samples.append(s)
    if bits == 16:
        data = b"".join(
            struct.pack("<h", int(s * 32767)) for s in samples
        )
    else:
        data = bytes((int(s * 127) + 128) & 0xFF for s in samples)
    align = bits // 8
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * align, align, bits)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_reencoded_copies_collide_distinct_does_not(spark):
    media = spark.createDataFrame(
        [
            (1, bytearray(_wav(8000, _LEVELS))),
            (2, bytearray(_wav(16000, _LEVELS))),   # resampled copy
            (3, bytearray(_wav(8000, _LEVELS, bits=8))),  # re-quantized
            (4, bytearray(_wav(8000, _LEVELS_B))),  # different recording
        ],
        "doc_id long, payload binary",
    )
    fp = audiodup.audio_fingerprints(media)
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in image_near_dup_pairs(fp).collect()
    }
    assert (1, 2) in pairs, "sample-rate re-encode must collide"
    assert (1, 3) in pairs, "bit-depth re-encode must collide"
    assert not any(4 in p for p in pairs), "distinct recording collided"


def test_fingerprint_is_rate_invariant_bitwise(spark):
    """With a stepped contour the envelope frames equal the step
    levels at ANY rate — the fingerprints match exactly, not just
    within threshold."""
    a = audiodup._envelope_bands(
        audiodup._wav_samples(_wav(8000, _LEVELS))
    )
    b = audiodup._envelope_bands(
        audiodup._wav_samples(_wav(16000, _LEVELS))
    )
    assert a == b


def test_compressed_format_raises(spark):
    with pytest.raises(NotImplementedError, match="audio fingerprint"):
        audiodup._wav_samples(b"\xff\xfb\x90\x00 not a wav")
