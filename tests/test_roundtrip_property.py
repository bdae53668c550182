"""Property tests: encode(text) -> decode -> OCR == text (SURVEY.md §5.2)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from pgstosrt_spark.fixtures import encoder as enc
from pgstosrt_spark.pgs.decode import decode_media_payload
from pgstosrt_spark.pgs.rle import decode_rle_runs

# chars the atlas covers; single spaces only (encoder renders runs of
# spaces as one wide gap; fixtures normalize)
_CHARS = "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789.,:;!?'-()/>"


def _norm(s: str) -> str:
    return " ".join(s.split())


line_strategy = st.text(alphabet=_CHARS + " ", min_size=1, max_size=40).map(_norm).filter(bool)


@given(lines=st.lists(line_strategy, min_size=1, max_size=3))
@settings(max_examples=40, deadline=None)
def test_text_roundtrip(lines):
    text = "\n".join(lines)
    start, end = 90_000, 450_000
    payload = enc.build_sup_from_cues([(text, start, end)])
    got = decode_media_payload(payload)
    assert len(got) == 1
    assert got[0][1] == f"00:00:01,000 --> 00:00:05,000\n{text}"


@given(
    data=st.data(),
    h=st.integers(min_value=1, max_value=24),
    w=st.integers(min_value=1, max_value=300),
    force_long=st.booleans(),
)
@settings(max_examples=60, deadline=None)
def test_rle_roundtrip_random_bitmaps(data, h, w, force_long):
    rng = np.random.default_rng(data.draw(st.integers(min_value=0, max_value=2**31)))
    img = rng.integers(0, 3, size=(h, w)).astype(np.uint8)  # colours 0..2
    rle = enc.rle_encode(img, force_long=force_long)
    back = decode_rle_runs(rle, w, h)
    assert np.array_equal(np.where(back < 0, 0, back).reshape(h, w).astype(np.uint8), img)


@given(n_cues=st.integers(min_value=1, max_value=6), seed=st.integers(min_value=0, max_value=10**6))
@settings(max_examples=25, deadline=None)
def test_multi_cue_sequence_order(n_cues, seed):
    rng = np.random.default_rng(seed)
    cues = []
    t = 90_000
    for i in range(n_cues):
        dur = int(rng.integers(1, 50)) * 900
        gap = int(rng.integers(1, 50)) * 900
        cues.append((f"CUE {i} S{seed % 97}", t, t + dur))
        t += dur + gap
    payload = enc.build_sup_from_cues(cues)
    got = decode_media_payload(payload)
    assert [t.split("\n", 1)[1] for _, t in got] == [c[0] for c in cues]
    assert [s for s, _ in got] == list(range(1, n_cues + 1))
