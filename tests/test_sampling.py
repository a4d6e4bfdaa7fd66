"""TSN frame-selection tests: property tests + oracle comparison.

The oracle re-derives the reference arithmetic
(/root/reference/auxiliary/auxiliary_dataset.py:174-206 and
auxiliary_activitynet.py:34-48) directly in the test body.
"""

import numpy as np
import pytest

from zeroshotvideoclassification_tpu.data.sampling import (
    tsn_frame_indices,
    tsn_selection,
)


def _oracle_selection(total, clip_len, n_clips, starts):
    period = max(total // n_clips, 1)
    n_snip = min(n_clips, total // period)
    offsets = np.arange(0, total, period)
    return np.concatenate(
        [np.arange(of + s, of + s + clip_len) for of, s in zip(offsets, starts[:n_snip])]
    )


@pytest.mark.parametrize("total,clip_len,n_clips", [
    (300, 16, 1), (300, 16, 4), (17, 16, 1), (16, 16, 1), (5, 16, 1),
    (100, 16, 25), (40, 8, 4), (1, 16, 1), (33, 16, 2),
])
def test_validation_selection_matches_oracle(total, clip_len, n_clips):
    sel = tsn_selection(total, clip_len, n_clips, is_validation=True)
    period = max(total // n_clips, 1)
    n_snip = min(n_clips, total // period)
    oracle = _oracle_selection(total, clip_len, n_clips, np.zeros(n_snip, int))
    np.testing.assert_array_equal(sel, oracle)


def test_train_starts_within_period(rng):
    total, clip_len, n_clips = 200, 16, 4
    sel = tsn_selection(total, clip_len, n_clips, is_validation=False, rng=rng)
    period = total // n_clips
    sel = sel.reshape(n_clips, clip_len)
    for c in range(n_clips):
        start = sel[c, 0] - c * period
        assert 0 <= start < max(1, period - clip_len)
        np.testing.assert_array_equal(sel[c], np.arange(sel[c, 0], sel[c, 0] + clip_len))


def _oracle_repeat_last(total, clip_len, n_clips, sel):
    """Reference cv2-decode semantics re-derived (auxiliary_dataset.py:
    184-206): one frame per UNIQUE selected count in decoder order;
    out-of-range counts repeat the last decoded frame; loop-pad."""
    frames = []
    last = None
    for count in range(int(sel[-1]) + clip_len):
        if count not in set(sel.tolist()):
            continue
        if count < total:
            last = count
        frames.append(last)
    frames = np.asarray(frames)
    want = n_clips * clip_len
    while frames.shape[0] < want:
        frames = np.concatenate([frames, frames[: want - frames.shape[0]]])
    return frames[:want]


@pytest.mark.parametrize("total,clip_len,n_clips", [
    (300, 16, 1), (10, 16, 1), (1, 16, 1), (100, 16, 25), (47, 16, 4),
    (40, 16, 4), (123, 16, 25),
])
def test_repeat_last_matches_reference_decode(total, clip_len, n_clips):
    idx = tsn_frame_indices(total, clip_len, n_clips, is_validation=True)
    assert idx.shape == (n_clips * clip_len,)
    assert idx.min() >= 0 and idx.max() < total
    raw = tsn_selection(total, clip_len, n_clips, True)
    np.testing.assert_array_equal(
        idx, _oracle_repeat_last(total, clip_len, n_clips, raw))


def test_repeat_last_exact_semantics():
    # total=10 frames, clip_len=16 -> selection 0..15; frames >=10 repeat 9
    idx = tsn_frame_indices(10, 16, 1, is_validation=True)
    np.testing.assert_array_equal(idx, list(range(10)) + [9] * 6)


def test_repeat_last_dedups_overlapping_snippets():
    # total=40, cl=16, nc=4 (the active eval shape for short videos):
    # windows [0..15],[10..25],[20..35],[30..45] OVERLAP; the reference
    # decodes each unique count once -> frames = 0..39 then 6 repeats of 39,
    # loop-padded with the head to 64
    idx = tsn_frame_indices(40, 16, 4, is_validation=True)
    expect = np.asarray(list(range(40)) + [39] * 6 + list(range(18)))
    np.testing.assert_array_equal(idx, expect)


def test_loop_pad_semantics():
    # total=5 -> selection 0..15 -> repeat-last gives [0..4, 4*11] len 16: no
    # padding needed; but n_clips=2 over total=5: period=2, n_snip=2,
    # selection len 32 -> fill then already 32
    idx = tsn_frame_indices(5, 16, 2, is_validation=True)
    assert idx.shape == (32,)
    # drop mode with tiny video: ActivityNet semantics
    idx = tsn_frame_indices(5, 16, 1, is_validation=True, fill="drop")
    np.testing.assert_array_equal(idx[:5], np.arange(5))
    np.testing.assert_array_equal(idx[5:10], np.arange(5))  # loop-pad repeats head
    assert idx.shape == (16,)


def test_npy_frame_cap():
    # ActivityNet caps total at 300 (auxiliary_activitynet.py:34) but the
    # 'drop' filter uses the RAW frame count, so indices may reach
    # cap + clip_len - 1 when the raw video is long enough (ibid. :43)
    idx = tsn_frame_indices(1000, 16, 1, is_validation=True, fill="drop", frame_cap=300)
    assert idx.max() <= 15  # val: start 0, one clip at head
    idx = tsn_frame_indices(1000, 16, 25, is_validation=True, fill="drop", frame_cap=300)
    assert idx.max() < 300 + 16
    assert idx.max() < 1000
    # short raw video: cap inactive, out-of-range selections dropped
    idx = tsn_frame_indices(120, 16, 25, is_validation=True, fill="drop", frame_cap=300)
    assert idx.max() < 120


def test_train_rng_reproducible():
    a = tsn_frame_indices(500, 16, 4, False, rng=np.random.default_rng(3))
    b = tsn_frame_indices(500, 16, 4, False, rng=np.random.default_rng(3))
    np.testing.assert_array_equal(a, b)
