"""Temporal scan parity vs a literal transcription of the reference loop.

The oracle below re-states reference server/model.py:37-95 (run-length
counter, flag threshold, final weighted score) as plain Python over
precomputed embeddings; the scan must match it bit-for-bit on the integer
outputs for random timelines, including face-less gaps and padding.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from truely_tpu.ops.temporal import (
    temporal_consistency,
    weighted_score,
    resettable_run_length,
    previous_face_index,
)


def oracle_loop(embeddings, has_face, sim_threshold=0.99, run_threshold=15):
    """Literal Python re-statement of the reference per-frame loop."""
    deepfake_count = 0
    deep_fake_frame_count = 0
    prev = None
    sims = np.zeros(len(embeddings))
    counters = np.zeros(len(embeddings), dtype=int)
    flags = np.zeros(len(embeddings), dtype=bool)
    annotated = np.zeros(len(embeddings), dtype=bool)
    for t in range(len(embeddings)):
        if has_face[t]:
            cur = embeddings[t]
            if prev is not None:
                sim = float(
                    np.dot(cur, prev) / (np.linalg.norm(cur) * np.linalg.norm(prev))
                )
                sims[t] = sim
                if sim < sim_threshold:
                    deepfake_count += 1
                else:
                    deepfake_count = 0
                annotated[t] = True
                if deepfake_count > run_threshold:
                    flags[t] = True
                    deep_fake_frame_count += 1
            prev = cur
        counters[t] = deepfake_count
    return sims, counters, flags, annotated, deep_fake_frame_count, deepfake_count


def oracle_score(dffc, final_counter, total_processed, frame_count, fps,
                 run_threshold=15):
    if total_processed == 0:
        return 0
    pct = (dffc / total_processed) * 100
    conf = min(pct * (final_counter / run_threshold), 100)
    if frame_count > fps * 30:
        weighted = min(pct + conf * 0.5, 100)
    else:
        weighted = min(pct + conf * 0.3, 100)
    return max(0, min(100, int(weighted)))


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("t_len", [1, 7, 64, 257])
def test_scan_matches_oracle(seed, t_len):
    rng = np.random.default_rng(seed)
    d = 32
    # Build embeddings with long runs of high/low similarity to exercise the
    # counter around the threshold.
    base = rng.normal(size=(d,))
    embs = np.zeros((t_len, d), dtype=np.float32)
    for t in range(t_len):
        if rng.random() < 0.3:
            base = rng.normal(size=(d,))  # drift event
        embs[t] = base + rng.normal(size=(d,)) * 1e-4
    has_face = rng.random(t_len) > 0.2

    sims, counters, flags, annotated, dffc, final = oracle_loop(embs, has_face)

    res = temporal_consistency(
        jnp.asarray(embs), jnp.asarray(has_face), jnp.int32(t_len)
    )
    np.testing.assert_array_equal(np.asarray(res.counter), counters)
    np.testing.assert_array_equal(np.asarray(res.flagged), flags)
    np.testing.assert_array_equal(np.asarray(res.annotated), annotated)
    assert int(res.flagged_count) == dffc
    assert int(res.final_counter) == final
    np.testing.assert_allclose(np.asarray(res.similarity), sims, atol=1e-5)


def test_padding_is_inert():
    rng = np.random.default_rng(7)
    t_real, t_pad = 40, 64
    embs = rng.normal(size=(t_pad, 16)).astype(np.float32)
    has_face = np.ones(t_pad, dtype=bool)
    res_full = temporal_consistency(
        jnp.asarray(embs[:t_real]), jnp.asarray(has_face[:t_real]), jnp.int32(t_real)
    )
    res_pad = temporal_consistency(
        jnp.asarray(embs), jnp.asarray(has_face), jnp.int32(t_real)
    )
    assert int(res_full.flagged_count) == int(res_pad.flagged_count)
    assert int(res_full.final_counter) == int(res_pad.final_counter)
    np.testing.assert_array_equal(
        np.asarray(res_full.flagged), np.asarray(res_pad.flagged[:t_real])
    )


@pytest.mark.parametrize("dffc,final,total,frames,fps", [
    (0, 0, 10, 100, 30),
    (5, 3, 10, 100, 30),
    (5, 20, 10, 3000, 30),
    (10, 16, 10, 899, 30),   # boundary: frame_count == fps*30 - 1
    (10, 16, 10, 900, 30),   # boundary: frame_count == fps*30 (NOT long)
    (10, 16, 10, 901, 30),   # boundary: long video
    (7, 15, 33, 964, 30),    # bundled-clip-like shape
])
def test_score_matches_oracle(dffc, final, total, frames, fps):
    expect = oracle_score(dffc, final, total, frames, fps)
    got = int(
        weighted_score(
            jnp.int32(dffc), jnp.int32(final), jnp.int32(total),
            jnp.int32(frames), jnp.int32(fps),
        )
    )
    assert got == expect


@pytest.mark.parametrize("chunk", [1, 5, 16, 37])
def test_chunked_equals_whole_timeline(chunk):
    """Folding batches through TemporalState == one whole-timeline pass."""
    rng = np.random.default_rng(11)
    t_len, d = 97, 24
    base = rng.normal(size=(d,))
    embs = np.zeros((t_len, d), dtype=np.float32)
    for t in range(t_len):
        if rng.random() < 0.25:
            base = rng.normal(size=(d,))
        embs[t] = base + rng.normal(size=(d,)) * 1e-4
    has_face = rng.random(t_len) > 0.25

    whole = temporal_consistency(
        jnp.asarray(embs), jnp.asarray(has_face), jnp.int32(t_len)
    )

    state = None
    flags, counters, total_flagged = [], [], 0
    for s in range(0, t_len, chunk):
        e = min(s + chunk, t_len)
        res = temporal_consistency(
            jnp.asarray(embs[s:e]), jnp.asarray(has_face[s:e]), jnp.int32(e - s),
            state=state,
        )
        state = res.state
        flags.append(np.asarray(res.flagged))
        counters.append(np.asarray(res.counter))
        total_flagged += int(res.flagged_count)

    np.testing.assert_array_equal(np.concatenate(flags), np.asarray(whole.flagged))
    np.testing.assert_array_equal(np.concatenate(counters), np.asarray(whole.counter))
    assert total_flagged == int(whole.flagged_count)
    assert int(state.counter) == int(whole.final_counter)


def test_run_length_counter_basic():
    update = jnp.asarray([1, 1, 1, 0, 1, 1, 1, 1], dtype=bool)
    below = jnp.asarray([1, 1, 0, 1, 1, 1, 0, 1], dtype=bool)
    out = np.asarray(resettable_run_length(update, below))
    #           t=0 t=1 t=2(reset) t=3(hold) t=4 t=5 t=6(reset) t=7
    np.testing.assert_array_equal(out, [1, 2, 0, 0, 1, 2, 0, 1])


def test_previous_face_index():
    hf = jnp.asarray([0, 1, 0, 0, 1, 1, 0], dtype=bool)
    out = np.asarray(previous_face_index(hf))
    np.testing.assert_array_equal(out, [-1, -1, 1, 1, 1, 4, 5])
