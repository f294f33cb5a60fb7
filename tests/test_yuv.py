"""Bit-exactness of native-YUV ingestion (VERDICT r2 task 2).

The product claim: uploading yuv420p (half the H2D bytes) and converting
on-device produces byte-identical frames — hence identical decisions — to
the reference's cv2-BGR decode path (reference hot loop
server/model.py:42-45).  Ground truth comes from cv2 itself via
uncompressed I420 AVIs (tests/rawavi.py): the planes we write are exactly
what any decoder hands back, so cv2's BGR output is the oracle for the
conversion and the mp4v/H.264 paths are covered by the fixture test.
"""

import numpy as np
import pytest
import cv2
import jax.numpy as jnp

from tests.clip import bundled_clip_path
from tests.rawavi import write_i420_avi
from truely_tpu.ops.yuv import i420_to_bgr

try:
    from truely_tpu.media import videodec

    HAVE_VIDEODEC = True
except ImportError:
    HAVE_VIDEODEC = False

needs_videodec = pytest.mark.skipif(
    not HAVE_VIDEODEC, reason="native videodec extension not built"
)


def random_i420(rng, w, h, n):
    return [rng.integers(0, 256, w * h * 3 // 2, dtype=np.uint8)
            for _ in range(n)]


def packed_view(flat, w, h):
    return np.asarray(flat).reshape(h * 3 // 2, w)


# ---------------------------------------------------------------------------
# conversion exactness


def test_i420_to_bgr_matches_cv2_exhaustively_random(tmp_path):
    """Random planes through cv2's own decode+convert vs ops/yuv.py."""
    rng = np.random.default_rng(7)
    w, h = 64, 48
    frames = random_i420(rng, w, h, 6)
    path = str(tmp_path / "rand.avi")
    write_i420_avi(path, frames, w, h)
    cap = cv2.VideoCapture(path)
    assert cap.isOpened()
    for k, flat in enumerate(frames):
        ok, bgr = cap.read()
        assert ok, k
        ours = np.asarray(i420_to_bgr(packed_view(flat, w, h)[None]))[0]
        np.testing.assert_array_equal(ours, bgr, err_msg=f"frame {k}")
    cap.release()


def test_i420_to_bgr_extreme_values():
    """All-0 / all-255 planes exercise both clip rails; compare against
    the learned closed form evaluated in numpy (independent restatement)."""
    w, h = 8, 8
    for y0, u0, v0 in [(0, 0, 0), (255, 255, 255), (0, 255, 0), (255, 0, 255),
                       (16, 128, 128), (235, 128, 128)]:
        flat = np.concatenate([
            np.full(w * h, y0, np.uint8),
            np.full(w * h // 4, u0, np.uint8),
            np.full(w * h // 4, v0, np.uint8),
        ])
        ours = np.asarray(i420_to_bgr(packed_view(flat, w, h)[None]))[0]
        q = (76305 * y0 - 1219995) >> 16
        b = np.clip(q + ((132193 * u0 - 16920704) >> 16), 0, 255)
        g = np.clip(q + ((-25673 * u0 + 3286144) >> 16)
                    + ((-53281 * v0 + 6819968) >> 16), 0, 255)
        r = np.clip(q + ((104593 * v0 - 13387904) >> 16), 0, 255)
        assert (ours == np.asarray([b, g, r], np.uint8)).all(), (y0, u0, v0)


def test_pallas_kernel_matches_xla_exactly():
    """The fused Pallas kernel (interpret mode on CPU; the same kernel the
    TPU compiles) is bit-identical to the XLA formulation, including
    masked edge blocks (H not a multiple of the 64-row strip) and both
    channel orders."""
    from truely_tpu.ops.yuv import i420_to_bgr_pallas, pallas_eligible

    rng = np.random.default_rng(17)
    for w, h in [(128, 36), (256, 80), (128, 64)]:
        packed = rng.integers(0, 256, (2, h * 3 // 2, w), dtype=np.uint8)
        assert pallas_eligible(packed.shape)
        for rgb in (False, True):
            ref = np.asarray(i420_to_bgr(packed, rgb=rgb))
            got = np.asarray(
                i420_to_bgr_pallas(jnp.asarray(packed), rgb=rgb,
                                   interpret=True)
            )
            np.testing.assert_array_equal(got, ref, err_msg=f"{w}x{h} {rgb}")


def test_pallas_eligibility_gate():
    from truely_tpu.ops.yuv import i420_convert, pallas_eligible

    assert pallas_eligible((4, 1620, 1920))   # 1080p
    assert pallas_eligible((4, 540, 640))     # 360p
    assert not pallas_eligible((4, 54, 96))   # width not lane-aligned
    assert not pallas_eligible((4, 55, 128))  # not an I420 height
    # dispatch on CPU always takes the XLA path — identical results
    rng = np.random.default_rng(23)
    packed = rng.integers(0, 256, (2, 24, 128), dtype=np.uint8)
    np.testing.assert_array_equal(
        np.asarray(i420_convert(packed, use_pallas=True)),
        np.asarray(i420_to_bgr(packed)),
    )


def test_rgb_mode_is_channel_reversal():
    rng = np.random.default_rng(3)
    flat = rng.integers(0, 256, 32 * 16 * 3 // 2, dtype=np.uint8)
    p = packed_view(flat, 32, 16)[None]
    np.testing.assert_array_equal(
        np.asarray(i420_to_bgr(p, rgb=True)),
        np.asarray(i420_to_bgr(p))[..., ::-1],
    )


@needs_videodec
def test_fixture_h264_decode_exact():
    """The real H.264 fixture through videodec+ops/yuv == cv2 BGR decode,
    frame-locked (also proves videodec and cv2 agree on frame order)."""
    path = bundled_clip_path()
    hnd, w, h, _fn, _fd, _nb = videodec.open(path)
    assert videodec.pixfmt(hnd) == "yuv420p"
    cap = cv2.VideoCapture(path)
    buf = np.empty(w * h * 3 // 2, np.uint8)
    for k in range(12):
        assert videodec.read(hnd, buf)
        ok, bgr = cap.read()
        assert ok
        ours = np.asarray(i420_to_bgr(packed_view(buf, w, h)[None]))[0]
        np.testing.assert_array_equal(ours, bgr, err_msg=f"frame {k}")
    videodec.close(hnd)
    cap.release()


@needs_videodec
def test_videodec_raw_roundtrip(tmp_path):
    """videodec returns the exact planes we wrote (decoder sanity)."""
    rng = np.random.default_rng(11)
    w, h = 32, 16
    frames = random_i420(rng, w, h, 4)
    path = str(tmp_path / "rt.avi")
    write_i420_avi(path, frames, w, h)
    hnd, ww, hh, _fn, _fd, _nb = videodec.open(path)
    assert (ww, hh) == (w, h)
    buf = np.empty(w * h * 3 // 2, np.uint8)
    n = 0
    while videodec.read(hnd, buf):
        np.testing.assert_array_equal(buf, frames[n])
        n += 1
    assert n == len(frames)
    videodec.close(hnd)


# ---------------------------------------------------------------------------
# reader + detector integration


@needs_videodec
def test_reader_yuv_segments_match_bgr(tmp_path):
    from truely_tpu.media.decode import VideoReader

    rng = np.random.default_rng(5)
    w, h = 64, 48
    frames = random_i420(rng, w, h, 11)
    path = str(tmp_path / "seg.avi")
    write_i420_avi(path, frames, w, h)

    with VideoReader(path, yuv=True) as r_yuv:
        assert r_yuv.yuv_active
        yuv_segs = list(r_yuv.segments(sample_interval=2, batch=4))
    with VideoReader(path) as r_bgr:
        bgr_segs = list(r_bgr.segments(sample_interval=2, batch=4))

    assert len(yuv_segs) == len(bgr_segs)
    for sy, sb in zip(yuv_segs, bgr_segs):
        assert sy.frame_indices == sb.frame_indices
        assert sy.sampled_indices == sb.sampled_indices
        assert sy.n_valid == sb.n_valid
        assert sy.n_frames == len(sb.frames)
        assert sy.frames == []
        assert sy.sampled.shape == (4, h * 3 // 2, w)
        conv = np.asarray(i420_to_bgr(jnp.asarray(sy.sampled)))
        np.testing.assert_array_equal(
            conv[: sy.n_valid], sb.sampled[: sb.n_valid]
        )


@needs_videodec
def test_reader_yuv_falls_back_without_eligibility(tmp_path, monkeypatch):
    from truely_tpu.media import decode as decode_mod

    rng = np.random.default_rng(5)
    w, h = 32, 16
    path = str(tmp_path / "fb.avi")
    write_i420_avi(path, random_i420(rng, w, h, 3), w, h)
    monkeypatch.setattr(decode_mod, "_probe_yuv", lambda p, m: None)
    with decode_mod.VideoReader(path, yuv=True) as r:
        assert not r.yuv_active
        segs = list(r.segments(sample_interval=1, batch=4))
    assert segs and segs[0].frames  # BGR path served the segments


@needs_videodec
def test_analyze_video_yuv_equivalence(tmp_path):
    """Decisions are identical with YUV ingestion on vs off (exact f32
    operator chain, seeded weights) — the whole point of the exact
    conversion."""
    from truely_tpu.config import DetectorConfig, MTCNNConfig
    from truely_tpu.pipeline.detector import Detector

    rng = np.random.default_rng(9)
    w, h = 96, 64
    # smooth-ish content so the cascade finds boxes with random weights
    frames = []
    for k in range(10):
        y = rng.integers(40, 216, w * h, dtype=np.uint8)
        u = rng.integers(100, 156, w * h // 4, dtype=np.uint8)
        v = rng.integers(100, 156, w * h // 4, dtype=np.uint8)
        frames.append(np.concatenate([y, u, v]))
    path = str(tmp_path / "eq.avi")
    write_i420_avi(path, frames, w, h, fps=10)

    cfg = dict(
        frame_batch=4,
        mtcnn=MTCNNConfig(
            pnet_topk_total=64, rnet_capacity=16, onet_capacity=8,
            thresholds=(0.5, 0.3, 0.2),
        ),
        compute_dtype="float32",
    )
    det_yuv = Detector(DetectorConfig(yuv_ingest=True, **cfg))
    res_yuv = det_yuv.analyze_video(path)
    det_bgr = Detector(DetectorConfig(yuv_ingest=False, **cfg))
    res_bgr = det_bgr.analyze_video(path)

    assert res_yuv.yuv_ingest and not res_bgr.yuv_ingest
    assert res_yuv.fake_score == res_bgr.fake_score
    assert res_yuv.frame_count == res_bgr.frame_count == 10
    assert res_yuv.total_processed == res_bgr.total_processed
    assert res_yuv.flagged_count == res_bgr.flagged_count
    assert len(res_yuv.records) == len(res_bgr.records)
    for ry, rb in zip(res_yuv.records, res_bgr.records):
        assert ry.frame_index == rb.frame_index
        assert ry.has_face == rb.has_face
        assert ry.box == rb.box
        assert ry.flagged == rb.flagged
        assert ry.similarity == rb.similarity
        assert ry.counter == rb.counter


@needs_videodec
def test_host_frames_conversion_matches_cv2(tmp_path):
    """framepack.i420_to_bgr (and its numpy fallback) == cv2's BGR decode
    on random planes — the annotated-output path's host frames."""
    from truely_tpu.media import native

    rng = np.random.default_rng(21)
    w, h = 64, 48
    frames = random_i420(rng, w, h, 4)
    path = str(tmp_path / "host.avi")
    write_i420_avi(path, frames, w, h)
    cap = cv2.VideoCapture(path)
    for flat in frames:
        ok, bgr = cap.read()
        assert ok
        packed = packed_view(flat, w, h)
        np.testing.assert_array_equal(native.i420_to_bgr_host(packed), bgr)
        # numpy fallback computes the identical function
        ext = native._ext
        native._ext = None
        try:
            np.testing.assert_array_equal(
                native.i420_to_bgr_host(packed), bgr
            )
        finally:
            native._ext = ext
    cap.release()


@needs_videodec
def test_analyze_video_with_output_yuv_equivalence(tmp_path):
    """With an annotated output, YUV ingestion must produce identical
    DECISIONS to the cv2-BGR path.  The encoded pixels are no longer
    byte-identical by design: frames that aren't drawn on re-encode
    straight from the decoded I420 planes (write_i420), skipping the
    yuv→BGR→yuv round trip — so the YUV path's output must be at least
    as close to the source pixels as the BGR path's, frame by frame."""
    from truely_tpu.config import DetectorConfig, MTCNNConfig
    from truely_tpu.pipeline.detector import Detector

    rng = np.random.default_rng(31)
    w, h = 96, 64
    frames = []
    for _ in range(6):
        y = rng.integers(40, 216, w * h, dtype=np.uint8)
        u = rng.integers(100, 156, w * h // 4, dtype=np.uint8)
        v = rng.integers(100, 156, w * h // 4, dtype=np.uint8)
        frames.append(np.concatenate([y, u, v]))
    path = str(tmp_path / "wo.avi")
    write_i420_avi(path, frames, w, h, fps=10)

    cfg = dict(
        frame_batch=4,
        mtcnn=MTCNNConfig(
            pnet_topk_total=64, rnet_capacity=16, onet_capacity=8,
            thresholds=(0.5, 0.3, 0.2),
        ),
        compute_dtype="float32",
    )
    out_yuv = str(tmp_path / "out_yuv.mp4")
    out_bgr = str(tmp_path / "out_bgr.mp4")
    res_yuv = Detector(DetectorConfig(yuv_ingest=True, **cfg)).analyze_video(
        path, out_yuv
    )
    res_bgr = Detector(DetectorConfig(yuv_ingest=False, **cfg)).analyze_video(
        path, out_bgr
    )
    assert res_yuv.yuv_ingest and not res_bgr.yuv_ingest
    assert res_yuv.fake_score == res_bgr.fake_score
    assert [
        (r.frame_index, r.has_face, r.box, r.flagged, r.similarity)
        for r in res_yuv.records
    ] == [
        (r.frame_index, r.has_face, r.box, r.flagged, r.similarity)
        for r in res_bgr.records
    ]
    # same frame count; near-identical pictures (both encode the same
    # source, differing only in conversion rounding pre-encode); and the
    # direct-I420 path is at least as faithful to the source as the BGR
    # round trip (measured: ~6.5 vs ~6.8 mean abs error on this content).
    from truely_tpu.media.native import i420_to_bgr_host

    ca, cb = cv2.VideoCapture(out_yuv), cv2.VideoCapture(out_bgr)
    n = 0
    while True:
        oka, fa = ca.read()
        okb, fb = cb.read()
        assert oka == okb
        if not oka:
            break
        src = i420_to_bgr_host(frames[n].reshape(h * 3 // 2, w))
        diff = np.abs(fa.astype(int) - fb.astype(int)).mean()
        err_yuv = np.abs(fa.astype(int) - src.astype(int)).mean()
        err_bgr = np.abs(fb.astype(int) - src.astype(int)).mean()
        assert diff < 8.0, f"frame {n}: paths diverged (mean |d|={diff:.2f})"
        assert err_yuv <= err_bgr + 0.5, (
            f"frame {n}: I420-direct output less faithful than the BGR "
            f"round trip ({err_yuv:.2f} vs {err_bgr:.2f})"
        )
        n += 1
    assert n == 6
    ca.release()
    cb.release()


@needs_videodec
def test_annotated_drawn_path_yuv(tmp_path):
    """The drawn path under YUV ingestion: frames the detector annotates
    are converted i420→BGR (exact), drawn on, and written through the BGR
    encoder path; everything else goes through write_i420.  Forcing every
    sampled frame to be annotated+flagged (by wrapping the temporal jit)
    exercises the conversion+draw+write integration with real boxes, and
    the red overlay must be present in the decoded output."""
    from truely_tpu.config import DetectorConfig, MTCNNConfig
    from truely_tpu.pipeline.detector import Detector

    rng = np.random.default_rng(5)
    w, h = 96, 64
    frames = []
    for _ in range(6):
        y = rng.integers(40, 216, w * h, dtype=np.uint8)
        u = rng.integers(100, 156, w * h // 4, dtype=np.uint8)
        v = rng.integers(100, 156, w * h // 4, dtype=np.uint8)
        frames.append(np.concatenate([y, u, v]))
    path = str(tmp_path / "drawn.avi")
    write_i420_avi(path, frames, w, h, fps=10)

    det = Detector(
        DetectorConfig(
            frame_batch=4,
            yuv_ingest=True,
            compute_dtype="float32",
            mtcnn=MTCNNConfig(
                pnet_topk_total=64, rnet_capacity=16, onet_capacity=8,
                thresholds=(0.5, 0.3, 0.2),
            ),
        )
    )
    real_temporal = det._temporal

    def force_annotated(emb, has_face, n_valid, state):
        res = real_temporal(emb, has_face, n_valid, state)
        ones = jnp.ones_like(res.annotated)
        return res._replace(annotated=ones, flagged=ones)

    det._temporal = force_annotated
    out = str(tmp_path / "drawn_out.mp4")
    res = det.analyze_video(path, out)
    assert res.yuv_ingest
    assert all(r.annotated and r.flagged for r in res.records)

    cap = cv2.VideoCapture(out)
    n = 0
    saw_red = 0
    while True:
        ok, f = cap.read()
        if not ok:
            break
        # flagged ⇒ a red rectangle (BGR (0,0,255)) somewhere in the frame
        red = (f[..., 2].astype(int) - f[..., :2].astype(int).max(-1)) > 120
        saw_red += bool(red.any())
        n += 1
    cap.release()
    assert n == 6
    assert saw_red == 6
