"""Native framepack extension vs numpy fallback equivalence."""

import numpy as np
import pytest

from truely_tpu.media import native


def _numpy_impls():
    """Access the pure-numpy fallbacks regardless of whether the native
    extension is importable, by calling through with _ext disabled."""
    class Fallback:
        def __init__(self):
            self._saved = native._ext

        def __enter__(self):
            native._ext = None
            return native

        def __exit__(self, *exc):
            native._ext = self._saved

    return Fallback()


def test_pack_frames_matches_fallback():
    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 256, (6, 7, 3), dtype=np.uint8) for _ in range(3)]
    offsets = [2, 0, 3]
    a = np.zeros((4, 6, 7, 3), np.uint8)
    b = np.zeros((4, 6, 7, 3), np.uint8)
    native.pack_frames(a, frames, offsets)
    with _numpy_impls() as fallback:
        fallback.pack_frames(b, frames, offsets)
    np.testing.assert_array_equal(a, b)
    assert (a[1] == 0).all()


@pytest.mark.parametrize("box", [
    (2, 2, 8, 7),         # interior
    (-3, -3, 5, 5),       # clipped top-left
    (8, 8, 30, 30),       # clipped bottom-right
])
def test_draw_rect_matches_fallback(box):
    rng = np.random.default_rng(1)
    base = rng.integers(0, 256, (12, 14, 3), dtype=np.uint8)
    a, b = base.copy(), base.copy()
    native.draw_rect(a, *box, color_bgr=(10, 200, 30), thickness=2)
    with _numpy_impls() as fallback:
        fallback.draw_rect(b, *box, color_bgr=(10, 200, 30), thickness=2)
    np.testing.assert_array_equal(a, b)


def test_bgr_to_rgb_matches_fallback():
    rng = np.random.default_rng(2)
    base = rng.integers(0, 256, (5, 6, 3), dtype=np.uint8)
    a, b = base.copy(), base.copy()
    native.bgr_to_rgb(a)
    with _numpy_impls() as fallback:
        fallback.bgr_to_rgb(b)
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(a, base[..., ::-1])


@pytest.mark.skipif(not native.HAVE_NATIVE, reason="extension not built")
def test_native_extension_is_loaded():
    assert native.HAVE_NATIVE


def test_pack_frames_bad_offset_raises():
    if not native.HAVE_NATIVE:
        pytest.skip("native-only validation")
    frames = [np.zeros((2, 2, 3), np.uint8)]
    dst = np.zeros((1, 2, 2, 3), np.uint8)
    with pytest.raises(ValueError):
        native.pack_frames(dst, frames, [5])


def test_videoenc_h264_roundtrip(tmp_path):
    """First-party H.264 writer: frames in -> decodable H.264 MP4 out with
    the same count/dims (skips where the extension isn't built)."""
    videoenc = pytest.importorskip("truely_tpu.media.videoenc")
    import cv2

    from truely_tpu.media.encode import VideoWriter

    path = str(tmp_path / "enc.mp4")
    rng = np.random.default_rng(3)
    w, h = 96, 64
    with VideoWriter(path, 10, w, h) as writer:
        assert writer.codec == "h264"
        for _ in range(7):
            writer.write(
                cv2.blur(rng.integers(0, 256, (h, w, 3), np.uint8), (7, 7))
            )
    cap = cv2.VideoCapture(path)
    assert cap.isOpened()
    n = 0
    while True:
        ok, f = cap.read()
        if not ok:
            break
        assert f.shape == (h, w, 3)
        n += 1
    cap.release()
    assert n == 7
    # it really is H.264: the native decoder reports the stream codec
    from truely_tpu.media import videodec

    hnd, ww, hh, fn, fd, nb = videodec.open(path)
    assert (ww, hh) == (w, h)
    assert videodec.pixfmt(hnd) == "yuv420p"
    videodec.close(hnd)


def test_videoenc_write_i420_mixed(tmp_path):
    """write_i420 feeds decoded I420 planes straight to the encoder (the
    annotated path uses it for every frame that isn't drawn on, mixed with
    BGR writes for the drawn ones): the output must decode with the right
    count and stay close to the source pixels — CLOSER than a BGR round
    trip would, since no colorspace conversion happens at all."""
    pytest.importorskip("truely_tpu.media.videoenc")
    import cv2

    from truely_tpu.media.encode import VideoWriter

    rng = np.random.default_rng(7)
    w, h = 96, 64
    # smooth planes so crf-23 coding loss stays small
    def smooth(shape):
        a = rng.integers(0, 256, shape, np.uint8)
        return cv2.blur(a, (15, 15))

    pics = []
    for _ in range(6):
        y = smooth((h, w))
        u = smooth((h // 2, w // 2))
        v = smooth((h // 2, w // 2))
        packed = np.concatenate(
            [y.reshape(-1), u.reshape(-1), v.reshape(-1)]
        ).reshape(h * 3 // 2, w)
        pics.append(packed)

    path = str(tmp_path / "mixed.mp4")
    with VideoWriter(path, 10, w, h) as writer:
        assert writer.codec == "h264"
        for i, packed in enumerate(pics):
            if i == 3:  # one frame through the BGR path, like a drawn frame
                writer.write(native.i420_to_bgr_host(packed))
            else:
                writer.write_i420(packed)

    cap = cv2.VideoCapture(path)
    n = 0
    while True:
        ok, f = cap.read()
        if not ok:
            break
        src = native.i420_to_bgr_host(pics[n])
        err = np.abs(f.astype(int) - src.astype(int)).mean()
        assert err < 4.0, f"frame {n}: mean abs err {err:.2f}"
        n += 1
    cap.release()
    assert n == 6


def test_videoenc_write_i420_rejects_short_buffer(tmp_path):
    videoenc = pytest.importorskip("truely_tpu.media.videoenc")
    hnd = videoenc.open(str(tmp_path / "s.mp4"), 96, 64, 10, 1)
    with pytest.raises(ValueError):
        videoenc.write_i420(hnd, np.zeros((64, 96), np.uint8))
    videoenc.close(hnd)


def test_videoenc_rejects_bad_dims(tmp_path):
    videoenc = pytest.importorskip("truely_tpu.media.videoenc")
    with pytest.raises(ValueError):
        videoenc.open(str(tmp_path / "odd.mp4"), 97, 64, 10, 1)


def test_videodec_skip_matches_read(tmp_path):
    """videodec.skip advances the decode exactly one frame (sample-only
    decode, the score path's default): sampling every 4th frame via skip
    yields byte-identical pictures to reading every frame and keeping
    every 4th."""
    videodec = pytest.importorskip("truely_tpu.media.videodec")
    from tests.clip import bundled_clip_path

    clip = bundled_clip_path()
    hnd, w, h, *_ = videodec.open(clip)
    rows = h * 3 // 2
    all_frames = []
    buf = np.empty((rows, w), np.uint8)
    for _ in range(33):
        assert videodec.read(hnd, buf)
        all_frames.append(buf.copy())
    videodec.close(hnd)

    hnd2, *_ = videodec.open(clip)
    got = []
    for idx in range(33):
        if idx % 4 == 0:
            b = np.empty((rows, w), np.uint8)
            assert videodec.read(hnd2, b)
            got.append((idx, b))
        else:
            assert videodec.skip(hnd2)
    videodec.close(hnd2)
    for idx, b in got:
        assert np.array_equal(b, all_frames[idx]), f"frame {idx} differs"


def test_videodec_skip_nonref_mode_opens(tmp_path):
    """The AVDISCARD_NONREF probe mode opens and decodes; on an
    all-reference encode (the bundled fixture) it delivers every frame."""
    videodec = pytest.importorskip("truely_tpu.media.videodec")
    from tests.clip import bundled_clip_path

    hnd, *_ = videodec.open(bundled_clip_path(), 1)
    n = 0
    while videodec.skip(hnd):
        n += 1
    videodec.close(hnd)
    assert n == 960


def test_videoenc_preset_knobs(tmp_path):
    """The ladder knobs (preset/crf/threads/slices) produce a playable
    H.264 file; higher crf compresses smaller on identical input."""
    pytest.importorskip("truely_tpu.media.videoenc")
    import os

    from truely_tpu.media.encode import VideoWriter

    rng = np.random.default_rng(0)
    frames = [
        np.ascontiguousarray(
            np.repeat(
                np.repeat(
                    rng.integers(0, 256, (9, 16, 3), dtype=np.uint8), 8,
                    axis=0,
                ), 8, axis=1,
            )
        )
        for _ in range(12)
    ]
    sizes = {}
    for crf in (18, 35):
        path = str(tmp_path / f"crf{crf}.mp4")
        with VideoWriter(path, 10, 128, 72, preset="veryfast",
                         crf=crf, threads=2, slices=2) as wr:
            assert wr.codec == "h264"
            for f in frames:
                wr.write(f)
        sizes[crf] = os.path.getsize(path)
        assert sizes[crf] > 0
    assert sizes[35] < sizes[18]
