"""Whole-cascade parity: batched fixed-capacity JAX MTCNN vs a dynamic
torch/numpy oracle re-stating the upstream detect_face flow the reference
depends on (pyramid, generateBoundingBox, per-scale + cross-scale NMS,
stage regressions, trunc-clamp crops, landmark mapping, 'min' NMS).

Runs with random stage-net weights at f32/HIGHEST: identical weights on both
sides, so any disagreement is a cascade-logic bug, not a weights issue.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as TF
import jax
import jax.numpy as jnp

from truely_tpu.config import MTCNNConfig
from truely_tpu.models import init_pnet, init_rnet, init_onet
from truely_tpu.models.weights import convert_torch_state_dict
from truely_tpu.pipeline.mtcnn import MTCNNParams, detect_faces
from truely_tpu.pipeline.pyramid import pyramid_schedule
from tests import torch_refs
from tests.test_models import randomize, nchw

HIGH = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# Oracle (single image, dynamic shapes, numpy/torch)
# ---------------------------------------------------------------------------


def oracle_nms(boxes, scores, threshold, method):
    from tests.test_boxes_nms import oracle_nms as _nms
    if len(boxes) == 0:
        return np.zeros(0, dtype=bool)
    return _nms(boxes, scores, threshold, method)


def imresample_area(img_hwc, size):
    t = torch.from_numpy(np.ascontiguousarray(img_hwc.transpose(2, 0, 1)))[None].float()
    out = TF.interpolate(t, size=size, mode="area")
    return out[0].permute(1, 2, 0).numpy()


def oracle_detect(img_hwc_u8, pnet, rnet, onet, cfg: MTCNNConfig):
    img = img_hwc_u8.astype(np.float32)
    h, w = img.shape[:2]
    thr = cfg.thresholds
    boxes_all = []

    for lvl in pyramid_schedule(h, w, cfg.min_face_size, cfg.scale_factor):
        scaled = imresample_area(img, (lvl.height, lvl.width))
        norm = (scaled - 127.5) * 0.0078125
        with torch.no_grad():
            reg_t, prob_t = pnet(nchw(norm[None]))
        prob = prob_t[0, 1].numpy()
        reg = reg_t[0].permute(1, 2, 0).numpy()  # (Hp, Wp, 4)
        ys, xs = np.nonzero(prob >= np.float32(thr[0]))
        if len(ys) == 0:
            continue
        score = prob[ys, xs]
        r = reg[ys, xs]
        # Box corners in FLOAT32, matching upstream generateBoundingBox:
        # torch promotes the int cell indices to the default f32 dtype when
        # dividing by the python-float scale, so the floor happens in f32.
        # numpy's default f64 here flips ~50 floors per 360p pyramid (e.g.
        # 60/0.6 = 100.0 in f64 but 99.999996 in f32) and desyncs NMS.
        cells = np.stack([xs, ys], 1).astype(np.float32)
        q1 = np.floor((2.0 * cells + 1.0) / np.float32(lvl.scale))
        q2 = np.floor((2.0 * cells + 12.0) / np.float32(lvl.scale))
        boxes = np.concatenate([q1, q2, score[:, None], r], axis=1)
        keep = oracle_nms(boxes[:, :4], boxes[:, 4], cfg.nms_thresholds[0], "union")
        boxes_all.append(boxes[keep])

    if not boxes_all:
        return np.zeros((0, 4)), np.zeros(0), np.zeros((0, 5, 2))
    boxes = np.concatenate(boxes_all, axis=0)
    keep = oracle_nms(boxes[:, :4], boxes[:, 4], cfg.nms_thresholds[1], "union")
    boxes = boxes[keep]
    regw = boxes[:, 2] - boxes[:, 0]
    regh = boxes[:, 3] - boxes[:, 1]
    qq = boxes[:, :4] + boxes[:, 5:9] * np.stack([regw, regh, regw, regh], 1)
    boxes = np.concatenate([qq, boxes[:, 4:5]], axis=1)
    boxes[:, :4] = _rerec(boxes[:, :4])

    empty = (np.zeros((0, 4)), np.zeros(0), np.zeros((0, 5, 2)))
    if len(boxes) == 0:
        return empty

    # Stage 2
    crops = _crop_stage(img, boxes[:, :4], w, h, 24)
    with torch.no_grad():
        reg_t, prob_t = rnet(nchw((crops - 127.5) * 0.0078125))
    prob = prob_t[:, 1].numpy()
    reg = reg_t.numpy()
    ipass = prob > np.float32(thr[1])
    boxes = np.concatenate([boxes[ipass, :4], prob[ipass, None]], axis=1)
    reg = reg[ipass]
    keep = oracle_nms(boxes[:, :4], boxes[:, 4], cfg.nms_thresholds[2], "union")
    boxes, reg = boxes[keep], reg[keep]
    boxes[:, :4] = _rerec(_bbreg(boxes[:, :4], reg))
    if len(boxes) == 0:
        return empty

    # Stage 3
    crops = _crop_stage(img, boxes[:, :4], w, h, 48)
    with torch.no_grad():
        reg_t, lmk_t, prob_t = onet(nchw((crops - 127.5) * 0.0078125))
    prob = prob_t[:, 1].numpy()
    reg = reg_t.numpy()
    lmk = lmk_t.numpy()
    ipass = prob > np.float32(thr[2])
    boxes = np.concatenate([boxes[ipass, :4], prob[ipass, None]], axis=1)
    reg, lmk = reg[ipass], lmk[ipass]
    wi = boxes[:, 2] - boxes[:, 0] + 1
    hi = boxes[:, 3] - boxes[:, 1] + 1
    pts_x = wi[:, None] * lmk[:, 0:5] + boxes[:, 0:1] - 1
    pts_y = hi[:, None] * lmk[:, 5:10] + boxes[:, 1:2] - 1
    points = np.stack([pts_x, pts_y], axis=-1)
    boxes[:, :4] = _bbreg(boxes[:, :4], reg)
    keep = oracle_nms(boxes[:, :4], boxes[:, 4], cfg.nms_thresholds[3], "min")
    return boxes[keep, :4], boxes[keep, 4], points[keep]


def _bbreg(b, reg):
    w = b[:, 2] - b[:, 0] + 1
    h = b[:, 3] - b[:, 1] + 1
    return b + reg * np.stack([w, h, w, h], 1)


def _rerec(b):
    w = b[:, 2] - b[:, 0]
    h = b[:, 3] - b[:, 1]
    side = np.maximum(w, h)
    x1 = b[:, 0] + w * 0.5 - side * 0.5
    y1 = b[:, 1] + h * 0.5 - side * 0.5
    return np.stack([x1, y1, x1 + side, y1 + side], 1)


def _crop_stage(img, boxes, w, h, out):
    """Trunc-clamp crop + area resample (upstream pad + imresample)."""
    crops = []
    for b in boxes:
        bi = np.trunc(b).astype(int)
        x0 = max(bi[0], 1) - 1
        y0 = max(bi[1], 1) - 1
        x1 = min(bi[2], w)
        y1 = min(bi[3], h)
        if x1 <= x0 or y1 <= y0:
            crops.append(np.zeros((out, out, 3), np.float32))
            continue
        crops.append(imresample_area(img[y0:y1, x0:x1], (out, out)))
    return np.stack(crops) if crops else np.zeros((0, out, out, 3), np.float32)


# ---------------------------------------------------------------------------
# The parity test
# ---------------------------------------------------------------------------


def make_nets_and_params(seed):
    pnet_t = randomize(torch_refs.PNet(), seed)
    rnet_t = randomize(torch_refs.RNet(), seed + 1)
    onet_t = randomize(torch_refs.ONet(), seed + 2)
    key = jax.random.PRNGKey(0)
    params = MTCNNParams(
        pnet=convert_torch_state_dict(init_pnet(key), pnet_t.state_dict()),
        rnet=convert_torch_state_dict(init_rnet(key), rnet_t.state_dict()),
        onet=convert_torch_state_dict(init_onet(key), onet_t.state_dict()),
    )
    return (pnet_t, rnet_t, onet_t), params


@pytest.mark.parametrize("seed,hw", [(0, (72, 96)), (10, (72, 96)),
                                     (3, (120, 168))])
def test_cascade_matches_oracle(seed, hw):
    # Random nets produce arbitrary "detections"; thresholds tuned so each
    # stage keeps a handful of candidates within our fixed capacities.
    cfg = MTCNNConfig(thresholds=(0.92, 0.55, 0.30), nms_max_rounds=0)
    (pnet_t, rnet_t, onet_t), params = make_nets_and_params(seed)

    rng = np.random.default_rng(seed)
    frames = rng.integers(0, 256, size=(2, *hw, 3), dtype=np.uint8)

    det = detect_faces(
        params, jnp.asarray(frames), cfg, dtype=None, precision=HIGH
    )
    boxes = np.asarray(det.boxes)
    scores = np.asarray(det.scores)
    points = np.asarray(det.landmarks)
    valid = np.asarray(det.valid)

    for b in range(frames.shape[0]):
        eb, es, ep = oracle_detect(frames[b], pnet_t, rnet_t, onet_t, cfg)
        got_idx = np.nonzero(valid[b])[0]
        assert len(got_idx) == len(eb), (
            f"frame {b}: got {len(got_idx)} boxes, oracle {len(eb)}"
        )
        if len(eb) == 0:
            continue
        # Match by score ordering (both sides sorted by score desc).
        order_g = got_idx[np.argsort(-scores[b, got_idx], kind="stable")]
        order_e = np.argsort(-es, kind="stable")
        np.testing.assert_allclose(
            scores[b, order_g], es[order_e], atol=1e-4)
        np.testing.assert_allclose(
            boxes[b, order_g], eb[order_e], atol=0.05, rtol=1e-4)
        np.testing.assert_allclose(
            points[b, order_g], ep[order_e], atol=0.05, rtol=1e-4)


def test_cascade_per_frame_independence():
    """Batched results for a frame must not depend on its batch neighbours
    (the whole cascade is per-frame work until the temporal scan)."""
    cfg = MTCNNConfig(thresholds=(0.92, 0.55, 0.30), nms_max_rounds=0)
    _, params = make_nets_and_params(0)
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, size=(3, 72, 96, 3), dtype=np.uint8)

    full = detect_faces(params, jnp.asarray(frames), cfg, dtype=None, precision=HIGH)
    for b in range(3):
        solo = detect_faces(
            params, jnp.asarray(frames[b : b + 1]), cfg, dtype=None, precision=HIGH
        )
        np.testing.assert_array_equal(
            np.asarray(full.valid[b]), np.asarray(solo.valid[0]))
        np.testing.assert_allclose(
            np.asarray(full.boxes[b]), np.asarray(solo.boxes[0]), atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(full.scores[b]), np.asarray(solo.scores[0]), atol=1e-5)


def test_cascade_no_candidates():
    """Thresholds no random net can reach -> zero valid detections."""
    cfg = MTCNNConfig(thresholds=(0.999999, 0.999999, 0.999999))
    _, params = make_nets_and_params(3)
    frames = np.zeros((1, 72, 96, 3), np.uint8)
    det = detect_faces(params, jnp.asarray(frames), cfg, dtype=None, precision=HIGH)
    assert not np.asarray(det.valid).any()


@pytest.mark.slow
def test_cascade_oracle_parity_720p_production_capacities():
    """Capacity faithfulness at a product resolution (VERDICT round 1 #4):
    REAL clip frames upscaled to 1280x720, run through the cascade with the
    PRODUCTION capacities (pnet_topk_total=256, rnet=64, onet=32 — the
    config.py defaults, not reduced), against the dynamic-shape oracle.
    The P-Net threshold is tuned (0.5555) so the random nets' stage-1
    survivor counts (measured 24-46/frame) stay inside rnet_capacity=64 —
    capacity truncation must be a non-event and the match exact."""
    import cv2
    import glob as _glob

    from tests.clip import bundled_clip_path
    clip = bundled_clip_path()
    if not clip:
        pytest.skip("bundled clip not present")
    cap = cv2.VideoCapture(clip)
    frames_360 = []
    while len(frames_360) < 64:
        ret, f = cap.read()
        if not ret:
            break
        frames_360.append(f)
    cap.release()
    sel = [frames_360[0], frames_360[40], frames_360[48], frames_360[56]]
    frames = np.stack([cv2.resize(f, (1280, 720)) for f in sel])

    cfg = MTCNNConfig(thresholds=(0.5555, 0.7, 0.7), nms_max_rounds=0)
    assert cfg.pnet_topk_total == 256 and cfg.rnet_capacity == 64 \
        and cfg.onet_capacity == 32, "must run at PRODUCTION capacities"
    (pnet_t, rnet_t, onet_t), params = make_nets_and_params(13)

    det = detect_faces(
        params, jnp.asarray(frames), cfg, dtype=None, precision=HIGH
    )
    boxes = np.asarray(det.boxes)
    scores = np.asarray(det.scores)
    valid = np.asarray(det.valid)

    any_detections = False
    for b in range(frames.shape[0]):
        eb, es, _ = oracle_detect(frames[b], pnet_t, rnet_t, onet_t, cfg)
        got_idx = np.nonzero(valid[b])[0]
        assert len(got_idx) == len(eb), (
            f"frame {b}: got {len(got_idx)} boxes, oracle {len(eb)}"
        )
        if len(eb) == 0:
            continue
        any_detections = True
        order_g = got_idx[np.argsort(-scores[b, got_idx], kind="stable")]
        order_e = np.argsort(-es, kind="stable")
        np.testing.assert_allclose(scores[b, order_g], es[order_e], atol=1e-4)
        np.testing.assert_allclose(
            boxes[b, order_g], eb[order_e], atol=0.05, rtol=1e-4)
    assert any_detections, "no detections on any frame — retune thresholds"


def test_cascade_bf16_production_path_runs_and_is_sane():
    """Execution coverage for the bf16 production path (precision=None:
    int8-MXU pyramid resample via resize_area_u8, int8 stage crops, bf16
    convs) that TPU production takes but the f32-pinned parity tests never
    exercise.  The numeric pieces are exactness-tested individually
    (test_resize: resize_area_u8 integer means, crop_resize_area_mxu
    bit-exact); here the assembled path must run and produce sane,
    in-frame, finite detections.
    """
    # Zero thresholds: random stage nets emit probs in a narrow band (e.g.
    # 0.545-0.557 for this seed), so any positive threshold is flaky.
    cfg = MTCNNConfig(thresholds=(0.0, 0.0, 0.0), nms_max_rounds=0)
    _, params = make_nets_and_params(5)
    rng = np.random.default_rng(5)
    frames = rng.integers(0, 256, size=(2, 73, 97, 3), dtype=np.uint8)

    det = detect_faces(params, jnp.asarray(frames), cfg,
                       dtype=jnp.bfloat16, precision=None)
    boxes = np.asarray(det.boxes)
    scores = np.asarray(det.scores)
    valid = np.asarray(det.valid)
    assert valid.any(), "low thresholds on random nets should detect"
    assert np.isfinite(boxes[valid]).all()
    assert np.isfinite(scores[valid]).all()
    assert (scores[valid] > 0).all() and (scores[valid] <= 1).all()
    # Random O-Net regression weights emit wild offsets, so box ordering
    # is not guaranteed here; landmarks and boxes must just be finite.
    assert np.isfinite(np.asarray(det.landmarks)[valid]).all()


def test_stage_crop_quant_gated_off_parity_paths():
    """stage_crop_quant must be a no-op on f32/HIGHEST parity configs: the
    golden run and the torch oracles bit-match the exact full-resolution
    crops (same gate as pyramid_cascade)."""
    cfg_exact = MTCNNConfig(thresholds=(0.92, 0.55, 0.30), nms_max_rounds=0,
                            stage_crop_quant=1)
    cfg_quant = MTCNNConfig(thresholds=(0.92, 0.55, 0.30), nms_max_rounds=0,
                            stage_crop_quant=8)
    _, params = make_nets_and_params(0)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.integers(0, 256, size=(2, 72, 96, 3), dtype=np.uint8))
    a = detect_faces(params, frames, cfg_exact, dtype=None, precision=HIGH)
    b = detect_faces(params, frames, cfg_quant, dtype=None, precision=HIGH)
    np.testing.assert_array_equal(np.asarray(a.boxes), np.asarray(b.boxes))
    np.testing.assert_array_equal(np.asarray(a.scores), np.asarray(b.scores))
    np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))


def test_stage_crop_quant_engages_on_production_path(monkeypatch):
    """On the bf16 production path the quantized crop function must be the
    one the cascade calls (and with the configured q)."""
    import truely_tpu.pipeline.mtcnn as mtcnn_mod

    calls = []
    real = mtcnn_mod.crop_resize_area_mxu_quant

    def spy(frames, bounds, out_size, *, quant):
        calls.append((out_size, quant))
        return real(frames, bounds, out_size, quant=quant)

    monkeypatch.setattr(mtcnn_mod, "crop_resize_area_mxu_quant", spy)
    cfg = MTCNNConfig(thresholds=(0.92, 0.55, 0.30), nms_max_rounds=0,
                      stage_crop_quant=4)
    _, params = make_nets_and_params(0)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.integers(0, 256, size=(1, 72, 96, 3), dtype=np.uint8))
    detect_faces(params, frames, cfg, dtype=jnp.bfloat16, precision=None)
    assert calls == [(24, 4), (48, 4)]


@pytest.mark.slow
def test_cascade_oracle_parity_1080p_production_capacities():
    """Capacity faithfulness at the HEADLINE resolution: real clip frames
    upscaled to 1920x1080 through the cascade with the PRODUCTION
    capacities (pnet_topk_total=256, rnet=64, onet=32) against the
    dynamic-shape oracle.  Survivor counts measured at 29-38/frame for
    these frames/threshold (tuning sweep 2026-08-18), well inside
    rnet_capacity=64 — capacity truncation must be a non-event and the
    match exact.  Two frames keep the CPU cost near the 720p test's."""
    import cv2

    from tests.clip import bundled_clip_path
    clip = bundled_clip_path()
    if not clip:
        pytest.skip("bundled clip not present")
    cap = cv2.VideoCapture(clip)
    raw = []
    while len(raw) < 33:
        ret, f = cap.read()
        if not ret:
            break
        raw.append(f)
    cap.release()
    frames = np.stack(
        [cv2.resize(f, (1920, 1080)) for f in (raw[0], raw[32])]
    )

    cfg = MTCNNConfig(thresholds=(0.5555, 0.7, 0.7), nms_max_rounds=0)
    assert cfg.pnet_topk_total == 256 and cfg.rnet_capacity == 64 \
        and cfg.onet_capacity == 32, "must run at PRODUCTION capacities"
    (pnet_t, rnet_t, onet_t), params = make_nets_and_params(13)

    det = detect_faces(
        params, jnp.asarray(frames), cfg, dtype=None, precision=HIGH
    )
    boxes = np.asarray(det.boxes)
    scores = np.asarray(det.scores)
    valid = np.asarray(det.valid)

    any_detections = False
    for b in range(frames.shape[0]):
        eb, es, _ = oracle_detect(frames[b], pnet_t, rnet_t, onet_t, cfg)
        got_idx = np.nonzero(valid[b])[0]
        assert len(got_idx) == len(eb), (
            f"frame {b}: got {len(got_idx)} boxes, oracle {len(eb)}"
        )
        if len(eb) == 0:
            continue
        any_detections = True
        order_g = got_idx[np.argsort(-scores[b, got_idx], kind="stable")]
        order_e = np.argsort(-es, kind="stable")
        np.testing.assert_allclose(scores[b, order_g], es[order_e], atol=1e-4)
        np.testing.assert_allclose(
            boxes[b, order_g], eb[order_e], atol=0.05, rtol=1e-4)
    assert any_detections, "no detections on any frame — retune thresholds"
