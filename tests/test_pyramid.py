"""Pyramid-schedule parity vs a literal transcription of the upstream loop."""

import pytest

from truely_tpu.pipeline.pyramid import pyramid_schedule


def oracle_scales(h, w, minsize=20, factor=0.709):
    m = 12.0 / minsize
    minl = min(h, w) * m
    scale = m
    out = []
    while minl >= 12.0:
        out.append(scale)
        scale *= factor
        minl *= factor
    return out


@pytest.mark.parametrize("hw", [(360, 640), (1080, 1920), (720, 1280),
                                (72, 96), (12, 12), (2000, 100)])
def test_schedule_matches_oracle(hw):
    h, w = hw
    levels = pyramid_schedule(h, w)
    expect = oracle_scales(h, w)
    assert [lv.scale for lv in levels] == expect
    for lv in levels:
        assert lv.height == int(h * lv.scale + 1)
        assert lv.width == int(w * lv.scale + 1)


def test_schedule_respects_min_face_size():
    big = pyramid_schedule(360, 640, min_face_size=20)
    small = pyramid_schedule(360, 640, min_face_size=80)
    assert len(small) < len(big)
    assert small[0].scale == pytest.approx(12.0 / 80)


def test_schedule_empty_for_tiny_images():
    assert pyramid_schedule(10, 10) == []
