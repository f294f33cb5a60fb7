"""Location of the flagship regression clip (see fixtures/README.md for
its provenance).  The repo fixture is authoritative; the reference-mount
glob is a fallback for environments that strip binary fixtures."""

import glob
import os

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "veo3_360p.mp4")


def fixture_path(name):
    return os.path.join(os.path.dirname(__file__), "fixtures", name)


def bundled_clip_path():
    if os.path.isfile(FIXTURE):
        return FIXTURE
    hits = sorted(glob.glob("/root/reference/test/*.mp4"))
    return hits[0] if hits else None
