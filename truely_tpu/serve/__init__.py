"""HTTP API server reproducing the reference's public endpoint surface."""

from truely_tpu.serve.results import ResultStore  # noqa: F401
from truely_tpu.serve.app import create_app, TruelyServer  # noqa: F401
