"""truely_tpu — a TPU-native framework for real-time AI-generated-video detection.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
huzaifakhan04/truely-real-time-ai-generated-video-detection-framework-for-social-platforms
(reference layer map in SURVEY.md §1):

- ``truely_tpu.ops``      — TPU kernels: exact area/bilinear resize, batched
                            crop-resize, masked fixed-capacity NMS, box algebra,
                            the resettable run-length temporal scan.
- ``truely_tpu.models``   — P-Net/R-Net/O-Net, Inception-ResNet-v1 (FaceNet),
                            and the 68-landmark head as pure-function JAX models.
- ``truely_tpu.pipeline`` — the jit-compiled batched detector: pyramid → cascade
                            → embed → temporal scan → score (replaces the
                            per-frame CPU loop of reference server/model.py).
- ``truely_tpu.media``    — host-side video decode/encode + annotation overlay
                            and media acquisition (yt-dlp), off the hot path.
- ``truely_tpu.parallel`` — device-mesh sharding: data-parallel frame batches,
                            sequence-parallel timelines with cross-shard scan
                            carry, and the training step used for multi-chip
                            dry runs.
- ``truely_tpu.serve``    — the HTTP API server reproducing the reference's
                            public endpoint surface (reference server/server.py).
- ``truely_tpu.agents``   — transcription / web-search / LLM-judge clients and
                            prompts (reference server/web/), off the hot path.
"""

__version__ = "0.1.0"
