"""Command-line interface.

``python -m truely_tpu analyze <video.mp4>`` is the minimum end-to-end
slice from SURVEY.md §7: decode → batched MTCNN → FaceNet → scan → score,
printing the fake score, suspicious-frame list, and per-stage timings.
``serve`` starts the API server (reference: uvicorn main, server.py:975).
"""

from __future__ import annotations

import argparse
import json
import logging
import sys


def _interval_divisor(detect_interval, auto_max: int = 8) -> int:
    """What --batch must divide by for a --detect-interval value ("auto"
    ladders up to auto_interval_max, so the cap is the divisor)."""
    return auto_max if detect_interval == "auto" else max(1, detect_interval)


def _interval_arg(value: str):
    if value == "auto":
        return "auto"
    try:
        return int(value)
    except ValueError:
        import argparse

        raise argparse.ArgumentTypeError(
            f'expected an integer or "auto", got {value!r}'
        )


def cmd_analyze(args) -> int:
    import os

    from truely_tpu.config import DetectorConfig
    from truely_tpu.pipeline.detector import Detector

    if not os.path.isfile(args.video):
        # Fail before paying model init / device attach.
        print(f"error: could not open video: {args.video}", file=sys.stderr)
        return 1

    from truely_tpu.config import MTCNNConfig

    if args.batch % _interval_divisor(args.detect_interval):
        print(
            f"error: --batch {args.batch} must be divisible by "
            f"--detect-interval {args.detect_interval} (auto: by its "
            f"interval cap, 8)",
            file=sys.stderr,
        )
        return 1
    config = DetectorConfig(
        frame_batch=args.batch,
        reference_compat=not args.corrected,
        use_pallas_crop=args.pallas_crop,
        multi_face=args.multi_face,
        yuv_ingest=not args.no_yuv,
        detect_interval=args.detect_interval,
        propagate_fallback=not args.no_propagate_fallback,
        draw_mode=args.draw,
        mtcnn=MTCNNConfig(
            pyramid_cascade=not args.exact_pyramid,
            stage_crop_quant=args.crop_quant,
        ),
    )
    mesh = None
    if args.dp > 1:
        import jax

        from truely_tpu.parallel.mesh import make_mesh

        devices = jax.devices()
        if len(devices) < args.dp:
            print(
                f"error: --dp {args.dp} needs {args.dp} devices, have "
                f"{len(devices)}",
                file=sys.stderr,
            )
            return 1
        if args.batch % args.dp:
            print(
                f"error: --batch {args.batch} must be divisible by "
                f"--dp {args.dp}",
                file=sys.stderr,
            )
            return 1
        mesh = make_mesh((args.dp, 1), ("data", "model"),
                         devices=devices[: args.dp])
    detector = Detector(config, weights_dir=args.weights, mesh=mesh)
    if not detector.facenet_pretrained:
        print(
            "warning: no converted FaceNet weights found (set TRUELY_TPU_WEIGHTS); "
            "running with seeded random weights — scores are not meaningful",
            file=sys.stderr,
        )
    if args.multi_face:
        # BASELINE config 4: per-track scoring, aggregate = max over tracks.
        try:
            score, per_track, _ = detector.analyze_video_multiface(
                args.video, args.output
            )
        except (IOError, OSError) as e:
            print(f"error: {e}", file=sys.stderr)
            return 1
        payload = {
            "fakeScore": int(score),
            "trackScores": [int(s) for s in per_track],
        }
        if args.output:
            payload["outputPath"] = args.output
        print(json.dumps(payload, indent=None if args.compact else 2))
        return 0
    try:
        result = detector.analyze_video(args.video, args.output)
    except (IOError, OSError) as e:
        print(f"error: {e}", file=sys.stderr)
        return 1
    payload = {
        "fakeScore": result.fake_score,
        "frameCount": result.frame_count,
        "fps": result.fps,
        "processedFrames": result.total_processed,
        "flaggedFrames": result.flagged_count,
        "suspiciousFrames": result.suspicious_frames,
        "timings": {k: round(v, 4) for k, v in result.timings.items()},
    }
    if args.output:
        payload["outputPath"] = args.output
    print(json.dumps(payload, indent=None if args.compact else 2))
    return 0


def cmd_stream(args) -> int:
    """Live multi-stream analysis (BASELINE config 5): N video files as
    concurrent streams through one shared device batch, per-stream live
    events on stderr-free stdout (JSONL with --events) and end-of-stream
    summaries with sampled-fps and lag stats."""
    import os

    from truely_tpu.config import DetectorConfig, MTCNNConfig
    from truely_tpu.pipeline.detector import Detector
    from truely_tpu.pipeline.stream_files import stream_videos

    for p in args.videos:
        if not os.path.isfile(p):
            print(f"error: could not open video: {p}", file=sys.stderr)
            return 1
    if args.batch % _interval_divisor(args.detect_interval):
        print(
            f"error: --batch {args.batch} must be divisible by "
            f"--detect-interval {args.detect_interval} (auto: by its "
            f"interval cap, 8)",
            file=sys.stderr,
        )
        return 1
    config = DetectorConfig(
        frame_batch=args.batch,
        reference_compat=not args.corrected,
        yuv_ingest=not args.no_yuv,
        sample_hz=args.sample_hz,
        detect_interval=args.detect_interval,
        multi_face=args.multi_face,
        mtcnn=MTCNNConfig(
            pyramid_cascade=not args.exact_pyramid,
            stage_crop_quant=args.crop_quant,
        ),
    )
    mesh = None
    if args.dp > 1:
        import jax

        from truely_tpu.parallel.mesh import make_mesh

        devices = jax.devices()
        if len(devices) < args.dp:
            print(
                f"error: --dp {args.dp} needs {args.dp} devices, have "
                f"{len(devices)}",
                file=sys.stderr,
            )
            return 1
        mesh = make_mesh((args.dp, 1), ("data", "model"),
                         devices=devices[: args.dp])
    detector = Detector(config, weights_dir=args.weights, mesh=mesh)

    def emit(e):
        if args.multi_face:
            print(json.dumps({
                "stream": e.stream_id,
                "frame": e.frame_index,
                "flagged": e.flagged,
                "tracks": [
                    {
                        "updated": bool(e.track_updated[t]),
                        "flagged": bool(e.track_flagged[t]),
                        "similarity": round(float(e.track_sim[t]), 6),
                        "box": [round(float(v), 1) for v in e.track_boxes[t]],
                    }
                    for t in range(len(e.track_updated))
                    if e.track_active[t]
                ],
            }), flush=True)
            return
        print(json.dumps({
            "stream": e.stream_id,
            "frame": e.frame_index,
            "hasFace": e.has_face,
            "flagged": e.flagged,
            "similarity": round(e.similarity, 6),
            "counter": e.counter,
        }), flush=True)

    sched_stats: dict = {}
    try:
        summaries = stream_videos(
            detector, args.videos,
            frames_per_stream=args.frames_per_stream,
            mesh=mesh,
            realtime=args.realtime,
            partial_step_budget=args.partial_budget,
            on_event=emit if args.events else None,
            scheduler_stats=sched_stats,
        )
    except (IOError, OSError, ValueError) as e:
        print(f"error: {e}", file=sys.stderr)
        return 1
    if sched_stats:  # diagnostics on stderr; stdout stays the summary list
        print(json.dumps({"schedulerEfficiency": {
            "steps": sched_stats["steps"],
            "framesScored": sched_stats["frames_scored"],
            "framesPadded": sched_stats["frames_padded"],
            "batchUtilization": round(sched_stats["batch_utilization"], 4),
        }}), file=sys.stderr)
    payload = [
        {
            "path": s.path,
            "fakeScore": s.fake_score,
            **(
                {"trackScores": s.track_scores}
                if s.track_scores is not None
                else {}
            ),
            "frameCount": s.frame_count,
            "fps": s.fps,
            "processedFrames": s.processed,
            "flaggedFrames": s.flagged_count,
            "suspiciousFrames": s.suspicious_frames,
            "sampledFps": round(s.sampled_fps, 2),
            "meanLagMs": round(s.mean_lag_s * 1000, 1),
            "p50LagMs": round(s.p50_lag_s * 1000, 1),
            "p95LagMs": round(s.p95_lag_s * 1000, 1),
            "maxLagMs": round(s.max_lag_s * 1000, 1),
            "wallSeconds": round(s.wall_s, 3),
            "yuvIngest": s.yuv_ingest,
        }
        for s in summaries
    ]
    print(json.dumps(payload, indent=None if args.compact else 2))
    return 0


def cmd_serve(args) -> int:
    from truely_tpu.config import DetectorConfig, MTCNNConfig, ServerConfig
    from truely_tpu.serve import app as serve_app

    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s - %(name)s - %(levelname)s - %(message)s",
    )

    def detector_factory():
        # Same detector knobs as `analyze`, applied to the server's
        # lazily-built (or warmup-built) detector.
        from truely_tpu.pipeline.detector import Detector

        mesh = None
        if args.dp > 1:
            import jax

            from truely_tpu.parallel.mesh import make_mesh

            devices = jax.devices()
            if len(devices) < args.dp:
                raise RuntimeError(
                    f"--dp {args.dp} needs {args.dp} devices, have "
                    f"{len(devices)}"
                )
            mesh = make_mesh((args.dp, 1), ("data", "model"),
                             devices=devices[: args.dp])
        config = DetectorConfig(
            frame_batch=args.batch,
            multi_face=args.multi_face,
            detect_interval=args.detect_interval,
            mtcnn=MTCNNConfig(stage_crop_quant=args.crop_quant),
        )
        return Detector(config, weights_dir=args.weights, mesh=mesh)

    if args.dp > 1 and args.batch % args.dp:
        print(
            f"error: --batch {args.batch} must be divisible by --dp "
            f"{args.dp}",
            file=sys.stderr,
        )
        return 1
    if args.batch % _interval_divisor(args.detect_interval):
        print(
            f"error: --batch {args.batch} must be divisible by "
            f"--detect-interval {args.detect_interval} (auto: by its "
            f"interval cap, 8)",
            file=sys.stderr,
        )
        return 1
    app = serve_app.create_app(
        config=ServerConfig(
            host=args.host, port=args.port,
            warmup_resolutions=tuple(args.warmup or ()),
        ),
        detector_factory=detector_factory,
    )
    app.serve()
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="truely_tpu")
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("analyze", help="analyze a video file")
    p.add_argument("video")
    p.add_argument("-o", "--output", help="write annotated video here")
    p.add_argument("--batch", type=int, default=32, help="device frame batch")
    p.add_argument("--weights", help="directory of converted .npz weights")
    p.add_argument("--corrected", action="store_true",
                   help="RGB + corrected semantics instead of reference compat")
    p.add_argument("--compact", action="store_true", help="one-line JSON")
    p.add_argument("--no-yuv", action="store_true",
                   help="disable native-YUV ingestion (results are "
                        "bit-identical either way)")
    p.add_argument("--pallas-crop", action="store_true",
                   help="use the Pallas face-crop kernel (TPU only; see "
                        "PERFORMANCE.md finding 4 for when it wins)")
    p.add_argument("--exact-pyramid", action="store_true",
                   help="resample every pyramid level from the full frame "
                        "(exact area semantics) instead of the ~2.7x-faster "
                        "cascaded resample (PERFORMANCE.md finding 11)")
    p.add_argument("--crop-quant", type=int, default=4,
                   help="snap R-Net/O-Net crop boxes to an N-px grid so the "
                        "stage-crop dots contract the block-mean frame "
                        "(FLOPs/N^2 on the step's top-2 device ops); 1 = "
                        "exact full-resolution crops")
    p.add_argument("--multi-face", action="store_true",
                   help="score every tracked face (aggregate = max over "
                        "tracks) instead of the reference's first face "
                        "only; prints per-track scores")
    p.add_argument("--draw", choices=("all", "flagged-only"), default="all",
                   help="annotated-output draw policy: 'all' = the "
                        "reference contract (red/green box on every "
                        "sampled frame with a face); 'flagged-only' = red "
                        "boxes on flagged frames only, so clean frames "
                        "re-encode straight from the decoded I420 planes "
                        "(cuts the host annotate/convert cost; decisions "
                        "identical)")
    p.add_argument("--detect-interval", type=_interval_arg, default=1,
                   help="track-propagated detection: run the full pyramid+"
                        "P-Net cascade only every K-th sampled frame and "
                        "refine the frames between from the keyframe box "
                        "through R-Net/O-Net (1 = off, bit-identical to "
                        "full detection; batch must divide by K)")
    p.add_argument("--no-propagate-fallback", action="store_true",
                   help="with --detect-interval: never re-run full "
                        "detection on segments whose refinement collapsed "
                        "(max throughput; faces re-acquire at keyframes)")
    p.add_argument("--dp", type=int, default=1,
                   help="shard each frame batch over the first N devices "
                        "(data-parallel mesh); batch must divide by N")
    p.set_defaults(fn=cmd_analyze)

    p = sub.add_parser(
        "stream",
        help="analyze N video files as concurrent live streams "
             "(shared device batches; per-stream events + lag stats)",
    )
    p.add_argument("videos", nargs="+", help="same-resolution video files")
    p.add_argument("--batch", type=int, default=32,
                   help="total device frame batch shared by all streams")
    p.add_argument("--frames-per-stream", type=int, default=None,
                   help="sampled frames per stream per step (default: "
                        "batch // n_streams)")
    p.add_argument("--weights", help="directory of converted .npz weights")
    p.add_argument("--corrected", action="store_true",
                   help="RGB + corrected semantics instead of reference compat")
    p.add_argument("--events", action="store_true",
                   help="print one JSON line per sampled frame as its "
                        "device step completes")
    p.add_argument("--realtime", action="store_true",
                   help="pace each stream at its fps (live-feed simulation; "
                        "lag stats then reflect steady-state latency)")
    p.add_argument("--detect-interval", type=_interval_arg, default=1,
                   help="track-propagated streaming: full cascade every "
                        "K-th scheduler step, per-stream seeded "
                        "refinement between (O-Net re-scores every frame; "
                        "lost faces re-acquire at the next keyframe step)")
    p.add_argument("--multi-face", action="store_true",
                   help="per-track scoring for every stream (BASELINE "
                        "config 4 composed with streaming): events carry "
                        "per-track boxes/flags, summaries per-track "
                        "scores; aggregate = max over tracks")
    p.add_argument("--partial-budget", type=float, default=0.0,
                   help="realtime only: defer a partial batch until its "
                        "oldest queued frame is this many seconds old "
                        "(bounds the lag batching can add; raises batch "
                        "utilization on H2D-starved hosts)")
    p.add_argument("--sample-hz", type=int, default=7,
                   help="sampling rate law: analyze every "
                        "max(1, int(fps/sample_hz))-th frame (reference "
                        "model.py:40 uses 7; 15 doubles the 1080p60 "
                        "per-stream analysis rate)")
    p.add_argument("--no-yuv", action="store_true",
                   help="disable native-YUV ingestion")
    p.add_argument("--compact", action="store_true", help="one-line JSON")
    p.add_argument("--exact-pyramid", action="store_true",
                   help="exact full-frame pyramid resample (see analyze)")
    p.add_argument("--crop-quant", type=int, default=4,
                   help="stage-crop box grid (1 = exact; see analyze)")
    p.add_argument("--dp", type=int, default=1,
                   help="shard the shared batch over the first N devices")
    p.set_defaults(fn=cmd_stream)

    p = sub.add_parser("serve", help="start the API server")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=5001)
    p.add_argument("--batch", type=int, default=32,
                   help="device frame batch for the server's detector")
    p.add_argument("--weights", help="directory of converted .npz weights")
    p.add_argument("--multi-face", action="store_true",
                   help="per-track scoring for /analyze-* (aggregate = "
                        "max over tracks)")
    p.add_argument("--crop-quant", type=int, default=4,
                   help="stage-crop box grid (1 = exact; see analyze)")
    p.add_argument("--detect-interval", type=_interval_arg, default=1,
                   help="track-propagated detection for the server's "
                        "analyses: full cascade every K-th sampled frame, "
                        "seeded refinement between (see analyze).  At K>1 "
                        "concurrent-batched jobs score under the streaming "
                        "propagate cadence, so their decisions may differ "
                        "from a solo run at the same K (same drift "
                        "contract); at K=1 concurrency is exact (tested)")
    p.add_argument("--dp", type=int, default=1,
                   help="shard the server's frame batches over the first "
                        "N devices")
    def _resolution(value: str) -> str:
        # Validate at parse time: a malformed bucket would otherwise be
        # discovered minutes into runtime as a background-thread warning.
        try:
            h, w = map(int, value.lower().split("x"))
            if h <= 0 or w <= 0:
                raise ValueError
        except ValueError:
            raise argparse.ArgumentTypeError(
                f"expected HxW (e.g. 1080x1920), got {value!r}"
            )
        return value

    p.add_argument("--warmup", action="append", metavar="HxW",
                   type=_resolution,
                   help="pre-compile this resolution bucket at startup "
                        "(repeatable, e.g. --warmup 360x640 --warmup "
                        "1080x1920); progress shows in /health")
    p.set_defaults(fn=cmd_serve)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
