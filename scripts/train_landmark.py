#!/usr/bin/env python3
"""Train the 68-landmark head (and optionally fine-tune the embedder) on a
directory of (crop, landmarks) pairs — the TPU-native replacement for the
dlib ERT asset the reference ships but never loads (SURVEY.md §2.1 #16).

Data format: .npz shards with arrays ``crops`` (N, S, S, 3) uint8 and
``landmarks`` (N, 68, 2) in [0, 1] crop coordinates (e.g. exported from
300-W/WFLW-style annotation sets).  Without --data, trains on a synthetic
sanity task (random affine placements of a fixed landmark template) to
demonstrate convergence — useful for smoke-testing the full loop on
hardware.

Usage:
  python scripts/train_landmark.py --steps 1000 --batch 256 \
      [--data shards/] [--ckpt ckpts/] [--mesh 4x2]
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def synthetic_batch(rng, batch, size=80):
    """Random affine placements of a canonical 68-point template drawn as
    bright dots on noise — a learnable toy task (now lives in the package
    so the quality gate shares it: models/landmark68.py)."""
    from truely_tpu.models.landmark68 import synthetic_landmark_batch

    return synthetic_landmark_batch(rng, batch, size)


def train_landmark_only(steps, batch, lr, seed, data_batches=None):
    """Train JUST the landmark head (no embedder) with an MSE loss —
    used to produce the committed synthetic-quality checkpoint that
    tests/test_landmark_quality.py pins.  Returns trained params."""
    import optax

    from truely_tpu.models import init_landmark68
    from truely_tpu.models.landmark68 import apply_landmark68

    rng = np.random.default_rng(seed)
    params = init_landmark68(jax.random.PRNGKey(2))
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    def loss_fn(p, crops, lmks):
        return jnp.mean((apply_landmark68(p, crops) - lmks) ** 2)

    @jax.jit
    def step_fn(p, s, crops, lmks):
        loss, g = jax.value_and_grad(loss_fn)(p, crops, lmks)
        updates, s = opt.update(g, s)
        return optax.apply_updates(p, updates), s, loss

    for step in range(steps):
        if data_batches is not None:
            crops, lmks = data_batches()
        else:
            crops, lmks = synthetic_batch(rng, batch)
        params, opt_state, loss = step_fn(
            params, opt_state, jnp.asarray(crops), jnp.asarray(lmks)
        )
        if step % 50 == 0 or step == steps - 1:
            print(f"step {step}: mse={float(loss):.5f}", flush=True)
    return params


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--data", help="directory of .npz shards")
    ap.add_argument("--ckpt", help="checkpoint directory")
    ap.add_argument("--mesh", help="mesh shape like 4x2 (data x model)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--landmark-only", action="store_true",
                    help="train just the landmark head (MSE loss, no "
                         "embedder) — fast path for the synthetic quality "
                         "checkpoint")
    ap.add_argument("--save-params",
                    help="with --landmark-only: save the trained landmark "
                         "params (.npz via models.weights.save_params) here")
    args = ap.parse_args()

    if args.landmark_only:
        from truely_tpu.models.weights import save_params

        params = train_landmark_only(args.steps, args.batch, args.lr, args.seed)
        if args.save_params:
            save_params(args.save_params, params)
            print(f"saved landmark params to {args.save_params}")
        return

    from truely_tpu.models import init_inception_resnet_v1, init_landmark68
    from truely_tpu.parallel.checkpoint import (
        latest_step, restore_train_state, save_train_state,
    )
    from truely_tpu.parallel.mesh import make_mesh
    from truely_tpu.parallel.sharding import dp_spec, replicate
    from truely_tpu.parallel.train import Batch, make_train_step

    mesh = None
    if args.mesh:
        dp, tp = (int(v) for v in args.mesh.split("x"))
        mesh = make_mesh((dp, tp), ("data", "model"))

    params = {
        "facenet": init_inception_resnet_v1(jax.random.PRNGKey(1)),
        "landmark": init_landmark68(jax.random.PRNGKey(2)),
    }
    init_fn, step_fn = make_train_step(mesh, learning_rate=args.lr)
    if mesh is not None:
        params = replicate(mesh, params)
    state = init_fn(params)
    if args.ckpt and latest_step(args.ckpt) is not None:
        state = restore_train_state(args.ckpt, state)
        print(f"resumed from step {int(state.step)}")

    shards = sorted(glob.glob(os.path.join(args.data, "*.npz"))) if args.data else []
    rng = np.random.default_rng(args.seed)

    def next_batch():
        if shards:
            z = np.load(shards[rng.integers(len(shards))])
            n = z["crops"].shape[0]
            idx = rng.integers(0, n, args.batch)
            crops = z["crops"][idx].astype(np.float32) / 255.0
            lmks = z["landmarks"][idx].astype(np.float32)
        else:
            crops, lmks = synthetic_batch(rng, args.batch)
        # Second view: horizontal flip (embedding-consistency positive pair).
        return Batch(
            crops_a=jnp.asarray(crops),
            crops_b=jnp.asarray(crops[:, :, ::-1]),
            landmarks=jnp.asarray(lmks),
        )

    ctx = jax.set_mesh(mesh) if mesh is not None else None
    try:
        if ctx is not None:
            ctx.__enter__()
        for step in range(int(state.step), args.steps):
            batch = next_batch()
            if mesh is not None:
                batch = jax.device_put(
                    batch, Batch(dp_spec(mesh), dp_spec(mesh), dp_spec(mesh))
                )
            state, metrics = step_fn(state, batch)
            if step % 20 == 0 or step == args.steps - 1:
                print(
                    f"step {step}: loss={float(metrics['loss']):.4f} "
                    f"landmark_mse={float(metrics['landmark_mse']):.5f} "
                    f"nce={float(metrics['nce']):.4f}",
                    flush=True,
                )
            if args.ckpt and (step + 1) % 100 == 0:
                save_train_state(args.ckpt, state)
        if args.ckpt:
            save_train_state(args.ckpt, state)
            print(f"saved to {args.ckpt}")
    finally:
        if ctx is not None:
            ctx.__exit__(None, None, None)


if __name__ == "__main__":
    main()
