#!/usr/bin/env python3
"""Convert public facenet_pytorch checkpoints into truely_tpu .npz weights.

Run this in any environment that has the upstream artifacts (this build
container has no network egress, so the conversion is a one-time external
step; tests/test_models.py proves the conversion path end-to-end against
torch oracles with random weights).

Sources (facenet_pytorch package data / release downloads):
  - MTCNN stage nets:  pnet.pt, rnet.pt, onet.pt   (state dicts)
  - InceptionResnetV1: 20180402-114759-vggface2.pt (state dict; the
    ``logits.*`` classifier keys are ignored)

Usage:
  python scripts/convert_facenet_weights.py \
      --pnet pnet.pt --rnet rnet.pt --onet onet.pt \
      --facenet 20180402-114759-vggface2.pt \
      --out weights/

Then point the framework at the directory:  export TRUELY_TPU_WEIGHTS=weights/
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

from truely_tpu.models import (  # noqa: E402
    init_pnet, init_rnet, init_onet, init_inception_resnet_v1,
)
from truely_tpu.models.weights import convert_torch_state_dict, save_params  # noqa: E402


def _load_state_dict(path):
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(obj, "state_dict"):
        obj = obj.state_dict()
    # Drop the training-only classifier head if present.
    return {k: v for k, v in obj.items() if not k.startswith("logits.")}


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--pnet")
    ap.add_argument("--rnet")
    ap.add_argument("--onet")
    ap.add_argument("--facenet")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    key = jax.random.PRNGKey(0)
    jobs = [
        ("pnet", args.pnet, init_pnet),
        ("rnet", args.rnet, init_rnet),
        ("onet", args.onet, init_onet),
        ("facenet", args.facenet, init_inception_resnet_v1),
    ]
    for name, path, init_fn in jobs:
        if not path:
            print(f"[skip] {name}: no checkpoint given")
            continue
        template = init_fn(key)
        params = convert_torch_state_dict(template, _load_state_dict(path))
        out_path = os.path.join(args.out, f"{name}.npz")
        save_params(out_path, params)
        print(f"[ok] {name}: {path} -> {out_path}")


if __name__ == "__main__":
    main()
