"""Weight persistence and PyTorch-checkpoint conversion.

The reference implicitly downloads facenet_pytorch's pretrained MTCNN and
vggface2 Inception-ResNet-v1 checkpoints on every ``run()`` call
(server/model.py:18-19).  Here weights are an explicit artifact:

- ``save_params`` / ``load_params`` — flat ``.npz`` serialization of the
  nested param pytrees (lists encoded as integer path segments).
- ``convert_torch_state_dict`` — a structural walk that converts any of the
  upstream PyTorch checkpoints (P/R/O-Net, InceptionResnetV1) into our NHWC
  param trees: conv OIHW->HWIO, dense (out,in)->(in,out), bn/prelu renames.
  Run scripts/convert_facenet_weights.py in an environment that has the
  checkpoints to produce the .npz files this package loads.
- ``load_or_init`` — loads a named weight file from ``TRUELY_TPU_WEIGHTS``
  (or a given directory), falling back to seeded deterministic init so the
  full pipeline stays runnable (shape/perf-wise) without the artifacts.
"""

from __future__ import annotations

import io
import os
from typing import Callable, Dict, Mapping, Optional

import numpy as np
import jax
import jax.numpy as jnp

_SEP = "/"


def _flatten(tree, prefix="") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        items = tree.items()
    elif isinstance(tree, (list, tuple)):
        items = ((str(i), v) for i, v in enumerate(tree))
    else:
        return {prefix: np.asarray(tree)}
    for k, v in items:
        key = f"{prefix}{_SEP}{k}" if prefix else str(k)
        out.update(_flatten(v, key))
    return out


def _unflatten(flat: Mapping[str, np.ndarray]):
    root: dict = {}
    for key, val in flat.items():
        parts = key.split(_SEP)
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(val)

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def save_params(path: str, params) -> None:
    flat = _flatten(jax.tree_util.tree_map(np.asarray, params))
    buf = io.BytesIO()
    np.savez(buf, **flat)
    with open(path, "wb") as f:
        f.write(buf.getvalue())


def load_params(path: str):
    with np.load(path) as z:
        return _unflatten({k: z[k] for k in z.files})


# ---------------------------------------------------------------------------
# PyTorch state-dict conversion
# ---------------------------------------------------------------------------


def convert_torch_state_dict(template, state_dict: Mapping[str, "np.ndarray"]):
    """Convert a PyTorch state_dict into a params tree shaped like ``template``.

    ``template`` is a params tree from one of the ``init_*`` functions; its
    structure defines the name mapping (dict keys / list indices become the
    dotted torch module path).  ``state_dict`` values may be torch tensors or
    numpy arrays.  Raises KeyError on any missing torch entry and ValueError
    on shape mismatch.
    """

    def to_np(v):
        if hasattr(v, "detach"):
            v = v.detach().cpu().numpy()
        return np.asarray(v, dtype=np.float32)

    def fetch(name):
        if name not in state_dict:
            raise KeyError(f"missing key in torch state_dict: {name}")
        return to_np(state_dict[name])

    def check(arr, like, name):
        if arr.shape != like.shape:
            raise ValueError(
                f"{name}: converted shape {arr.shape} != template {like.shape}"
            )
        return jnp.asarray(arr)

    def walk(node, prefix):
        if isinstance(node, (list, tuple)):
            return [walk(v, f"{prefix}.{i}" if prefix else str(i)) for i, v in enumerate(node)]
        assert isinstance(node, dict)
        keys = set(node.keys())
        if keys <= {"w", "b"}:
            w = fetch(f"{prefix}.weight")
            if node["w"].ndim == 4:  # conv OIHW -> HWIO
                w = w.transpose(2, 3, 1, 0)
            else:  # dense (out, in) -> (in, out)
                w = w.transpose(1, 0)
            out = {"w": check(w, node["w"], prefix)}
            if "b" in keys:
                out["b"] = check(fetch(f"{prefix}.bias"), node["b"], prefix)
            return out
        if keys == {"gamma", "beta", "mean", "var"}:
            return {
                "gamma": check(fetch(f"{prefix}.weight"), node["gamma"], prefix),
                "beta": check(fetch(f"{prefix}.bias"), node["beta"], prefix),
                "mean": check(fetch(f"{prefix}.running_mean"), node["mean"], prefix),
                "var": check(fetch(f"{prefix}.running_var"), node["var"], prefix),
            }
        if keys == {"alpha"}:
            return {"alpha": check(fetch(f"{prefix}.weight"), node["alpha"], prefix)}
        return {
            k: walk(v, f"{prefix}.{k}" if prefix else k) for k, v in node.items()
        }

    return walk(template, "")


# ---------------------------------------------------------------------------
# Batchnorm folding (inference optimization)
# ---------------------------------------------------------------------------


def fold_batchnorm(params, eps: float = 1e-3):
    """Fold inference batchnorms into their preceding convolutions.

    Walks the tree for the BasicConv2d pattern — a dict holding a bias-less
    ``conv`` and a ``bn`` — and rewrites it to an equivalent conv with bias
    plus an identity bn (so the apply functions are unchanged):
        w' = w * gamma / sqrt(var + eps)       (per output channel)
        b' = beta - mean * gamma / sqrt(var + eps)
    Numerically equivalent within float rounding (tested).  NOTE: measured
    on TPU v5e this is a slight PESSIMIZATION (XLA already fuses the bn
    scale/shift into the conv epilogue; folding adds ~100 bias tensors of
    HBM traffic) — kept as a utility for CPU/export paths, deliberately not
    wired into the Detector.
    """
    import numpy as _np

    def walk(node):
        if isinstance(node, (list, tuple)):
            return [walk(v) for v in node]
        if not isinstance(node, dict):
            return node
        if (
            set(node.keys()) >= {"conv", "bn"}
            and isinstance(node["conv"], dict)
            and "b" not in node["conv"]
            and set(node["bn"].keys()) == {"gamma", "beta", "mean", "var"}
        ):
            conv, bn = node["conv"], node["bn"]
            scale = _np.asarray(bn["gamma"]) / _np.sqrt(
                _np.asarray(bn["var"]) + eps
            )
            w = _np.asarray(conv["w"]) * scale  # HWIO: broadcast over O
            b = _np.asarray(bn["beta"]) - _np.asarray(bn["mean"]) * scale
            identity_bn = {
                "gamma": jnp.ones_like(bn["gamma"]),
                "beta": jnp.zeros_like(bn["beta"]),
                "mean": jnp.zeros_like(bn["mean"]),
                # var + eps == 1 so the identity bn is an exact no-op
                "var": jnp.ones_like(bn["var"]) - eps,
            }
            out = dict(node)
            out["conv"] = {"w": jnp.asarray(w, jnp.float32),
                           "b": jnp.asarray(b, jnp.float32)}
            out["bn"] = identity_bn
            return out
        return {k: walk(v) for k, v in node.items()}

    return walk(params)


# ---------------------------------------------------------------------------
# Named weight loading with deterministic fallback
# ---------------------------------------------------------------------------

WEIGHTS_ENV = "TRUELY_TPU_WEIGHTS"
_SEEDS = {"pnet": 101, "rnet": 102, "onet": 103, "facenet": 104, "landmark68": 105}
_INIT_CACHE: Dict[str, object] = {}


def load_or_init(
    name: str,
    init_fn: Callable,
    weights_dir: Optional[str] = None,
):
    """Load ``<weights_dir>/<name>.npz`` if present, else seeded init.

    Returns (params, loaded: bool).  The fallback keeps the whole pipeline
    runnable (shape/perf-wise) without the artifacts (this build environment
    has no network access to fetch the upstream facenet_pytorch artifacts —
    see BASELINE.md).  Seeded inits are cached per process (the param arrays
    are immutable, so sharing across Detector instances is safe) — the IRv1
    init is seconds of host RNG otherwise.
    """
    weights_dir = weights_dir or os.environ.get(WEIGHTS_ENV, "")
    if weights_dir:
        path = os.path.join(weights_dir, f"{name}.npz")
        if os.path.exists(path):
            return load_params(path), True
    if name not in _INIT_CACHE:
        seed = _SEEDS.get(name, abs(hash(name)) % (2**31))
        _INIT_CACHE[name] = init_fn(jax.random.PRNGKey(seed))
    return _INIT_CACHE[name], False
