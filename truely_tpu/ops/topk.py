"""Exact large-N top-k for the stage-1 candidate selection.

``jax.lax.top_k`` over the cascade's global cell scores — (B, ~1.5M) at
1080p (pipeline/mtcnn._stage1, replacing the dynamic per-scale candidate
lists of the upstream detect_face flow reached from reference
server/model.py:47) — lowers to a sort-heavy XLA TopK that costs ~68 ms at
batch 64 on a v5e, roughly half the whole frame step.  This module computes
the same result (bit-exact, including index tie-breaks) in ~7 ms by
shrinking the sort problem with a reduction-shaped prefilter:

1. split the row into chunks of ``chunk`` cells and take each chunk's max
   (a cheap VPU reduction over the full array);
2. exact top-k over the ~N/chunk chunk maxima picks the only chunks that
   can contain global top-k cells;
3. gather those k chunks (ascending chunk id) and run the exact top-k over
   the k*chunk survivors.

Tie-exactness: ``lax.top_k`` breaks value ties by lower index.  If a cell's
chunk is not selected, k chunk-maxima outrank that chunk's max — strictly
greater, or equal with a lower chunk id and therefore a lower global index —
so at least k cells outrank the cell globally and it cannot be in the true
top-k.  Gathering the selected chunks in ascending id order makes positions
in the gathered array ascend with global index, so the final top-k breaks
ties exactly like the global one.  Verified bit-equal on random and heavily
tied inputs (tests/test_topk.py).

The two inner ``top_k`` calls (over the ~N/chunk chunk maxima and over the
k*chunk gathered survivors — both (B, 32768) at the production 1080p b128
shape, 2.4 + 1.2 ms of pure sort in the step trace) are themselves
large-N top-k problems, so they RECURSE through the same prefilter with a
size-appropriate chunk until the sort is small (~3.6 ms faster at the
production shape, scripts/probes/probe_topk2.py).  Exactness is preserved
by induction: each recursion level is bit-equal to the ``lax.top_k`` it
replaces.

Platform scope of the tie claim: the index tie-break argument assumes the
platform's ``lax.top_k`` is itself stable (lowest index wins).  That holds
on CPU — where every parity/golden gate runs — and is pinned by
tests/test_topk.py.  On this TPU backend ``lax.top_k``'s own lowering was
observed to break a value tie by the HIGHER index (probe_topk2.py:
returned values identical, one 2-way tie resolved differently), so on TPU
tie ORDER among equal scores follows the platform op and is not
guaranteed reproducible — true of the non-recursive version too, and
immaterial downstream (ties only reorder equal-scored candidates entering
the masked NMS).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def exact_topk_lastdim(
    p: jnp.ndarray, k: int, *, chunk: int = 128
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact (values, indices) top-k over the last axis of (B, N) scores.

    Bit-identical to ``jax.lax.top_k(p, k)`` (ties included) at a fraction
    of the cost for large N.  Falls back to ``lax.top_k`` when the chunked
    formulation cannot win (small N or too few chunks).
    """
    b, n = p.shape
    nc = n // chunk
    if k >= n or nc <= k or n < 4 * chunk:
        return jax.lax.top_k(p, min(k, n))

    pad = nc * chunk
    pc = p[:, :pad].reshape(b, nc, chunk)
    cmax = pc.max(axis=2)                              # (B, nc)
    _, cid = _topk_shrink(cmax, k)                     # ties -> lowest id
    cid = jnp.sort(cid, axis=1)                        # ascending global order
    rows = jnp.take_along_axis(pc, cid[:, :, None], axis=1)   # (B, k, chunk)
    flat = rows.reshape(b, k * chunk)
    base = (
        cid[:, :, None] * chunk
        + jnp.arange(chunk, dtype=jnp.int32)[None, None, :]
    )
    idx_map = base.reshape(b, k * chunk)
    if pad < n:  # remainder cells compete raw (they have no chunk max)
        flat = jnp.concatenate([flat, p[:, pad:]], axis=1)
        idx_map = jnp.concatenate(
            [
                idx_map,
                jnp.broadcast_to(
                    jnp.arange(pad, n, dtype=jnp.int32), (b, n - pad)
                ),
            ],
            axis=1,
        )
    vals, i2 = _topk_shrink(flat, k)
    return vals, jnp.take_along_axis(idx_map, i2, axis=1)


def _topk_shrink(p: jnp.ndarray, k: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k that recurses through the chunk-max prefilter with a
    size-appropriate chunk when that still shrinks the sort, else falls
    back to ``lax.top_k``."""
    n = p.shape[1]
    chunk = max(8, min(128, n // (16 * max(k, 1))))
    if k >= n or n // chunk <= k or n < 4 * chunk:
        return jax.lax.top_k(p, min(k, n))
    return exact_topk_lastdim(p, k, chunk=chunk)
