"""Width-folding: pack F adjacent pixels into channels so small-channel
convs land on MXU-shaped contractions.

The P-Net trunk's 3/10/16/32-channel activations tile terribly on TPU (the
channel dim pads toward 128 lanes; see PERFORMANCE.md finding 6), and XLA's
own lowering of the small-channel convs runs at 1-3% MXU utilization.
Folding the WIDTH axis by F=4 into channels turns the cascade into convs
with 12->40, 40->64 and 64->128 channels — shapes XLA lowers onto the MXU
at real utilization — at the cost of a (F + kw - 1)/kw FLOP inflation from
the banded folded kernels (2.67x for 3-tap convs, a trade that wins ~3x on
this hardware).

This differs from the shelved space-to-depth probe (scripts/probes/
probe_packed.py) in two ways that turned its ~0% into a win: only the width
axis folds (H stays spatial), and the 2x2 ceil-pool runs IN the folded
layout (phase-pair max + block-pair concat) so no unfold/refold relayout
ever touches a frame-sized tensor.

Index convention ("phase-major"): folded block bx holds original pixels
``bx*F + p`` for p in 0..F-1, laid out as channels ``p*C + c``.  A folded
output therefore flattens back to pixel order with a plain reshape: slot
``bx*F + p`` IS the pixel index, which keeps the cascade's flat-cell
decode arithmetic unchanged.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def fold_width(x: jnp.ndarray, fold: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, H, ceil(W/fold), fold*C), zero-padded on W.

    Phase-major: output channel p*C + c holds pixel bx*fold + p, channel c.
    """
    b, h, w, c = x.shape
    pad = (-w) % fold
    if pad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad), (0, 0)))
    return x.reshape(b, h, (w + pad) // fold, fold * c)


def fold_conv_weights(
    w: jnp.ndarray, b: jnp.ndarray, fold: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fold (kh, kw, cin, cout) HWIO conv weights for folded-width inputs.

    Output kernel is (kh, kb, fold*cin, fold*cout) with
    kb = (fold - 1 + kw - 1)//fold + 1 blocks: output phase q at block bx
    reads input phase p of block bx+dx whenever t = dx*fold + p - q lies in
    [0, kw); the folded kernel is that banded scatter of the original taps
    (weights elsewhere are zero — the (fold + kw - 1)/kw FLOP inflation).
    """
    kh, kw, cin, cout = w.shape
    kb = (fold - 1 + kw - 1) // fold + 1
    wf = jnp.zeros((kh, kb, fold * cin, fold * cout), w.dtype)
    for q in range(fold):
        for t in range(kw):
            bx, p = divmod(q + t, fold)
            wf = wf.at[
                :, bx, p * cin : (p + 1) * cin, q * cout : (q + 1) * cout
            ].set(w[:, t])
    bf = jnp.tile(b, fold)
    return wf, bf


def fold_pointwise_weights(
    w: jnp.ndarray, b: jnp.ndarray, fold: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fold a 1x1 conv (1, 1, cin, cout): block-diagonal over phases."""
    cin, cout = w.shape[2], w.shape[3]
    wf = jnp.zeros((1, 1, fold * cin, fold * cout), w.dtype)
    for q in range(fold):
        wf = wf.at[
            :, :, q * cin : (q + 1) * cin, q * cout : (q + 1) * cout
        ].set(w[0, 0])
    return wf, jnp.tile(b, fold)


def pool_pair_perm(channels: int, fold: int):
    """Output-channel permutation putting folded channels in (i, j, c)
    order, where phase p = 2j + i: the two pool-pair members of pooled
    pixel j land in opposite HALVES, so the 2x2 pool's width max is
    ``maximum(h[..., :half], h[..., half:])`` — contiguous slices, no
    strided slicing (which lowers to gather while-loops on TPU) and no
    lane-regrouping reshape.

    Returns an index array ``perm`` such that ``folded[..., perm]`` maps
    phase-major (p, c) channels to (i, j, c) order.
    """
    import numpy as np

    perm = np.empty(fold * channels, np.int64)
    half = (fold // 2) * channels
    for p in range(fold):
        j, i = p // 2, p % 2
        src = slice(p * channels, (p + 1) * channels)
        perm[i * half + j * channels : i * half + (j + 1) * channels] = (
            np.arange(src.start, src.stop)
        )
    return perm


def tile_phase(v: jnp.ndarray, fold: int) -> jnp.ndarray:
    """Per-channel vector (C,) -> per-folded-channel (fold*C,)."""
    return jnp.tile(v, fold)


def phase_select(rows: jnp.ndarray, phase: jnp.ndarray, channels: int,
                 fold: int) -> jnp.ndarray:
    """Select each row's phase-q channel slice from folded feature rows.

    rows: (..., fold*channels); phase: (...) int32 in [0, fold).
    Returns (..., channels) with rows[..., q*channels:(q+1)*channels].
    """
    out = rows[..., 0:channels]
    for q in range(1, fold):
        sel = rows[..., q * channels : (q + 1) * channels]
        out = jnp.where((phase == q)[..., None], sel, out)
    return out
