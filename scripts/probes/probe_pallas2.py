"""Round-2 Mosaic probes for the flat (C, W*B) P-Net megakernel layout.

Layout: activations as 2D (channels, W*128) bf16 — batch is the minor
128-lane block of each pixel, so an x-shift is a TILE-ALIGNED lane slice.

  A3: raw 2D dot rate at conv shapes, rhs pre-flat: (M,K)x(K, N=512*128).
  F : im2col build (90 sublane-row copies with 128-aligned lane offsets)
      + dot, per conv2-row realistic.
  G : conv1 s2d variant: 48 copies from even/odd inputs + (40,48) dot +
      phase-max + prelu.
  H : fori_loop over rows with dynamic-ref indexing (ring emulation).
"""
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B = 128
DT = jnp.bfloat16
XT = 512                # pixels per strip
N = XT * B              # flat lane count


def timeit(name, jf, *args, reps=1):
    try:
        jax.block_until_ready(jf(*args))
    except Exception as e:  # noqa
        msg = str(e).replace("\n", " ")[:400]
        print(f"{name}: FAIL {type(e).__name__}: {msg}", flush=True)
        return None

    def chain(n):
        t0 = time.perf_counter()
        s = jnp.float32(0)
        a = args
        for _ in range(n):
            out = jf(*a)
            first = out[0] if isinstance(out, tuple) else out
            s = first[(0,) * first.ndim].astype(jnp.float32)
            a = (args[0] + s.astype(args[0].dtype) * 0,) + args[1:]
        float(s)
        return time.perf_counter() - t0

    chain(1)
    per = min((chain(5) - chain(2)) / 3 for _ in range(3)) / reps
    print(f"{name}: {per*1e6:9.1f} us/rep", flush=True)
    return per


rng = np.random.default_rng(0)
R = 32

# ---- A3: flat 2D dot, in-kernel xR ---------------------------------------
def mk_dotflat(M, K):
    w = jnp.asarray(rng.normal(size=(M, K)), DT)
    x = jnp.asarray(rng.normal(size=(K, N)), DT)

    def kern(x_ref, w_ref, o_ref):
        acc = jnp.zeros((M, N), jnp.float32)
        for _ in range(R):
            acc += jnp.dot(w_ref[:], x_ref[:],
                           preferred_element_type=jnp.float32)
        o_ref[:] = acc.astype(DT)

    def f(x, w):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((M, N), DT),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x, w)

    return jax.jit(f), x, w


# ---- F: im2col copies + dot (conv2-row) ----------------------------------
K2 = 90
pooled = jnp.asarray(rng.normal(size=(10, N + 4 * B)), DT)  # 3 rows' worth
w2 = jnp.asarray(rng.normal(size=(16, K2)), DT)


def kern_f(p_ref, w_ref, o_ref, a_ref):
    acc = jnp.zeros((16, N), jnp.float32)
    for _ in range(R):
        k = 0
        for c in range(10):
            for kx in range(3):
                a_ref[k, :] = p_ref[c, kx * B:kx * B + N]
                k += 1
        for c in range(10):          # fake rows for ky=1,2 (same source)
            for kx in range(3):
                a_ref[k, :] = p_ref[c, kx * B:kx * B + N]
                k += 1
                a_ref[k, :] = p_ref[c, kx * B:kx * B + N]
                k += 1
        acc += jnp.dot(w_ref[:], a_ref[:],
                       preferred_element_type=jnp.float32)
    o_ref[:] = acc.astype(DT)


def f_f(p, w):
    return pl.pallas_call(
        kern_f,
        out_shape=jax.ShapeDtypeStruct((16, N), DT),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((K2, N), DT)],
    )(p, w)


# ---- G: conv1 s2d row: 48 copies + dot + phase-max + prelu ---------------
xe = jnp.asarray(rng.normal(size=(3, 4, N + 2 * B)), DT)   # even cols, 4 rows
xo = jnp.asarray(rng.normal(size=(3, 4, N + 2 * B)), DT)   # odd cols
w1 = jnp.asarray(rng.normal(size=(40, 48)), DT)
alpha = jnp.asarray(rng.normal(size=(10, 1)), jnp.float32)


def kern_g(xe_ref, xo_ref, w_ref, al_ref, o_ref, a_ref):
    acc = jnp.zeros((10, N), jnp.float32)
    for _ in range(R):
        k = 0
        for c in range(3):
            for wy in range(4):
                for wx in range(4):
                    par, off = wx % 2, wx // 2
                    src = xe_ref if par == 0 else xo_ref
                    a_ref[k, :] = src[c, wy, off * B:off * B + N]
                    k += 1
        h = jnp.dot(w_ref[:], a_ref[:], preferred_element_type=jnp.float32)
        h = jnp.maximum(jnp.maximum(h[0:10], h[10:20]),
                        jnp.maximum(h[20:30], h[30:40]))
        acc += jnp.where(h > 0, h, al_ref[:] * h)
    o_ref[:] = acc.astype(DT)


def f_g(xe, xo, w, al):
    return pl.pallas_call(
        kern_g,
        out_shape=jax.ShapeDtypeStruct((10, N), DT),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((48, N), DT)],
    )(xe, xo, w, al)


# ---- H: dynamic ring indexing inside fori_loop ---------------------------
def kern_h(p_ref, o_ref, ring_ref):
    def body(i, acc):
        ring_ref[jax.lax.rem(i, 3)] = p_ref[jax.lax.rem(i, 8), 0:N]
        return acc + ring_ref[jax.lax.rem(i + 1, 3), 0]

    acc = jax.lax.fori_loop(0, R, body, jnp.float32(0.0))
    o_ref[0, 0] = acc


def f_h(p):
    return pl.pallas_call(
        kern_h,
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[pltpu.VMEM((3, N), jnp.float32)],
    )(p)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    for (m, k) in [(16, 90), (32, 144), (40, 48), (6, 32), (128, 128)]:
        jf, x, w = mk_dotflat(m, k)
        t = timeit(f"A3 dot ({m},{k})x({k},{N})", jf, x, w, reps=R)
        if t:
            print(f"    -> {m*k*N/t/1e12:.1f} real TMAC/s, "
                  f"{N/ t/1e9:.1f} Gcol/s", flush=True)
    t = timeit("F  conv2-row im2col(90 cp)+dot", jax.jit(f_f), pooled, w2,
               reps=R)
    t = timeit("G  conv1-row s2d(48 cp)+dot+max+prelu", jax.jit(f_g),
               xe, xo, w1, alpha, reps=R)
    timeit("H  fori ring dynamic idx", jax.jit(f_h),
           jnp.asarray(rng.normal(size=(8, N + B)), jnp.float32), reps=R)
