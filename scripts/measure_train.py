"""Honest training-step timing (state chained, scalar loss fetched)."""
import sys, time
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

from truely_tpu.parallel.train import Batch, make_train_step
from truely_tpu.models import (
    init_inception_resnet_v1, init_landmark68,
)

rng = np.random.default_rng(0)
B = 64
crops = rng.uniform(0, 1, (B, 80, 80, 3)).astype(np.float32)
lmks = rng.uniform(0, 1, (B, 68, 2)).astype(np.float32)
batch = Batch(
    crops_a=jnp.asarray(crops),
    crops_b=jnp.asarray(crops[:, :, ::-1]),
    landmarks=jnp.asarray(lmks),
)
key = jax.random.PRNGKey(0)
params = {
    "facenet": init_inception_resnet_v1(key),
    "landmark": init_landmark68(jax.random.PRNGKey(1)),
}
init_fn, step_fn = make_train_step()
state = init_fn(params)

def chain(n, state):
    t0 = time.perf_counter()
    for _ in range(n):
        state, metrics = step_fn(state, batch)
    float(metrics["loss"])
    return time.perf_counter() - t0, state

_, state = chain(1, state)
_, state = chain(1, state)
times = []
for _ in range(3):
    t_hi, state = chain(7, state)
    t_lo, state = chain(2, state)
    times.append((t_hi - t_lo) / 5)
dt = min(times)
print(f"train step (b{B}, landmark+NT-Xent through IRv1 fwd+bwd): {dt*1000:.2f} ms "
      f"({B/dt:.0f} crops/sec)")
