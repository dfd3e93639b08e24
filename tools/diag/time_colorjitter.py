"""ColorJitter cost at pipeline shapes (fused vs sequential)."""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..', '..'))
import time
import jax, jax.numpy as jnp, numpy as np
from msfwsi_tpu.ops import augment as A

rng = np.random.default_rng(0)
def timeit(name, fn, *args, n=20):
    out = fn(*args); float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n): out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    print(f"{name:30s} {(time.perf_counter()-t0)/n*1000:7.2f} ms", flush=True)

k = jax.random.key(0)
for shape in [(32, 1024, 1024, 3), (64, 224, 224, 3)]:
    v = jnp.asarray(rng.normal(size=shape), jnp.bfloat16)
    timeit(f"{shape} fused", jax.jit(lambda k, v: A.color_jitter(k, v)), k, v)
    timeit(f"{shape} hue only", jax.jit(lambda v: A._apply_hue(v, jnp.full((shape[0],1,1), 0.05, v.dtype))), v)
    timeit(f"{shape} gray", jax.jit(lambda k, v: A.to_gray(k, v)), k, v)
