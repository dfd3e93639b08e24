import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..', '..'))
import time
import jax, jax.numpy as jnp, numpy as np
from msfwsi_tpu.ops import augment as A

rng = np.random.default_rng(0)
def timeit(name, fn, *args, n=30):
    out = fn(*args); float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n): out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    print(f"{name:34s} {(time.perf_counter()-t0)/n*1000:7.2f} ms", flush=True)

for shape in [(64,224,224,3), (32,1024,1024,3)]:
    v = jnp.asarray(rng.normal(size=shape), jnp.bfloat16)
    k = jax.random.key(0)
    timeit(f"{shape} pallas", jax.jit(lambda k, v: A.blur_or_sharpen(k, v, use_pallas=True)), k, v)
    timeit(f"{shape} xla", jax.jit(lambda k, v: A.blur_or_sharpen(k, v, use_pallas=False)), k, v)
