import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..', '..'))
import time
import jax, jax.numpy as jnp, numpy as np
from msfwsi_tpu.ops import augment as A
from msfwsi_tpu.data.pipeline import AugConfig, make_ssl_views

rng = np.random.default_rng(0)
B = 32
views = jnp.asarray(rng.normal(size=(2 * B * 17, 224, 224, 3)), jnp.bfloat16)
tiles = jnp.asarray(rng.integers(0, 255, size=(B, 1024, 1024, 3), dtype=np.uint8))
tiles_bf = jnp.asarray(rng.normal(size=(B, 1024, 1024, 3)), jnp.bfloat16)
tilearr = jnp.asarray(rng.normal(size=(2*B*16, 256, 256, 3)), jnp.bfloat16)
aug_cfg = AugConfig(compute_dtype="bfloat16")

def timeit(name, fn, *args, n=20):
    out = fn(*args)
    s = out if isinstance(out, jax.Array) else out[0]
    float(jnp.sum(s.astype(jnp.float32)))
    t0 = time.perf_counter()
    for i in range(n):
        out = fn(*args)
    s = out if isinstance(out, jax.Array) else out[0]
    float(jnp.sum(s.astype(jnp.float32)))
    print(f"{name:28s} {(time.perf_counter()-t0)/n*1000:7.2f} ms", flush=True)

k = jax.random.key(0)
timeit("full make_ssl_views", jax.jit(lambda k, t: make_ssl_views(k, t, aug_cfg)["context1"]), k, tiles)
timeit("color_jitter(fused)", jax.jit(lambda k, v: A.color_jitter(k, v)), k, views)
timeit("to_gray", jax.jit(lambda k, v: A.to_gray(k, v)), k, views)
timeit("blur_or_sharpen", jax.jit(lambda k, v: A.blur_or_sharpen(k, v)), k, views)
timeit("hflip", jax.jit(lambda k, v: A.hflip(k, v)), k, views)
timeit("normalize", jax.jit(lambda v: A.normalize(v, (.5,.5,.5), (.2,.2,.2))), views)
timeit("rrc 1024->224 ctx", jax.jit(lambda k, t: A.random_resized_crop(k, t, 224, use_mxu=True)), k, tiles_bf)
timeit("rrc 256->224 tiles", jax.jit(lambda k, t: A.random_resized_crop(k, t, 224, use_mxu=True)), k, tilearr)
