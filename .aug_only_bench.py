import os, time, json
import jax, jax.numpy as jnp, numpy as np
from msfwsi_tpu.data.pipeline import AugConfig, make_ssl_views

B = int(os.environ.get("B", "16"))
rng = np.random.default_rng(0)
aug_cfg = AugConfig(compute_dtype="bfloat16")
src = 4 * aug_cfg.tile_px
tiles = jnp.asarray(rng.integers(0, 255, size=(B, src, src, 3), dtype=np.uint8))

@jax.jit
def aug(key, tiles):
    v = make_ssl_views(key, tiles, aug_cfg)
    # reduce to scalars to keep outputs tiny (sync via a cheap fetch)
    return {k: (jnp.sum(x.astype(jnp.float32)) if x.dtype != jnp.int32 else jnp.sum(x)) for k, x in v.items()}

out = aug(jax.random.key(0), tiles)
float(out["context1"])
t0 = time.perf_counter()
N = 30
for i in range(N):
    out = aug(jax.random.fold_in(jax.random.key(1), i), tiles)
s = float(out["context1"])
dt = time.perf_counter() - t0
print(json.dumps({"B": B, "ms_per_step": dt / N * 1000}))
