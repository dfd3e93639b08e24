"""Jigsaw un/shuffle: take_along_axis gather vs one-hot MXU permutation."""
import time
import jax, jax.numpy as jnp, numpy as np

rng = np.random.default_rng(0)
B, K, S = 32, 16, 224
views = jnp.asarray(rng.normal(size=(B, K, S, S, 3)), jnp.bfloat16)
perm = jnp.asarray(np.stack([rng.permutation(K) for _ in range(B)]))

def timeit(name, fn, *args, n=30):
    out = fn(*args); float(jnp.sum(out.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(n): out = fn(*args)
    float(jnp.sum(out.astype(jnp.float32)))
    print(f"{name:22s} {(time.perf_counter()-t0)/n*1000:7.2f} ms", flush=True)

@jax.jit
def gather(v, p):
    return jnp.take_along_axis(v, p[:, :, None, None, None], axis=1)

@jax.jit
def onehot_mxu(v, p):
    # out[b,i] = v[b, p[b,i]] == sum_j onehot[b,i,j] * v[b,j]
    oh = (p[:, :, None] == jnp.arange(v.shape[1])[None, None, :]).astype(v.dtype)
    flat = v.reshape(v.shape[0], v.shape[1], -1)
    out = jnp.einsum("bij,bjf->bif", oh, flat, preferred_element_type=v.dtype)
    return out.reshape(v.shape)

a = gather(views, perm); b = onehot_mxu(views, perm)
print("equal:", bool(jnp.all(a == b)))
timeit("take_along_axis", gather, views, perm)
timeit("onehot einsum", onehot_mxu, views, perm)
