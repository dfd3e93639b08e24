import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))
import time
import jax, jax.numpy as jnp, numpy as np

def timeit(label, fn, *args):
    @jax.jit
    def chain(*args):
        def body(c, _):
            out = fn(*args)
            return c + jnp.float32(out.ravel()[0]), None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=20)
        return c
    float(chain(*args))
    t0 = time.perf_counter(); float(chain(*args)); dt = (time.perf_counter()-t0)/20
    print(f"{label}: {dt*1e3:.3f} ms")

rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(size=(64,128,128,64)), jnp.bfloat16)
jax.block_until_ready(x)
timeit("copy (x+1)              ", lambda x: x + 1, x)
timeit("slice H stride2         ", lambda x: x[:, 0::2] + 1, x)
timeit("slice W stride2         ", lambda x: x[:, :, 0::2] + 1, x)
timeit("slice HW stride2        ", lambda x: x[:, 0::2, 0::2] + 1, x)
timeit("slice HW stride2 off1   ", lambda x: x[:, 1::2, 1::2] + 1, x)
timeit("3 W-taps max            ", lambda x: jnp.maximum(jnp.maximum(x[:,:,0:126:2], x[:,:,1:127:2]), x[:,:,2:128:2]), x)
timeit("repeat2 W on half       ", lambda x: jnp.repeat(x[:, :, :64], 2, axis=2), x)
timeit("d2s reshape (free?)     ", lambda x: x.reshape(64, 64, 2, 128, 64).reshape(64,64,2,64,2,64) + 1, x)
