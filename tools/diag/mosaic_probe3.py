import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

x = jnp.asarray(np.random.default_rng(0).normal(size=(8, 128, 128, 64)), jnp.bfloat16)

def try_one(label, kernel, out_shape, inp=None):
    inp = x if inp is None else inp
    try:
        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.bfloat16),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        r = jax.jit(f)(inp)
        jax.block_until_ready(r)
        print(f"OK   {label}  -> {r.shape}")
        return True
    except Exception as e:
        msg = str(e).split("\n")[0][:120]
        print(f"FAIL {label}: {msg}")
        return False

def k_roll_pos(i, o):
    v = i[...]
    o[...] = jnp.maximum(v, pltpu.roll(v, 1, 2))
try_one("pltpu.roll +1 axis=2 (sublane)", k_roll_pos, x.shape)

def k_roll127(i, o):
    v = i[...]
    o[...] = jnp.maximum(v, pltpu.roll(v, 127, 2))   # == shift -1
try_one("pltpu.roll +127 axis=2 (== -1)", k_roll127, x.shape)

def k_roll_h(i, o):
    v = i[...]
    o[...] = jnp.maximum(v, pltpu.roll(v, 1, 1))
try_one("pltpu.roll +1 axis=1 (outer)", k_roll_h, x.shape)

def k_i32(i, o):
    v = i[...]
    k = jnp.where(v > 0, jnp.int32(3), jnp.int32(1))
    o[...] = (k == 3).astype(jnp.bfloat16) * v
try_one("int32 compare/select", k_i32, x.shape)

# correctness of roll semantics
def k_roll_chk(i, o):
    v = i[...]
    o[...] = pltpu.roll(v, 1, 2)
ok = try_one("roll semantics kernel", k_roll_chk, x.shape)
if ok:
    f = pl.pallas_call(k_roll_chk, out_shape=jax.ShapeDtypeStruct(x.shape, jnp.bfloat16),
                       in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                       out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))
    r = jax.jit(f)(x)
    print("roll(+1,axis2) == np.roll +1?", bool(jnp.all(r == jnp.roll(x, 1, 2))))
