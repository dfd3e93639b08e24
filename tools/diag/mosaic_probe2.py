import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

x = jnp.asarray(np.random.default_rng(0).normal(size=(8, 128, 130, 64)), jnp.bfloat16)

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
    except Exception as e:
        msg = str(e).split("\n")[0][:120]
        print(f"FAIL {label}: {msg}")

def k_sub_off1(i, o):
    o[...] = jnp.maximum(i[:, :, 0:128, :], i[:, :, 1:129, :])
try_one("unit-offset sublane slices max", k_sub_off1, (8, 128, 128, 64))

def k_sub_off2(i, o):
    o[...] = jnp.maximum(i[:, :, 0:128, :], i[:, :, 2:130, :])
try_one("offset-2 sublane slice max", k_sub_off2, (8, 128, 128, 64))

def k_roll(i, o):
    v = i[:, :, 0:128, :]
    o[...] = jnp.maximum(v, pltpu.roll(v, -1, 2))
try_one("pltpu.roll axis=2", k_roll, (8, 128, 128, 64))

def k_iota_sel(i, o):
    v = i[:, :, 0:128, :]
    w = jax.lax.broadcasted_iota(jnp.int32, v.shape, 2)
    o[...] = jnp.where((w % 2) == 0, v, -v)
try_one("parity iota select on sublane dim", k_iota_sel, (8, 128, 128, 64))

def k_h_shift(i, o):
    o[...] = jnp.maximum(i[:, 0:127, 0:128, :], i[:, 1:128, 0:128, :])
try_one("unit H (outer) shifts max", k_h_shift, (8, 127, 128, 64))

dy = jnp.asarray(np.random.default_rng(1).normal(size=(8, 64, 64, 64)), jnp.bfloat16)
def k_rep_both(i, o):
    v = pltpu.repeat(pltpu.repeat(i[...], 2, 1), 2, 2)
    o[...] = v
try_one("repeat H and W (outer+sublane)", k_rep_both, (8, 128, 128, 64), dy)

def k_int8(i, o):
    v = i[...]
    k = jnp.where(v > 0, jnp.int8(3), jnp.int8(1))
    o[...] = (k == 3).astype(jnp.bfloat16) * v
try_one("int8 compare/select", k_int8, (8, 128, 130, 64))
