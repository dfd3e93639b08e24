import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))
import functools, time
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

x = jnp.asarray(np.random.default_rng(0).normal(size=(8, 128, 128, 64)), jnp.bfloat16)

def try_one(label, kernel, out_shape):
    try:
        f = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.bfloat16),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        r = jax.jit(f)(x)
        jax.block_until_ready(r)
        print(f"OK   {label}  -> {r.shape}")
    except Exception as e:
        msg = str(e).split("\n")[0][:150]
        print(f"FAIL {label}: {msg}")

def k_stride_sublane(i, o):
    o[...] = i[:, :, 0:127:2, :]
try_one("stride-2 sublane slice", k_stride_sublane, (8, 128, 64, 64))

def k_stride_h(i, o):
    o[...] = i[:, 0:127:2, :, :]
try_one("stride-2 outer (H) slice", k_stride_h, (8, 64, 128, 64))

def k_lane_half(i, o):
    v = i[...]
    o[...] = v[..., 0:32]
try_one("lane slice [0:32] of 64", k_lane_half, (8, 128, 128, 32))

def k_reshape_pack(i, o):
    v = i[...]
    o[...] = v.reshape(8, 128, 64, 128)
try_one("in-kernel reshape (W,C)->(W/2,2C)", k_reshape_pack, (8, 128, 64, 128))

def k_reshape_rows(i, o):
    v = i[...]
    o[...] = v.reshape(8, 64, 2, 128, 64)[:, :, 0]
try_one("in-kernel reshape H->(H/2,2) + pick", k_reshape_rows, (8, 64, 128, 64))

def k_repeat(i, o):
    v = i[:, :, 0:64, :]
    o[...] = pltpu.repeat(v, 2, 2)
try_one("pltpu.repeat axis=2(sublane)", k_repeat, (8, 128, 128, 64))

def k_jnp_repeat(i, o):
    v = i[:, :, 0:64, :]
    o[...] = jnp.repeat(v, 2, axis=2)
try_one("jnp.repeat axis=2(sublane)", k_jnp_repeat, (8, 128, 128, 64))

def k_strided_store(i, o):
    o[:, :, 0:127:2, :] = i[:, :, 0:64, :]
    o[:, :, 1:128:2, :] = i[:, :, 64:128, :]
try_one("strided sublane STORE", k_strided_store, (8, 128, 128, 64))
