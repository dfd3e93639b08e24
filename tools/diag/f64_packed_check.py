import sys, os
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import numpy as np, jax.numpy as jnp
from msfwsi_tpu.models.hooknet import HookNet

SEG=64
kw = dict(arch="resnet18", classes=4, dtype=jnp.float64)
plain, packed = HookNet(**kw), HookNet(packed_tail=True, **kw)
x = jnp.zeros((2,SEG,SEG,3), jnp.float64)
v = plain.init(jax.random.key(0), x, x, train=True)
v = jax.tree_util.tree_map(lambda a: a.astype(jnp.float64), v)
rng = np.random.default_rng(2)
x1 = jnp.asarray(rng.normal(size=(2,SEG,SEG,3)))
x2 = jnp.asarray(rng.normal(size=(2,SEG,SEG,3)))

def loss(model, params):
    out, _ = model.apply({"params": params, "batch_stats": v["batch_stats"]},
                         x1, x2, train=True, mutable=["batch_stats"])
    return sum(jnp.mean(o * (1.0 + jnp.arange(o.shape[-1]))) for o in out)

ga = jax.jit(jax.grad(lambda p: loss(plain, p)))(v["params"])
gb = jax.jit(jax.grad(lambda p: loss(packed, p)))(v["params"])
gbd = dict(jax.tree_util.tree_leaves_with_path(gb))
worst = (None, 0.0)
for (p, a) in jax.tree_util.tree_leaves_with_path(ga):
    b = gbd[p]
    r = float(np.linalg.norm(np.asarray(b)-np.asarray(a)) / (1e-12+np.linalg.norm(np.asarray(a))))
    if r > worst[1]: worst = (jax.tree_util.keystr(p), r)
print("worst relative L2 grad diff in f64:", worst)
