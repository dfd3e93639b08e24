"""Profile the fused finetune (HookNet seg) train step on the real TPU.

Env knobs: ARCH (resnet18), B (16), AC (0), TRACE_DIR (/tmp/ft_trace),
STEPS (10). Prints ms/step and pairs/s; writes a jax.profiler trace for
parse_xplane.py / top_ops.py.
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..', '..'))
import time
import jax, jax.numpy as jnp, numpy as np
from msfwsi_tpu.data.pipeline import AugConfig
from msfwsi_tpu.train import finetune as F

B = int(os.environ.get("B", "16"))
config = F.FinetuneConfig(arch=os.environ.get("ARCH", "resnet18"), batch_size=B,
                          amp=True, use_ac=os.environ.get("AC", "0") == "1",
                          packed_tail=os.environ.get("PACKED", "0") == "1",
                          packed_logits=os.environ.get("PACKED", "0") == "1")
aug_cfg = AugConfig(compute_dtype="bfloat16")
rng = np.random.default_rng(0)
imgs = jnp.asarray(rng.integers(0, 255, size=(B, 1024, 1024, 3), dtype=np.uint8))
masks = jnp.asarray(rng.integers(0, 5, size=(B, 1024, 1024), dtype=np.int32))
state = F.create_finetune_state(jax.random.key(0), config, local_batch=B)
step = F.make_jitted_fused_finetune_step(config, aug_cfg, donate=os.environ.get("DONATE", "1") == "1")
for i in range(2):
    state, m = step(state, imgs, masks, jax.random.fold_in(jax.random.key(1), i))
print("warm loss", float(m["loss"]))
N = int(os.environ.get("STEPS", "10"))
t0 = time.perf_counter()
for i in range(N):
    state, m = step(state, imgs, masks, jax.random.fold_in(jax.random.key(3), i))
loss = float(m["loss"])  # device-side scalar sync (block_until_ready lies on axon)
ms = (time.perf_counter() - t0) / N * 1000
print("timed loss", loss, "ms/step", ms, "pairs/s", B / ms * 1000)
jax.profiler.start_trace(os.environ.get("TRACE_DIR", "/tmp/ft_trace"))
for i in range(3):
    state, m = step(state, imgs, masks, jax.random.fold_in(jax.random.key(2), i))
print("prof loss", float(m["loss"]))
jax.profiler.stop_trace()
print("done")
