"""Profile the HookNet chunked slide-inference path (eval mode, on-device
confusion stats) on the real TPU. Env: ARCH (resnet18), CHUNK (128),
TRACE_DIR (/tmp/infer_trace), STEPS (10).
"""
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..', '..'))
import time
import jax, jax.numpy as jnp, numpy as np
from msfwsi_tpu.train import evaluate as EV
from msfwsi_tpu.train import finetune as F

chunk = int(os.environ.get("CHUNK", "128"))
config = F.FinetuneConfig(arch=os.environ.get("ARCH", "resnet18"), batch_size=chunk, amp=True)
state = F.create_finetune_state(jax.random.key(0), config, local_batch=2)
variables = {"params": state.params, "batch_stats": state.batch_stats}
C = len(config.class_names)
rng = np.random.default_rng(0)
ctx = jnp.asarray(rng.normal(size=(chunk, 256, 256, 3)), jnp.float32)
tgt = jnp.asarray(rng.normal(size=(chunk, 256, 256, 3)), jnp.float32)
masks = jnp.asarray(rng.integers(0, C + 1, size=(chunk, 256, 256)), jnp.int32)
fwd = EV.make_chunk_stats(state.model, C, chunk=chunk)
acc = jnp.zeros((4, C), jnp.int32)
for _ in range(2):
    acc = fwd(variables, ctx, tgt, masks, acc)
int(acc[0, 0])
N = int(os.environ.get("STEPS", "10"))
t0 = time.perf_counter()
for _ in range(N):
    acc = fwd(variables, ctx, tgt, masks, acc)
int(acc[0, 0])
ms = (time.perf_counter() - t0) / N * 1000
print("ms/chunk", ms, "tiles/s", chunk / ms * 1000)
jax.profiler.start_trace(os.environ.get("TRACE_DIR", "/tmp/infer_trace"))
for _ in range(3):
    acc = fwd(variables, ctx, tgt, masks, acc)
int(acc[0, 0])
jax.profiler.stop_trace()
print("done")
