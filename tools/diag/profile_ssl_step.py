import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..', '..'))
import os, time
import jax, jax.numpy as jnp, numpy as np
from msfwsi_tpu.data.pipeline import AugConfig
from msfwsi_tpu.train import ssl as S

B = int(os.environ.get("B", "16"))
_rs = os.environ.get("RS", "")
config = S.SSLConfig(arch=os.environ.get("ARCH","resnet50"), scale=4, img_size=224,
                     batch_size=B, amp=True, use_ac=os.environ.get("AC","1")=="1",
                     inter_opt=os.environ.get("IOPT","adafactor"),
                     inter_dtype=os.environ.get("IDT","bfloat16"),
                     remat_stages=tuple(int(c) for c in _rs) if _rs else None)
aug_cfg = AugConfig(compute_dtype="bfloat16")
rng = np.random.default_rng(0)
tiles = jnp.asarray(rng.integers(0, 255, size=(B, 1024, 1024, 3), dtype=np.uint8))
state = S.create_ssl_state(jax.random.key(0), config)
step = S.make_jitted_fused_step(config, aug_cfg, donate=True)
for i in range(2):
    state, m = step(state, tiles, jax.random.fold_in(jax.random.key(1), i))
print("warm loss", float(m["loss"]))
t0 = time.perf_counter()
N = 10
for i in range(N):
    state, m = step(state, tiles, jax.random.fold_in(jax.random.key(3), i))
print("timed loss", float(m["loss"]), "ms/step", (time.perf_counter()-t0)/N*1000)
jax.profiler.start_trace(os.environ.get("TRACE_DIR", "/tmp/r50b_trace"))
for i in range(3):
    state, m = step(state, tiles, jax.random.fold_in(jax.random.key(2), i))
print("prof loss", float(m["loss"]))
jax.profiler.stop_trace()
print("done")
