import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), '..', '..'))
import jax, jax.numpy as jnp, numpy as np
from msfwsi_tpu.data.pipeline import AugConfig
from msfwsi_tpu.train import finetune as F

B = 32
config = F.FinetuneConfig(arch="resnet18", batch_size=B, amp=True,
                          packed_tail=True, packed_logits=True)
aug_cfg = AugConfig(compute_dtype="bfloat16")
rng = np.random.default_rng(0)
imgs = jnp.asarray(rng.integers(0, 255, size=(B, 1024, 1024, 3), dtype=np.uint8))
masks = jnp.asarray(rng.integers(0, 5, size=(B, 1024, 1024), dtype=np.int32))
state = F.create_finetune_state(jax.random.key(0), config, local_batch=B)
step = F.make_jitted_fused_finetune_step(config, aug_cfg, donate=False)
lowered = step.lower(state, imgs, masks, jax.random.key(1))
txt = lowered.compile().as_text()
for ln in txt.splitlines():
    if ("reverse(" in ln or " reverse" in ln) and "kernel" not in ln:
        print(ln.strip()[:220])
print("---- reshape.342 / big reshapes ----")
for ln in txt.splitlines():
    if ln.strip().startswith("%reshape") or " reshape(" in ln:
        if "1024,1024" in ln or "f32[32,256" in ln or "bf16[32,1024" in ln:
            print(ln.strip()[:220])
