import jax
import numpy as np
from msfwsi_tpu.data import datasets as D, loader as L
from msfwsi_tpu.data.pipeline import AugConfig, make_seg_val_views
from msfwsi_tpu.train import checkpoint as C, evaluate as EV, finetune as FT

config = FT.FinetuneConfig(arch="resnet18", class_names=FT.BCSS_CLASSES, amp=True, seed=3407)
state = FT.create_finetune_state(jax.random.key(3407), config)
state = C.restore_train_state("logs/convergence/finetune/best_ft_model", state)
print("restored step:", int(state.step))
aug_cfg = AugConfig(mean=(0.6998,0.4785,0.6609), std=(0.2203,0.2407,0.1983), seg_size=256)
groups = D.bcss_seg_val_slides("/tmp/bcss_prep", fold=0)
variables = {"params": state.params, "batch_stats": state.batch_stats}
fwd = EV.make_chunk_stats(state.model, 5, chunk=128)
for g in groups:
    imgs, masks = L.load_slide_arrays("/tmp/bcss_prep", g)
    (ctx, tgt), (_, tmask) = make_seg_val_views(imgs, masks, aug_cfg)
    micro, sums = EV.validate_slide(fwd, variables, np.asarray(ctx), np.asarray(tgt), np.asarray(tmask), num_classes=5, chunk=128)
    print(g.filename, micro)
