import jax
import numpy as np
from msfwsi_tpu.data import datasets as D, loader as L
from msfwsi_tpu.data.pipeline import AugConfig, make_seg_val_views
from msfwsi_tpu.train import checkpoint as C, evaluate as EV, finetune as FT

# --- evaluate.py-style setup -------------------------------------------------
class_names = FT.BCSS_CLASSES
config_e = FT.FinetuneConfig(arch="resnet18", class_names=tuple(class_names),
                             amp=True, seg_size=256, seed=3407)
state_e = FT.create_finetune_state(jax.random.key(config_e.seed), config_e)
state_e = C.restore_train_state("logs/convergence/finetune/best_ft_model", state_e)

# --- my repro setup ----------------------------------------------------------
config_r = FT.FinetuneConfig(arch="resnet18", class_names=FT.BCSS_CLASSES, amp=True, seed=3407)
state_r = FT.create_finetune_state(jax.random.key(3407), config_r)
state_r = C.restore_train_state("logs/convergence/finetune/best_ft_model", state_r)

# params identical?
pe, pr = jax.tree.leaves(state_e.params), jax.tree.leaves(state_r.params)
same_params = all(np.array_equal(np.asarray(a), np.asarray(b)) for a, b in zip(pe, pr))
be, br = jax.tree.leaves(state_e.batch_stats), jax.tree.leaves(state_r.batch_stats)
same_stats = all(np.array_equal(np.asarray(a), np.asarray(b)) for a, b in zip(be, br))
print("params equal:", same_params, "stats equal:", same_stats)

aug_e = AugConfig(mean=(0.6998,0.4785,0.6609), std=(0.2203,0.2407,0.1983), seg_size=256)
groups = D.bcss_seg_val_slides("/tmp/bcss_prep", fold=0)
imgs, masks = L.load_slide_arrays("/tmp/bcss_prep", groups[0])
(ctx, tgt), (_, tmask) = make_seg_val_views(imgs, masks, aug_e)

var_e = {"params": state_e.params, "batch_stats": state_e.batch_stats}
var_r = {"params": state_r.params, "batch_stats": state_r.batch_stats}
fwd_e = EV.make_chunk_stats(state_e.model, len(class_names), chunk=128)
fwd_r = EV.make_chunk_stats(state_r.model, 5, chunk=128)
m_e, _ = EV.validate_slide(fwd_e, var_e, np.asarray(ctx), np.asarray(tgt), np.asarray(tmask), num_classes=len(class_names), chunk=128)
m_r, _ = EV.validate_slide(fwd_r, var_r, np.asarray(ctx), np.asarray(tgt), np.asarray(tmask), num_classes=5, chunk=128)
print("evaluate-style:", m_e)
print("repro-style:   ", m_r)
print("models equal:", state_e.model == state_r.model)
