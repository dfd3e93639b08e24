"""Time checkpoint save on the real device: async dispatch vs durable.

save_train_state is async (Orbax StandardCheckpointer): the call returns
after jax.device_get snapshots the payload to host; serialization to disk
runs in background threads. This measures, for a real train state:

  save_call      wall time of save_train_state() (training-loop stall)
  save_durable   + wait_for_saves() (total time to a durable checkpoint)
  restore        restore_train_state() round-trip

The D2H fetch itself rides jax.device_get's copy_to_host_async pipelining —
a naive per-leaf np.asarray through the axon tunnel is pathologically slow
(see cli_datapath_bench --d2h).

Usage: python tools/diag/ckpt_save_bench.py [--arch resnet18] [-b 8]
"""

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", default="resnet18")
    ap.add_argument("-b", "--batch", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from msfwsi_tpu.train import checkpoint as C
    from msfwsi_tpu.train.ssl import SSLConfig, create_ssl_state

    cfg = SSLConfig(arch=args.arch, batch_size=args.batch)
    state = create_ssl_state(jax.random.key(0), cfg)
    n_bytes = sum(
        x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(state.params)
    )
    print(f"{args.arch}: params ~{n_bytes / 1e6:.0f} MB on {jax.devices()[0]}", flush=True)

    out = tempfile.mkdtemp(prefix="ckptbench_")
    try:
        # warm (compile-free path, but Orbax lazy imports etc.)
        C.save_train_state(out, state, 0, block=True)

        t0 = time.perf_counter()
        C.save_train_state(out, state, 1)
        t_call = time.perf_counter() - t0
        C.wait_for_saves()
        t_durable = time.perf_counter() - t0
        print(f"save_call:    {t_call:.3f} s (training-loop stall)", flush=True)
        print(f"save_durable: {t_durable:.3f} s", flush=True)

        t0 = time.perf_counter()
        C.restore_train_state(os.path.join(out, "checkpoint_0001"), state)
        print(f"restore:      {time.perf_counter() - t0:.3f} s", flush=True)
    finally:
        shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
