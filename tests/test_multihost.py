"""Multi-host validation: two real processes over jax.distributed.

Exercises the code paths single-process tests can't: `initialize_distributed`,
rank-strided file sharding, and global-batch assembly via
`make_array_from_process_local_data` — the TPU-pod data path, simulated with
two CPU processes on localhost.
"""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = textwrap.dedent(
    """
    import os, sys
    import jax

    jax.config.update("jax_platforms", "cpu")
    proc_id = int(sys.argv[1])
    coord = sys.argv[2]

    from msfwsi_tpu.parallel import initialize_distributed

    initialize_distributed(
        coordinator_address=coord, num_processes=2, process_id=proc_id,
        local_device_ids=[0],
    )
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 2

    import numpy as np
    from msfwsi_tpu.data.loader import _shard_files, TileBatchLoader
    from msfwsi_tpu.parallel import MeshSpec, batch_sharding, make_mesh

    # Rank-strided sharding: the two processes must split the file list
    # disjointly and deterministically.
    files = [f"f{i}" for i in range(10)]
    mine = _shard_files(files, epoch_seed=7, process_index=proc_id,
                        process_count=2, shuffle=True)
    assert len(mine) == 5
    print(f"SHARD{proc_id}:{','.join(mine)}", flush=True)

    # Global batch assembly across processes.
    mesh = make_mesh(MeshSpec(data=2))
    loader = TileBatchLoader(
        "<mem>", list(range(8)), batch_size=4,
        load_fn=lambda i: np.full((4, 4, 3), i, np.uint8),
        shuffle=False, seed=0, sharding=batch_sharding(mesh),
    )
    batch = next(iter(loader.epoch(0)))
    # global shape: per-process local batch (4) stacks to a global 8? No —
    # batch_size is per host, so global first dim is 4*2 = 8.
    assert batch.shape[0] == 8, batch.shape
    total = float(batch.astype("float32").sum())
    print(f"OK{proc_id}:{batch.shape[0]}:{total}", flush=True)

    # --- the jitted SSL train step ACROSS the two processes -------------
    # Batch sharded over the 2-device (= 2-process) mesh: XLA inserts the
    # cross-process gradient psum and global-batch BN reductions — the live
    # analog of DDP allreduce + SyncBN (ssl_train.py:160,170,472).
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from msfwsi_tpu.train import ssl as S
    from multihost_common import CONFIG, make_global_batch

    state = S.create_ssl_state(jax.random.key(0), CONFIG)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    state = jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(repl, np.asarray(x)),
        state,
    )
    gbatch = make_global_batch()
    half = lambda x: np.split(x, 2, axis=0)[proc_id]
    batch = {
        k: jax.make_array_from_process_local_data(data, half(v))
        for k, v in gbatch.items()
    }
    step_fn = S.make_jitted_train_step(CONFIG, mesh=mesh, donate=False)
    new_state, metrics = step_fn(state, batch)
    loss = float(metrics["loss"])
    pnorm = float(
        sum(jnp.sum(jnp.square(l.astype(jnp.float32)))
            for l in jax.tree.leaves(new_state.params))
    )
    bnorm = float(
        sum(jnp.sum(jnp.square(l.astype(jnp.float32)))
            for l in jax.tree.leaves(new_state.batch_stats))
    )
    print(f"STEP{proc_id}:{loss:.8f}:{pnorm:.6f}:{bnorm:.6f}", flush=True)

    # --- the jitted HookNet finetune (seg) step ACROSS the processes -----
    # Same statement for the supervised path (+ the packed s2d decoder):
    # cross-process gradient psum + global-batch BN stats in the two coupled
    # U-Nets (DDP analog of ssl_finetune.py's training loop).
    from msfwsi_tpu.train import finetune as FT
    from multihost_common import make_seg_config, make_seg_global_batch

    seg_config = make_seg_config()
    seg_state = FT.create_finetune_state(jax.random.key(0), seg_config,
                                         local_batch=2)
    seg_state = jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(repl, np.asarray(x)),
        seg_state,
    )
    seg_batch = {
        k: jax.make_array_from_process_local_data(data, half(v))
        for k, v in make_seg_global_batch().items()
    }
    seg_step = FT.make_jitted_finetune_step(seg_config, mesh=mesh, donate=False)
    seg_new, seg_metrics = seg_step(seg_state, seg_batch)
    seg_loss = float(seg_metrics["loss"])
    seg_pnorm = float(
        sum(jnp.sum(jnp.square(l.astype(jnp.float32)))
            for l in jax.tree.leaves(seg_new.params))
    )
    print(f"SEG{proc_id}:{seg_loss:.8f}:{seg_pnorm:.6f}", flush=True)

    # --- pad_last + per-segment valid mask ACROSS the processes ----------
    # 10 items, per-process batch 2: each process shards 5 files -> 2 full
    # batches + a trailing 1-real+1-wrap-pad batch. In the assembled global
    # batch the pads sit at each process SEGMENT's tail (not the global
    # tail) — last_batch_valid_mask() must align with the data rows.
    loader2 = TileBatchLoader(
        "<mem>", list(range(10)), batch_size=2,
        load_fn=lambda i: np.full((2, 2, 3), i, np.uint8),
        shuffle=False, seed=0, drop_last=False, pad_last=True,
        sharding=batch_sharding(mesh),
    )
    assert len(loader2) == 3, len(loader2)
    batches2 = list(loader2.epoch(0))
    assert len(batches2) == 3
    assert batches2[-1].shape[0] == 4  # static global shape incl. pads
    vmask = loader2.last_batch_valid_mask()
    lb = batches2[-1]
    assert lb.addressable_shards[0].device == vmask.addressable_shards[0].device
    dshard = np.asarray(lb.addressable_shards[0].data)[:, 0, 0, 0]
    mshard = np.asarray(vmask.addressable_shards[0].data)
    print(f"PAD{proc_id}:{dshard.tolist()}:{mshard.astype(int).tolist()}", flush=True)

    # --- finetune step under the NON-SUFFIX per-segment mask -------------
    # valid = [1,0,1,0]: each segment's tail row is a pad. Loss/update must
    # equal a single-process run of the identical batch+mask (the
    # multi-host drop_last=False path at any --frac).
    from multihost_common import make_seg_valid_mask

    gvalid = make_seg_valid_mask()
    seg_batch_v = dict(seg_batch)
    seg_batch_v["valid"] = jax.make_array_from_process_local_data(data, half(gvalid))
    seg_state2 = FT.create_finetune_state(jax.random.key(0), seg_config,
                                          local_batch=2)
    seg_state2 = jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(repl, np.asarray(x)),
        seg_state2,
    )
    segv_new, segv_metrics = seg_step(seg_state2, seg_batch_v)
    segv_loss = float(segv_metrics["loss"])
    segv_pnorm = float(
        sum(jnp.sum(jnp.square(l.astype(jnp.float32)))
            for l in jax.tree.leaves(segv_new.params))
    )
    vsum = int(np.asarray(segv_metrics["valid"].addressable_shards[0].data).sum())
    print(f"SEGV{proc_id}:{segv_loss:.8f}:{segv_pnorm:.6f}:{vsum}", flush=True)
    """
)


@pytest.mark.slow
def test_two_process_distributed(tmp_path):
    port = 0
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    pythonpath = ":".join(
        [REPO, os.path.join(REPO, "tests"), os.environ.get("PYTHONPATH", "")]
    )
    env = dict(
        os.environ,
        PYTHONPATH=pythonpath,
        JAX_PLATFORMS="cpu",
        JAX_COMPILATION_CACHE_DIR=os.path.join(REPO, ".jax_cache"),
    )
    env.pop("XLA_FLAGS", None)

    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i), coord],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
            env=env,
            cwd=REPO,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)

    # Disjoint shards covering all files.
    shards = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("SHARD"):
                pid = int(line[5])
                shards[pid] = set(line.split(":", 1)[1].split(","))
    assert shards[0] | shards[1] == {f"f{i}" for i in range(10)}
    assert not (shards[0] & shards[1])

    # Both processes agree on the global batch.
    oks = sorted(l for out in outs for l in out.splitlines() if l.startswith("OK"))
    assert len(oks) == 2
    assert oks[0].split(":")[1:] == oks[1].split(":")[1:]

    # The cross-process train step: both workers report the same loss and
    # updated-state checksums, and they equal a single-process run of the
    # identical step on the identical global batch — the gradient-psum /
    # SyncBN parity statement (DDP allreduce analog, ssl_train.py:472).
    steps = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("STEP"):
                pid = int(line[4])
                steps[pid] = [float(x) for x in line[6:].split(":")]
    assert set(steps) == {0, 1}, f"missing STEP lines:\n{outs}"

    import numpy as np
    import jax
    import jax.numpy as jnp

    from msfwsi_tpu.train import ssl as S
    from multihost_common import CONFIG, make_global_batch

    state = S.create_ssl_state(jax.random.key(0), CONFIG)
    step_fn = S.make_jitted_train_step(CONFIG, mesh=None, donate=False)
    new_state, metrics = step_fn(state, make_global_batch())
    loss = float(metrics["loss"])
    pnorm = float(
        sum(jnp.sum(jnp.square(l.astype(jnp.float32)))
            for l in jax.tree.leaves(new_state.params))
    )
    bnorm = float(
        sum(jnp.sum(jnp.square(l.astype(jnp.float32)))
            for l in jax.tree.leaves(new_state.batch_stats))
    )
    for pid in (0, 1):
        got_loss, got_pnorm, got_bnorm = steps[pid]
        np.testing.assert_allclose(got_loss, loss, rtol=0, atol=1e-5)
        np.testing.assert_allclose(got_pnorm, pnorm, rtol=1e-6)
        np.testing.assert_allclose(got_bnorm, bnorm, rtol=1e-6)

    # Same parity statement for the HookNet finetune step (packed decoder).
    segs = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("SEG") and not line.startswith("SEGV"):
                pid = int(line[3])
                segs[pid] = [float(x) for x in line[5:].split(":")]
    assert set(segs) == {0, 1}, f"missing SEG lines:\n{outs}"

    from multihost_common import make_seg_config, make_seg_global_batch
    from msfwsi_tpu.train import finetune as FT

    seg_config = make_seg_config()
    seg_state = FT.create_finetune_state(jax.random.key(0), seg_config, local_batch=2)
    seg_step = FT.make_jitted_finetune_step(seg_config, mesh=None, donate=False)
    seg_new, seg_metrics = seg_step(seg_state, make_seg_global_batch())
    seg_loss = float(seg_metrics["loss"])
    seg_pnorm = float(
        sum(jnp.sum(jnp.square(l.astype(jnp.float32)))
            for l in jax.tree.leaves(seg_new.params))
    )
    for pid in (0, 1):
        got_loss, got_pnorm = segs[pid]
        np.testing.assert_allclose(got_loss, seg_loss, rtol=0, atol=1e-5)
        np.testing.assert_allclose(got_pnorm, seg_pnorm, rtol=1e-6)

    # pad_last across processes: each process's shard of the last batch is
    # [real, wrap-pad] and the mask marks exactly the real row. With
    # shuffle=False the shards are [0,2,4,6,8] / [1,3,5,7,9], so the real
    # trailing values are 8 and 9 and the wrap pads are 0 and 1.
    pads = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("PAD"):
                pid = int(line[3])
                data_s, mask_s = line[5:].split(":")
                pads[pid] = (eval(data_s), eval(mask_s))
    assert set(pads) == {0, 1}, f"missing PAD lines:\n{outs}"
    assert pads[0] == ([8, 0], [1, 0]), pads[0]
    assert pads[1] == ([9, 1], [1, 0]), pads[1]

    # Non-suffix valid mask: the 2-process masked step equals the identical
    # single-process step (same batch, same [1,0,1,0] mask) — multi-host
    # drop_last=False parity without the global-tail-pad assumption.
    segvs = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("SEGV"):
                pid = int(line[4])
                segvs[pid] = line[6:].split(":")
    assert set(segvs) == {0, 1}, f"missing SEGV lines:\n{outs}"
    from multihost_common import make_seg_valid_mask

    gvalid = make_seg_valid_mask()
    seg_batch_v = dict(make_seg_global_batch())
    seg_batch_v["valid"] = gvalid
    seg_state2 = FT.create_finetune_state(jax.random.key(0), seg_config, local_batch=2)
    segv_new, segv_metrics = seg_step(seg_state2, seg_batch_v)
    segv_loss = float(segv_metrics["loss"])
    segv_pnorm = float(
        sum(jnp.sum(jnp.square(l.astype(jnp.float32)))
            for l in jax.tree.leaves(segv_new.params))
    )
    # The mask excludes real data rows here, so it must CHANGE the loss.
    assert abs(segv_loss - seg_loss) > 1e-6
    for pid in (0, 1):
        got_loss, got_pnorm, got_vsum = segvs[pid]
        np.testing.assert_allclose(float(got_loss), segv_loss, rtol=0, atol=1e-5)
        np.testing.assert_allclose(float(got_pnorm), segv_pnorm, rtol=1e-6)
        assert int(got_vsum) == 2  # replicated metrics: 2 real rows globally

