"""Shared CLI plumbing for the tools (path setup, no-op flag handling)."""

import logging
import os
import sys

SCRIPT_DIR = os.path.dirname(os.path.abspath(__file__))
ROOT_PATH = os.path.split(SCRIPT_DIR)[0]
if ROOT_PATH not in sys.path:
    sys.path.insert(0, ROOT_PATH)

# Honor JAX_PLATFORMS even when a platform plugin (e.g. the axon TPU tunnel)
# overrides it during import — force it through jax.config.
_requested_platform = os.environ.get("JAX_PLATFORMS")
if _requested_platform:
    import jax

    try:
        jax.config.update("jax_platforms", _requested_platform)
    except Exception:  # noqa: BLE001
        pass
if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

# Flags kept for CLI parity with the reference's DDP/CUDA runtime but
# meaningless under single-process GSPMD JAX; each logs once when set.
NOOP_FLAGS = {
    "world_size": "multi-host scale-out uses jax.distributed, not --world-size",
    "rank": "process rank comes from jax.process_index()",
    "dist_url": "no TCP rendezvous needed under JAX",
    "dist_backend": "collectives run over ICI/DCN via XLA, not NCCL",
    "gpu": "device placement is automatic",
    "multiprocessing_distributed": "data parallelism is GSPMD (one process per host)",
    "workers": "host loader uses a thread pool sized independently",
    "tf32": "TPU matmuls use bf16/fp32; --tf32 has no effect",
    "bf16": "bf16 is the default compute dtype when --amp is set",
}


def warn_noop_flags(args, parser_defaults, extra=None):
    """Log once for every parity-only flag set to a non-default value.
    ``extra`` adds tool-specific inert flags to the global table."""
    logger = logging.getLogger("MSF-WSI")
    table = {**NOOP_FLAGS, **(extra or {})}
    for flag, why in table.items():
        if hasattr(args, flag) and getattr(args, flag) != parser_defaults.get(flag):
            logger.info(f"=> flag --{flag.replace('_', '-')} accepted for parity but inert: {why}")


def check_norm_stats(args, weights_path):
    """Normalization-footgun guard: scoring with different ``--mean/--std``
    than the checkpoint was trained with silently destroys results (measured
    ~40 F1 points on the convergence run — BASELINE.md; the reference has the
    same trap). Training runs dump every flag to ``configs.txt`` next to
    their checkpoints, so when the supplied weights path has one, compare
    and warn loudly on mismatch. Warn-only: stats legitimately differ when
    weights were moved out of their run directory."""
    import ast

    logger = logging.getLogger("MSF-WSI")
    if not weights_path:
        return
    d = weights_path if os.path.isdir(weights_path) else os.path.dirname(weights_path)
    cfg_path = os.path.join(d, "configs.txt")
    if not os.path.exists(cfg_path):
        cfg_path = os.path.join(os.path.dirname(d.rstrip("/")), "configs.txt")
        if not os.path.exists(cfg_path):
            return
    trained = {}
    try:
        with open(cfg_path) as f:
            for line in f:
                key, _, val = line.partition(":")
                if key.strip() in ("mean", "std"):
                    trained[key.strip()] = ast.literal_eval(val.strip())
    except (OSError, ValueError, SyntaxError):
        return
    for key in ("mean", "std"):
        want = trained.get(key)
        got = getattr(args, key, None)
        if want is None or got is None:
            continue
        if any(abs(a - b) > 1e-6 for a, b in zip(want, list(got))):
            logger.warning(
                f"=> --{key} {list(got)} differs from the checkpoint's training "
                f"run ({want}, from {cfg_path}). Mismatched normalization "
                f"silently degrades scores — pass --{key} {' '.join(str(v) for v in want)} "
                "unless you know the stats changed."
            )


def add_error_capture(log_dir):
    """Reference behavior: crash tracebacks also go to <log_dir>/error.txt
    (``ssl_train.py:72-81``)."""
    import traceback

    def capture(fn):
        def wrapped(*a, **kw):
            try:
                return fn(*a, **kw)
            except Exception as e:  # noqa: BLE001
                print(e, "\n")
                with open(os.path.join(log_dir, "error.txt"), "a") as f:
                    traceback.print_exc(file=f)
                    f.write("\n")
                raise

        return wrapped

    return capture
