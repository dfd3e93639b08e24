"""Driver-contract tests for __graft_entry__.py.

The driver imports the module in a fresh process (with the axon TPU plugin
active and WITHOUT this test suite's conftest env) and calls
``dryrun_multichip(8)``. These tests reproduce that calling convention in a
subprocess so a regression in the platform guard fails here first
(round-1 failure mode: the dryrun ran on the tunneled TPU and died on a
libtpu version mismatch instead of using virtual CPU devices).
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(code: str) -> subprocess.CompletedProcess:
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env.pop("JAX_PLATFORMS", None)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(REPO, ".jax_cache"))
    return subprocess.run(
        [sys.executable, "-c", code],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )


@pytest.mark.slow
def test_dryrun_multichip_fresh_process():
    """Driver calling convention: no XLA_FLAGS, no JAX_PLATFORMS."""
    proc = _run("import __graft_entry__ as g; g.dryrun_multichip(8)")
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip(8): ok" in proc.stdout


@pytest.mark.slow
def test_dryrun_multichip_after_backend_init():
    """Guard must recover even when a 1-device backend is already up."""
    proc = _run(
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "assert jax.device_count() >= 1\n"
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n"
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip(8): ok" in proc.stdout
