#!/bin/bash
# Poll for TPU *execution* availability (device listing succeeds even when
# the axon tunnel is dead — round-3 session-4 finding), then exit 0.
# Usage: bash tools/diag/tpu_exec_poll.sh [max_polls] [sleep_s]
cd /root/repo
MAX=${1:-40}
SLEEP=${2:-90}
for i in $(seq 1 "$MAX"); do
  if timeout 180 python -c "
import jax, jax.numpy as jnp
assert jax.devices()[0].platform != 'cpu'
x = jnp.ones((256, 256), jnp.bfloat16)
v = float(jax.jit(lambda a: jnp.sum(a @ a, dtype=jnp.float32))(x))
assert v == 256 * 256 * 256  # exact in f32 accumulation regardless of backend
" 2>/dev/null; then
    echo "TPU execution OK after $i polls"
    exit 0
  fi
  echo "poll $i: TPU execution unavailable"
  sleep "$SLEEP"
done
echo "TPU never came back"
exit 1
