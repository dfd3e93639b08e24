#!/bin/bash
# Poll for TPU availability, then run the round-3 bench sweep.
cd /root/repo
for i in $(seq 1 60); do
  if timeout 120 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" 2>/dev/null; then
    echo "TPU back after $i polls"
    exec bash tools/diag/round3_sweep.sh
  fi
  echo "poll $i: TPU unavailable"
  sleep 120
done
echo "TPU never came back"
