#!/bin/bash
# Poll TPU availability until the tunnel returns. Each failed jax init
# blocks ~20 min before raising Unavailable, so the loop is effectively a
# ~20-min poll. Appends timestamped status to /tmp/tpu_watch.log and exits
# 0 the moment a real device answers a tiny computation.
LOG=/tmp/tpu_watch.log
for i in $(seq 1 40); do
  echo "[$(date -u +%H:%M:%S)] attempt $i" >> "$LOG"
  if timeout 1500 python -c "
import jax, jax.numpy as jnp
d = jax.devices()
print('devices:', d)
print('compute:', float(jnp.sum(jnp.ones((8,8)))))
" >> "$LOG" 2>&1; then
    echo "[$(date -u +%H:%M:%S)] TPU UP" >> "$LOG"
    exit 0
  fi
  echo "[$(date -u +%H:%M:%S)] still down" >> "$LOG"
  sleep 120
done
echo "[$(date -u +%H:%M:%S)] gave up after 40 attempts" >> "$LOG"
exit 1
