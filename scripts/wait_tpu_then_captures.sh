#!/bin/bash
# The relay's compile service wedged ~22:04 (small compiles passed at
# 22:25; conv-sized compiles hang indefinitely). Probe with a
# representative conv compile; on recovery run the r4b (trimmed) and r4c
# capture scripts in sequence.
cd /root/repo
while true; do
  if timeout 300 python - <<'PYEOF'
import time
import jax, jax.numpy as jnp
from jax import lax
n = int(time.time()) % 7 + 10  # varying batch defeats the disk cache
x = jnp.ones((n, 56, 56, 256), jnp.bfloat16)
w = jnp.ones((3, 3, 256, 64), jnp.bfloat16)
y = lax.conv_general_dilated(x, w, (1, 1), [(1, 1), (1, 1)],
                             dimension_numbers=("NHWC", "HWIO", "NHWC"))
print("probe ok", float(y.sum()))
PYEOF
  then break; fi
  echo "$(date +%T) compile service still stuck" >&2
  sleep 240
done
echo "$(date +%T) compile service recovered; launching captures" >&2
bash /root/repo/scripts/run_chip_r4c.sh
