#!/bin/bash
# Probe the axon TPU tunnel with a real matmul in a timeboxed subprocess;
# the MOMENT it is healthy, (re)launch the measurement session
# (benchmarks/tpu_session.sh r05). The session is resumable: it skips
# already-green legs and exits rc=3 if the tunnel wedges mid-run, in which
# case we go back to probing and resume when it returns.
# Exits 2 after ~11h of down. Log: /tmp/tpu_watch.log
deadline=$(( $(date +%s) + 39600 ))
while [ "$(date +%s)" -lt "$deadline" ]; do
  if timeout 150 python -c "
import jax, jax.numpy as jnp
jax.devices()
x = jnp.ones((128, 128), jnp.bfloat16)
print('OK', float((x @ x).sum()))
" > /tmp/tpu_probe_out.txt 2>&1; then
    if grep -q '^OK' /tmp/tpu_probe_out.txt; then
      echo "TPU HEALTHY at $(date -u +%H:%M:%S) — (re)starting tpu_session r05"
      cd /root/repo
      bash benchmarks/tpu_session.sh r05 >> /tmp/tpu_session_r05.out 2>&1
      rc=$?
      echo "tpu_session r05 rc=${rc} at $(date -u +%H:%M:%S)"
      if [ "$rc" -ne 3 ]; then
        exit 0   # completed (possibly with honest per-leg failures logged)
      fi
      # rc=3: wedged mid-session — fall through and keep probing
    fi
  fi
  echo "probe failed at $(date -u +%H:%M:%S); sleeping 240s"
  sleep 240
done
echo "gave up after deadline"
exit 2
