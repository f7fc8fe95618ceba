#!/bin/bash
# Retry the TPU smoke until the axon tunnel holds. Probe in a killable
# subprocess first (backend init has been observed hanging), then run.
# APPEND to PYTHONPATH: the environment ships PYTHONPATH=/root/.axon_site
# (the axon TPU PJRT plugin loader) — overwriting it silently removes the TPU
# backend from every probe (round-3 lesson: 91 "tunnel down" probes were this)
export PYTHONPATH=/root/repo${PYTHONPATH:+:$PYTHONPATH}
export JAX_COMPILATION_CACHE_DIR=/tmp/jaxcache
export JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS=10
cd /root/repo
for i in $(seq 1 120); do
  if timeout 150 python -c "import jax.numpy as jnp, numpy as np; assert float(np.asarray(jnp.zeros(8)+1).sum())==8; import jax; assert jax.default_backend()!='cpu'; print('probe ok')"; then
    echo "=== probe ok on attempt $i; running smoke ==="
    timeout 5400 python scripts/tpu_smoke.py --full
    rc=$?
    echo "=== smoke rc=$rc ==="
    if [ $rc -eq 0 ]; then exit 0; fi
  else
    echo "probe attempt $i failed; sleeping 60s"
  fi
  sleep 60
done
exit 1
