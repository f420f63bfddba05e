#!/bin/bash
# Round-3 TPU follow-up: wait for the tunnel to recover, then run the
# measurement set that validates the mixed-precision flagship on the real
# chip. Logs everything to $LOG (default /tmp/r3_tpu.log).
set -u
cd "$(dirname "$0")/.."
LOG="${LOG:-/tmp/r3_tpu.log}"
exec >"$LOG" 2>&1

echo "=== tpu_followup start $(date) ==="
# 1. wait for the tunnel (up to 6 h, probe every 60 s)
for i in $(seq 1 360); do
  # the platform must BE tpu — a host-CPU fallback would pass a bare
  # matmul probe and stamp CPU rates into the chip logs
  if timeout 80 python -c "import jax, jax.numpy as jnp; assert jax.devices()[0].platform == 'tpu'; x=jnp.ones((256,256)); float((x@x)[0,0])" 2>/dev/null; then
    echo "TPU recovered at $(date) (probe $i)"; break
  fi
  echo "probe $i: down $(date +%H:%M:%S)"
  sleep 60
  if [ "$i" = 360 ]; then echo "never recovered"; exit 1; fi
done

echo "=== entry compile check $(date) ==="
timeout 1800 python -c "
import __graft_entry__ as ge, jax, time
t0=time.time()
fn, args = ge.entry()
out, mu = jax.jit(fn)(*args)
print('entry(): forward OK', out.shape, mu.shape, f'{time.time()-t0:.1f}s')
"

echo "=== bench.py $(date) ==="
timeout 1800 python bench.py

echo "=== roofline_tpu.py (mixed default) $(date) ==="
timeout 2400 python benchmarks/roofline_tpu.py

echo "=== profile_grid.py --batches 4 8 (mixed default) $(date) ==="
timeout 2400 python benchmarks/profile_grid.py --batches 4 8

echo "=== tpu_followup done $(date) ==="
