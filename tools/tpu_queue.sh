#!/bin/bash
# One-shot unattended queue for the chip-bound round-3 tasks.
# Waits for the TPU tunnel, then runs each task sequentially with logs
# under /tmp/tpu_queue/. Safe to re-run: completed steps are skipped via
# stamp files.
set -u
cd /root/repo
mkdir -p /tmp/tpu_queue
LOG=/tmp/tpu_queue

stamp() { [ -f "$LOG/$1.done" ]; }
mark()  { touch "$LOG/$1.done"; }

# --- self-provisioning: the driver cleans untracked artifacts between
# sessions, so rebuild anything a queue task needs before waiting on the
# tunnel (all of this is CPU-only and idempotent).
if [ ! -f native/libgeometry_kernels.so ]; then
  echo "[queue] building native engine..." | tee -a $LOG/queue.log
  make -C native > $LOG/native_build.log 2>&1 \
    || echo "[queue] native build FAILED (ctypes fallback will be used)" \
       | tee -a $LOG/queue.log
fi
if [ ! -d data_synth ] || [ "$(ls data_synth/*.obj 2>/dev/null | wc -l)" -lt 60 ]; then
  echo "[queue] generating synthetic dataset..." | tee -a $LOG/queue.log
  python tools/make_synthetic_dataset.py --out data_synth --n 60 \
    > $LOG/dataset.log 2>&1 \
    || { echo "[queue] dataset generation FAILED — aborting" \
         | tee -a $LOG/queue.log; exit 1; }
fi

echo "[queue] waiting for TPU tunnel..." | tee -a $LOG/queue.log
while true; do
  # require the default platform to BE tpu — a host-CPU fallback passing
  # this gate would stamp CPU numbers into the canonical chip artifacts
  if timeout 80 python -c \
      "import jax; assert jax.devices()[0].platform == 'tpu'" \
      >/dev/null 2>&1; then
    echo "[queue] tunnel UP at $(date)" | tee -a $LOG/queue.log
    break
  fi
  echo "[queue] down at $(date)" >> $LOG/queue.log
  sleep 180
done

if ! stamp entry; then
  echo "[queue] entry check..." | tee -a $LOG/queue.log
  timeout 900 python __graft_entry__.py > $LOG/entry.log 2>&1 \
    && mark entry || echo "[queue] entry FAILED rc=$?" | tee -a $LOG/queue.log
fi

if ! stamp roofline; then
  echo "[queue] roofline (mixed)..." | tee -a $LOG/queue.log
  timeout 1800 python benchmarks/roofline_tpu.py \
    --json benchmarks/roofline_tpu.json > $LOG/roofline.log 2>&1 \
    && mark roofline || echo "[queue] roofline FAILED rc=$?" | tee -a $LOG/queue.log
fi

if ! stamp bench; then
  echo "[queue] bench..." | tee -a $LOG/queue.log
  timeout 2400 python bench.py > $LOG/bench.log 2>&1 \
    && mark bench || echo "[queue] bench FAILED rc=$?" | tee -a $LOG/queue.log
fi

if ! stamp train; then
  echo "[queue] flagship mixed retrain..." | tee -a $LOG/queue.log
  timeout 5400 python train.py --config=configurations/craniofacial.yaml \
    --id=cranio600_mixed > $LOG/train.log 2>&1 \
    && mark train || echo "[queue] train FAILED rc=$?" | tee -a $LOG/queue.log
fi

if stamp train && ! stamp eval; then
  echo "[queue] flagship eval..." | tee -a $LOG/queue.log
  timeout 3600 python test.py --id=cranio600_mixed > $LOG/eval.log 2>&1 \
    && mark eval || echo "[queue] eval FAILED rc=$?" | tee -a $LOG/queue.log
fi

if ! stamp dtypeprobe; then
  echo "[queue] gather dtype probe (incl int8 headroom)..." | tee -a $LOG/queue.log
  timeout 1200 python benchmarks/gather_dtype_probe.py > $LOG/dtypeprobe.log 2>&1 \
    && mark dtypeprobe || echo "[queue] dtypeprobe FAILED rc=$?" | tee -a $LOG/queue.log
fi

if ! stamp floor; then
  echo "[queue] canary floor sampling (1h)..." | tee -a $LOG/queue.log
  timeout 4200 python tools/canary_floor.py --hours 1 --interval 120 \
    > $LOG/floor.log 2>&1 \
    && mark floor || echo "[queue] floor FAILED rc=$?" | tee -a $LOG/queue.log
fi

if stamp entry && stamp roofline && stamp bench && stamp train \
    && stamp eval && stamp dtypeprobe && stamp floor; then
  echo "[queue] ALL DONE at $(date)" | tee -a $LOG/queue.log
else
  echo "[queue] FINISHED WITH FAILURES at $(date) — stamps:" \
    | tee -a $LOG/queue.log
  ls $LOG/*.done 2>/dev/null | tee -a $LOG/queue.log
fi
