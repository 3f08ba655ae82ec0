#!/usr/bin/env bash
# Round-3 pending TPU benchmark queue (ordered per the round-2/3 backlog).
# Waits for the worker-watch loop to log UP in /tmp/tpu_status.log, then runs
# each benchmark SEQUENTIALLY (never two TPU processes at once — CLAUDE.md),
# probing worker health between steps so one crash doesn't cascade. Logs to
# /tmp/rq_<step>.log. Idempotent: skips steps whose log already ends in OK.

set -u
cd "$(dirname "$0")/.."
STATUS=/tmp/tpu_status.log

WATCHER_PID="${WATCHER_PID:-}"   # the single external probe loop, if any

wait_up() {
  while true; do
    # only the LAST status line counts — a stale UP from before a crash must
    # not short-circuit the recovery wait (that would cascade failures into
    # the dead worker, the exact thing this queue exists to prevent)
    if tail -1 "$STATUS" 2>/dev/null | grep -q '^UP'; then return 0; fi
    # only probe ourselves if no external watcher is alive — two processes
    # dialing the tunnel at the recovery moment can crash the worker again
    if [ -z "$WATCHER_PID" ] || ! kill -0 "$WATCHER_PID" 2>/dev/null; then
      if timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
        echo "UP $(date -u +%H:%M:%S) (recovery_queue probe)" >> "$STATUS"
        return 0
      fi
      echo "DOWN $(date -u +%H:%M:%S) (recovery_queue probe)" >> "$STATUS"
    fi
    sleep 120
  done
}

step() {  # step <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  local log=/tmp/rq_${name}.log
  if [ -f "$log" ] && tail -1 "$log" | grep -q '^RQ_OK'; then
    echo "[rq] $name: already done, skipping"; return 0
  fi
  echo "[rq] $name: starting ($(date -u +%H:%M:%S))"
  if timeout "$tmo" "$@" > "$log" 2>&1; then
    echo "RQ_OK" >> "$log"; echo "[rq] $name: OK"
  else
    echo "RQ_FAIL exit=$?" >> "$log"; echo "[rq] $name: FAILED (see $log)"
    # re-probe before continuing; if the worker died, wait for recovery
    wait_up
  fi
}

wait_up
echo "[rq] worker is up — draining queue"

# 1. quality artifact (STATUS.md claims it — highest priority)
step quality 5400 python benchmarks/quality_run.py 30 2000

# 2. CycleGAN hybrid at reference scale (the headline new result)
step cg_hybrid 5400 python benchmarks/streaming.py cyclegan_hybrid 25446 4 256

# 3. PUT_STREAMS A/B end-to-end
step put1 2400 env GAN_TPU_PUT_STREAMS=1 python benchmarks/streaming.py hostarray 8192 128 256
step put3 2400 python benchmarks/streaming.py hostarray 8192 128 256

# 4. 512^2 hybrid with parallel puts + tunnel snapshot
step hyb512 5400 python benchmarks/streaming.py hybrid 25472 32 512
step tsnap 1200 python benchmarks/transfer_bench.py

# 5. remat frontier table
step remat 5400 python benchmarks/remat_frontier.py --save

# 6. stem-conv A/B (new r3: GAN_TPU_DOWN policy decision)
step stem_micro 2400 python benchmarks/stem_bench.py micro
step stem_e2e 3600 python benchmarks/stem_bench.py e2e

# 7. per-layer MFU attribution (backs the 47% plateau claim)
step mfu 3600 python benchmarks/mfu_breakdown.py 128 256 32 --save

# 8. headline sanity
step bench 3600 python bench.py

echo "[rq] queue drained ($(date -u +%H:%M:%S))"
