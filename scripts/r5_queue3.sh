#!/bin/bash
# Round-5 queue, phase 3: the multi-view endgame trimmed to the round's
# remaining wall-clock (AVRmv at 15k instead of 25k; VRmv control at 4k —
# VR converges fast, AVRmv's curve gives every matched-step comparison).
set -u
cd /root/repo
Q=logs/r5_queue
W=logs/quality_r5
AB="python scripts/quality_ab.py --workdir $W --ray_batch_size 1024 --device_data"
run_job() {
  local name=$1 tmo=$2; shift 2
  if [ -f "$Q/done.$name" ]; then echo "[queue] skip $name"; return; fi
  echo "[queue] start $name  $(date +%H:%M:%S)" | tee -a "$Q/queue.log"
  timeout "$tmo" "$@" > "$Q/$name.log" 2>&1
  local rc=$?
  echo "[queue] end   $name rc=$rc  $(date +%H:%M:%S)" | tee -a "$Q/queue.log"
  [ $rc -eq 0 ] && touch "$Q/done.$name"
}
run_job AVRmv15 3000 $AB --steps 15000 --renderers AVRmv15 \
  --num_source_views 2 --depth_consistency 0.5
run_job VRmv4k 2200 $AB --steps 4000 --renderers VRmv4k --num_source_views 2
touch "$Q/MV_DONE"
