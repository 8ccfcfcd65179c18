#!/bin/bash
# Round-5 TPU queue, phase 2: the device-resident-data series.
# All arms train with --device_data (batches drawn inside the jitted
# step; avr_tpu/data/device.py) at 4 x 1024 rays/step — the low-overhead
# protocol whose host-mode control is AVR_bb (phase 1).  Same PAUSE-gate
# and done-marker semantics as r5_queue.sh.
set -u
cd /root/repo
Q=logs/r5_queue
mkdir -p "$Q"
W=logs/quality_r5
AB="python scripts/quality_ab.py --workdir $W --ray_batch_size 1024 --device_data"

gate() { while [ -f "$Q/PAUSE" ]; do sleep 20; done; }

run_job() {
  local name=$1 tmo=$2; shift 2
  gate
  if [ -f "$Q/done.$name" ]; then echo "[queue] skip $name (done)"; return; fi
  echo "[queue] start $name  $(date +%H:%M:%S)" | tee -a "$Q/queue.log"
  timeout "$tmo" "$@" > "$Q/$name.log" 2>&1
  local rc=$?
  echo "[queue] end   $name rc=$rc  $(date +%H:%M:%S)" | tee -a "$Q/queue.log"
  [ $rc -eq 0 ] && touch "$Q/done.$name"
}

# J2: flagship adaptive arm on the device-data path (the AVR_bb rerun —
#     quality should match phase 1's within noise, wall-clock far lower)
run_job AVR_dd 4000 $AB --steps 25000 --renderers AVR_dd \
  --depth_consistency 0.5 --eps_scales 1.5,2 --epochs_save 313

# J3: classic renderer, its converged 10k schedule (the quality target)
run_job VR_dd10k 4500 $AB --steps 10000 --renderers VR_dd10k

# J4: matched-steps converged control (measured VR_long, VERDICT r4 #1)
run_job VR_dd25k 7500 $AB --steps 25000 --renderers VR_dd25k --epochs_save 313

# J5: the raymarcher arm (VERDICT missing #2 — never quality-trained)
run_job RM_dd 2500 $AB --steps 10000 --renderers Raymarcher_dd

# J6: multi-view endgame at the full 25k schedule (r4 stopped at 6k)
run_job AVRmv_dd 6000 $AB --steps 25000 --renderers AVRmv_dd \
  --num_source_views 2 --depth_consistency 0.5 --epochs_save 313

# J7: VR multi-view control
run_job VRmv_dd 7000 $AB --steps 10000 --renderers VRmv_dd \
  --num_source_views 2

touch "$Q/ALL_DONE"
echo "[queue] all done $(date +%H:%M:%S)" | tee -a "$Q/queue.log"
