#!/bin/bash
# Round-5 TPU job queue: quality A/B arms at chip-filling ray batches
# (VERDICT r4 tasks 1, 5, 6).  Jobs run sequentially; between jobs the
# queue waits while logs/r5_queue/PAUSE exists so interactive kernel
# measurements can borrow the chip.  Each job is timeout-wrapped so a
# wedged checkpoint save (the r4 VR_long failure mode) cannot stall the
# queue past its slack.
set -u
cd /root/repo
Q=logs/r5_queue
mkdir -p "$Q"
W=logs/quality_r5
AB="python scripts/quality_ab.py --workdir $W --ray_batch_size 1024"

gate() {  # wait while PAUSE file exists
  while [ -f "$Q/PAUSE" ]; do sleep 20; done
}

run_job() {  # run_job NAME TIMEOUT_S CMD...
  local name=$1 tmo=$2; shift 2
  gate
  if [ -f "$Q/done.$name" ]; then echo "[queue] skip $name (done)"; return; fi
  echo "[queue] start $name  $(date +%H:%M:%S)" | tee -a "$Q/queue.log"
  timeout "$tmo" "$@" > "$Q/$name.log" 2>&1
  local rc=$?
  echo "[queue] end   $name rc=$rc  $(date +%H:%M:%S)" | tee -a "$Q/queue.log"
  [ $rc -eq 0 ] && touch "$Q/done.$name"
}

# J1: flagship adaptive arm, 25k steps, dc recipe, periodic ckpts every
#     ~5k steps (313 epochs x 16 steps/epoch) for wall-clock curves
run_job AVR_bb 5000 $AB --steps 25000 --renderers AVR_bb \
  --depth_consistency 0.5 --eps_scales 1.5,2 --epochs_save 313

# J2: classic renderer at its own converged 10k cosine schedule (the r4
#     quality target, re-measured at the big-batch protocol)
run_job VR_10k 5000 $AB --steps 10000 --renderers VR_10k

# J3: matched-steps converged control (the r4 VR_long that wedged),
#     periodic ckpts for the wall-clock curve
run_job VR_25k 9000 $AB --steps 25000 --renderers VR_25k --epochs_save 313

# J4: the raymarcher arm - the only reference renderer never
#     quality-trained here (VERDICT missing #2)
run_job RM_10k 3000 $AB --steps 10000 --renderers Raymarcher_bb

# J5: multi-view endgame: AVR_mv to the full 25k schedule (r4 stopped at 6k)
run_job AVR_mv 7000 $AB --steps 25000 --renderers AVR_mv \
  --num_source_views 2 --depth_consistency 0.5 --epochs_save 313

# J6: VR multi-view control (10k = its converged single-view schedule;
#     the 25k matched-steps control runs only if wall-clock remains)
run_job VR_mv 8000 $AB --steps 10000 --renderers VR_mv --num_source_views 2

touch "$Q/ALL_DONE"
echo "[queue] all done $(date +%H:%M:%S)" | tee -a "$Q/queue.log"
