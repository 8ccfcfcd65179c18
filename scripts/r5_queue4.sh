#!/bin/bash
# Round-5 queue, phase 4: resume the wedged VR_dd25k from its epoch-626
# checkpoint (best-saves disabled — the wedge was a relay stall during a
# best-checkpoint write, the same failure as r4's VR_long), then the
# raymarcher arm and the trimmed multi-view arm.
set -u
cd /root/repo
Q=logs/r5_queue
W=logs/quality_r5
run_job() {
  local name=$1 tmo=$2; shift 2
  if [ -f "$Q/done.$name" ]; then echo "[queue] skip $name"; return; fi
  echo "[queue] start $name  $(date +%H:%M:%S)" | tee -a "$Q/queue.log"
  timeout "$tmo" "$@" > "$Q/$name.log" 2>&1
  local rc=$?
  echo "[queue] end   $name rc=$rc  $(date +%H:%M:%S)" | tee -a "$Q/queue.log"
  [ $rc -eq 0 ] && touch "$Q/done.$name"
}

run_job VRresume 3600 python -m avr_tpu.cli.train \
  --root_dir $W --loss_mode both --renderer VR_dd25k \
  --starting_epoch 626 --epochs 937 --schedule_total_epochs 1563 \
  --epochs_save 313 --sl 128 --batch_size 4 --ray_batch_size 1024 \
  --samples_per_instance 8 --steps_print 50 --steps_val 250 \
  --norm_type group --dtype bf16 --num_source_views 1 \
  --lr_schedule cosine --sigma_bias_init 0.5 --ema_decay 0.999 \
  --rng_mode legacy --seed 0 --device_data --no_save_best \
  --data $W/data/train.hdf5 --val_data $W/data/val.hdf5

run_job VRev 1500 bash -c "
python -m avr_tpu.cli.test --root_dir $W --renderer VR_dd25k --epoch 1563 \
  --data $W/data/val.hdf5 --sl 128 --norm_type group --num_source_views 1 \
  --lpips_weights $W/lpips_rand.npz > $Q/eval_VR_dd25k_raw.txt 2>&1
python -m avr_tpu.cli.test --root_dir $W --renderer VR_dd25k --epoch 1563 \
  --data $W/data/val.hdf5 --sl 128 --norm_type group --num_source_views 1 \
  --use_ema --lpips_weights $W/lpips_rand.npz > $Q/eval_VR_dd25k_ema.txt 2>&1
"

AB="python scripts/quality_ab.py --workdir $W --ray_batch_size 1024 --device_data"
run_job RM_dd 2500 $AB --steps 10000 --renderers Raymarcher_dd
run_job AVRmv10 2600 $AB --steps 10000 --renderers AVRmv10 \
  --num_source_views 2 --depth_consistency 0.5
touch "$Q/PHASE4_DONE"
