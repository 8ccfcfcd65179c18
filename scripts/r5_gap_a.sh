#!/bin/bash
# Round-5 TPU gap A (after phase-1 AVR_bb): overhead diagnosis, march/gather
# A/B, and a device-data throughput probe — all serialized on the one chip.
set -u
cd /root/repo
mkdir -p logs

echo "=== overhead ==="
timeout 600 python scripts/bench_overhead_tpu.py 2>&1 | grep -v WARNING

echo "=== device-data probe (AVR, 400 steps @ 4x1024) ==="
rm -rf /tmp/ddprobe; mkdir -p /tmp/ddprobe
timeout 1200 python -m avr_tpu.cli.train \
  --root_dir /tmp/ddprobe --loss_mode both --renderer AVR_probe \
  --starting_epoch 0 --sl 128 --batch_size 4 --ray_batch_size 1024 \
  --epochs 25 --epochs_save 25 --samples_per_instance 8 --steps_print 50 \
  --steps_val 100000 --norm_type group --dtype bf16 --lr_schedule cosine \
  --ema_decay 0.999 --rng_mode legacy --seed 0 \
  --data logs/quality_r5/data/train.hdf5 --device_data \
  --depth_consistency 0.5 2>&1 | grep -E "train\]|error|Error" | tail -8

echo "=== ab_r5 (march wr + gather impls) ==="
AB_ITERS=40 timeout 3000 python scripts/ab_r5_tpu.py 2>&1 | grep -vE "WARNING|^$"

echo "=== gap A done ==="
