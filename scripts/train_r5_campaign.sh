#!/bin/sh
# Round-5 hyperprior retraining campaign (serial: one tunneled TPU chip).
#
# 1. All 8 release checkpoints retrain on the round-5 bank (flower.jpg
#    moved to the eval set, so the round-4 checkpoints have train/eval
#    leakage on the new .evalset).
# 2. Seed-variance runs for the lambda=0.01 pair (VERDICT r4 #4): seeds
#    1 and 2 for both models; seed 0 is the release run itself.
set -x
cd "$(dirname "$0")/.."

python scripts/train_release.py --steps 50000 --ckpt-root /tmp/runs_r5

for SEED in 1 2; do
  for M in hyperprior:scale meanscale:meanscale; do
    MODEL=${M%%:*}; NAME=${M##*:}
    python - <<EOF
import sys
sys.argv = ["x"]
from simple_image_compression_network_tpu import train_loop
from simple_image_compression_network_tpu.utils import train_ckpt
params = train_loop.main([
    "--model", "$MODEL", "--steps", "50000", "--rd-lambda", "0.01",
    "--bank", "mixed", "--seed", "$SEED",
    "--ckpt-dir", "/tmp/runs_r5/hp_${NAME}_l0.01_s$SEED",
    "--ckpt-every", "10000", "--log-every", "1000"])
train_ckpt.save_params(
    "checkpoints/hp_${NAME}_l0.01_s$SEED.params.msgpack", params)
print("saved checkpoints/hp_${NAME}_l0.01_s$SEED.params.msgpack")
EOF
  done
done
echo CAMPAIGN-DONE
