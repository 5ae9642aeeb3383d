#!/bin/sh
# Round-5 post-campaign TPU pipeline (serial, one tunneled chip):
#   1. wrap-STE fine-tune from the haar422 construction
#   2. rebuild the constructor-profile release CDFs on the round-5 bank
#   3. regenerate the RD tables (docs/RESULTS.md, incl. wavelet + seed
#      variance rows)
#   4. full bench run captured to /tmp/bench_r5_local.json
#   5. regenerate README's benchmark section bracketing (r04, local)
set -x
cd "$(dirname "$0")/.."
export PYTHONUNBUFFERED=1

python scripts/train_intnet.py --init-haar haar422 --ent-warmup 2000 \
    --steps 30000 --rd-lambda 0.05 --lr 1e-3 --oob 0.3 \
    --log-every 1000 --out intnet_ft422

python scripts/build_wavelet_release.py

python scripts/make_results.py

python bench.py --verbose > /tmp/bench_r5_stdout.txt 2>/tmp/bench_r5_err.txt
tail -1 /tmp/bench_r5_stdout.txt | grep '"metric"' > /tmp/bench_r5_local.json
python scripts/update_readme_bench.py /tmp/bench_r5_local.json

echo PIPELINE-DONE
