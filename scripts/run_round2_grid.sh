#!/usr/bin/env bash
# Round-2 validation grid (VERDICT missing items 5/6): the reference rows not
# yet reproduced on chip — T32 variants, HM6 at 128 studies, both HM6
# ablations (incl. the N in {256,512} tail), and the M=64 / N=256 ablation
# tail points.  Sequential: one chip.
set -uo pipefail
cd "$(dirname "$0")/.."

run() { echo "=== $*"; timeout 5400 python "$@" || echo "FAILED: $*"; }

run scripts/run_campaign_validation.py --benchmark Hartmann3D --tasks 32 \
    --points 32 --sigma 0.1 --evals 40 --studies 128 --optimum-method device \
    --meta-fit-chunks 8 \
    --out docs/hm3_t32_p32_n01_regrets_tpu_128studies.npy

run scripts/run_campaign_validation.py --benchmark Hartmann6D --tasks 8 \
    --points 128 --sigma 0.1 --evals 80 --studies 128 --optimum-method device \
    --meta-fit-chunks 4 \
    --out docs/hm6_t8_p128_n01_regrets_tpu_128studies.npy

run scripts/run_campaign_validation.py --benchmark Hartmann6D --tasks 32 \
    --points 128 --sigma 0.1 --evals 80 --studies 128 --optimum-method device \
    --meta-fit-chunks 16 \
    --out docs/hm6_t32_p128_n01_regrets_tpu_128studies.npy

run scripts/run_ablation.py --benchmark Hartmann6D --axis tasks \
    --values 2 4 8 16 32 64 --points 128 --sigma 0.1 --evals 80 \
    --studies 16 --optimum-method device --meta-fit-chunks 4 \
    --out docs/hm6_ablation_tasks_tpu.json

run scripts/run_ablation.py --benchmark Hartmann6D --axis points \
    --values 16 32 64 128 256 512 --tasks 8 --sigma 0.1 --evals 80 \
    --studies 16 --optimum-method device --meta-fit-chunks 4 \
    --out docs/hm6_ablation_points_tpu.json

run scripts/run_ablation.py --benchmark Branin --axis tasks \
    --values 64 --points 32 --sigma 1.0 --evals 40 --studies 16 \
    --optimum-method device --out docs/branin_ablation_tasks_m64_tpu.json

run scripts/run_ablation.py --benchmark Branin --axis points \
    --values 256 --tasks 8 --sigma 1.0 --evals 40 --studies 16 \
    --optimum-method device --out docs/branin_ablation_points_n256_tpu.json

echo "=== grid complete"
