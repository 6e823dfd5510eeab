#!/usr/bin/env bash
# Remaining round-2 grid rows with fault recovery.  Sporadic TPU device
# faults (UNAVAILABLE kernel fault, infra-level) kill long processes, so
# every row runs under a retry loop and every runner persists/reloads
# partial progress (run_ablation.py: per-value resume;
# run_campaign_validation.py: per-iteration campaign checkpoints).
set -u
cd "$(dirname "$0")/.."

retry() {
    local name="$1"; shift
    for attempt in 1 2 3 4 5 6; do
        echo "=== ${name} attempt ${attempt} $(date -u +%H:%M:%S)"
        if timeout 5400 python "$@"; then
            echo "=== ${name} done"
            return 0
        fi
        echo "=== ${name} attempt ${attempt} failed; retrying"
        sleep 15
    done
    echo "=== ${name} FAILED after 6 attempts"
    return 1
}

retry branin_m64 scripts/run_ablation.py --benchmark Branin --axis tasks \
    --values 64 --points 32 --sigma 1.0 --evals 40 --studies 16 \
    --optimum-method device --out docs/branin_ablation_tasks_m64_tpu.json

retry branin_n256 scripts/run_ablation.py --benchmark Branin --axis points \
    --values 256 --tasks 8 --sigma 1.0 --evals 40 --studies 16 \
    --optimum-method device --out docs/branin_ablation_points_n256_tpu.json

retry hm6_abl_tasks scripts/run_ablation.py --benchmark Hartmann6D \
    --axis tasks --values 2 4 8 16 32 64 --points 128 --sigma 0.1 \
    --evals 80 --studies 16 --optimum-method device --meta-fit-chunks 4 \
    --out docs/hm6_ablation_tasks_tpu.json

retry hm6_abl_points scripts/run_ablation.py --benchmark Hartmann6D \
    --axis points --values 16 32 64 128 256 512 --tasks 8 --sigma 0.1 \
    --evals 80 --studies 16 --optimum-method device --meta-fit-chunks 4 \
    --out docs/hm6_ablation_points_tpu.json

retry hm6_t8_128 scripts/run_campaign_validation.py \
    --benchmark Hartmann6D --tasks 8 --points 128 --sigma 0.1 --evals 80 \
    --studies 128 --optimum-method device --meta-fit-chunks 4 \
    --checkpoint /tmp/ckpt_hm6_t8 \
    --out docs/hm6_t8_p128_n01_regrets_tpu_128studies.npy

retry hm6_t32_128 scripts/run_campaign_validation.py \
    --benchmark Hartmann6D --tasks 32 --points 128 --sigma 0.1 --evals 80 \
    --studies 128 --optimum-method device --meta-fit-chunks 16 \
    --checkpoint /tmp/ckpt_hm6_t32 \
    --out docs/hm6_t32_p128_n01_regrets_tpu_128studies.npy

echo "=== round-3 remaining rows complete"
