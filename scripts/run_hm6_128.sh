#!/usr/bin/env bash
# HM6 at the full 128-study reference scale (grid rows that hit sporadic
# TPU device faults when run as one long process).  The campaign
# checkpoints every iteration, so each retry resumes where the fault hit
# instead of restarting — the failure-recovery drill (SURVEY section 5)
# applied to a real infrastructure fault.
set -u
cd "$(dirname "$0")/.."

run_resumable() {
    local name="$1"; shift
    local ckpt="/tmp/ckpt_${name}"
    rm -rf "${ckpt}"
    for attempt in 1 2 3 4 5 6 7 8; do
        echo "=== ${name} attempt ${attempt}"
        if timeout 5400 python "$@" --checkpoint "${ckpt}"; then
            echo "=== ${name} done (attempt ${attempt})"
            return 0
        fi
        echo "=== ${name} attempt ${attempt} failed; resuming from checkpoint"
        sleep 20
    done
    echo "=== ${name} FAILED after 8 attempts"
    return 1
}

run_resumable hm6_t8 scripts/run_campaign_validation.py \
    --benchmark Hartmann6D --tasks 8 --points 128 --sigma 0.1 --evals 80 \
    --studies 128 --optimum-method device --meta-fit-chunks 4 \
    --out docs/hm6_t8_p128_n01_regrets_tpu_128studies.npy

run_resumable hm6_t32 scripts/run_campaign_validation.py \
    --benchmark Hartmann6D --tasks 32 --points 128 --sigma 0.1 --evals 80 \
    --studies 128 --optimum-method device --meta-fit-chunks 16 \
    --out docs/hm6_t32_p128_n01_regrets_tpu_128studies.npy

echo "=== hm6 128-study rows complete"
