#!/bin/bash
# Round-5 TPU artifact queue: run everything that needs the real chip, in
# dependency order, writing the round artifacts at the repo root.
# Usage: bash tools/r5_tpu_runs.sh [step ...]   (default: all)
set -x
cd "$(dirname "$0")/.."
steps="${@:-closedloop sqp iters2 suite vision bench}"

for s in $steps; do
  case "$s" in
    closedloop)
      # Revalidate the single-stream bench config (256x2, refac=4) at
      # reference criterion, seeds 0 and 7 (VERDICT r5 item 1 done-bar).
      GOALS=32 SAMPLES=256 PLAN_REFAC=4 FAIL_PEN=30 SEED=0 \
        OUT=EVAL_CLOSED_LOOP_r05.json \
        timeout 5400 python scripts/eval_closed_loop_batch.py
      GOALS=32 SAMPLES=256 PLAN_REFAC=4 FAIL_PEN=30 SEED=7 \
        OUT=EVAL_CLOSED_LOOP_r05.json \
        timeout 5400 python scripts/eval_closed_loop_batch.py
      ;;
    sqp)
      # SQP at the BASELINE H=32 config (EVAL artifact row).
      PLANNER=sqp GOALS=16 STEPS=120 HORIZON=32 ITERS=4 REFAC=4 SEED=0 \
        OUT=EVAL_ILQR_r05.json timeout 7200 python scripts/eval_ilqr.py
      ;;
    iters2)
      # Hybrid speed/quality at 2 refinement iterations.
      PLANNER=hybrid GOALS=24 STEPS=300 HORIZON=32 ITERS=2 REFAC=4 SEED=0 \
        OUT=EVAL_ILQR_r05.json timeout 7200 python scripts/eval_ilqr.py
      ;;
    suite)
      # Full-suite batched bench on the real chip at B=4096, with the
      # 8-device virtual-mesh section embedded and the 2-process
      # multihost row appended (BASELINE configs[4] fidelity).
      SUITE_OUT=SUITE_BENCH_r05.json SUITE_MULTIHOST=1 \
        SUITE_8DEV_JSON=SUITE_8DEV_r05.json \
        timeout 10800 python scripts/bench_suite.py
      ;;
    vision)
      BATCH=8 STEPS=20 timeout 3000 python tools/bench_vision.py \
        | tee VISION_BENCH_r05.txt
      ;;
    bench)
      BENCH_STREAMS=1 BENCH_SAMPLES=256 timeout 1800 python bench.py
      timeout 1800 python bench.py
      ;;
  esac
done
