#!/bin/bash
# Round-3 measurement sequence for TPU-tunnel return (see docs/STATUS.md
# "Round 3 continuation"). Run from the repo root:
#   nohup bash tools/round3_measure.sh > /tmp/measure.log 2>&1 &
# Priority order: (1) warm the driver-default bench path, (2) wire-v4
# ceilings, (3) e2e benches, (4) fused-block kernel A/B, (5) train warm.
# Every step is cache-persistent (enable_compilation_cache) — a rerun
# after interruption skips completed compiles.
set -x
cd "$(dirname "$0")/.."

stamp() { date +%H:%M:%S; }

echo "=== $(stamp) 1. prewarm bench-default (jpegdct v3) ==="
timeout 4800 python tools/prewarm_cache.py --transfer jpegdct --skip-train

echo "=== $(stamp) 2. v3 ceilings (device / upload) ==="
timeout 2400 python tools/jpegdct_ceiling.py --mode device
timeout 2400 python tools/jpegdct_ceiling.py --mode upload

echo "=== $(stamp) 3. v4 ceilings (device / upload) ==="
timeout 3600 python tools/jpegdct_ceiling.py --transfer jpegdct4 --mode device
timeout 2400 python tools/jpegdct_ceiling.py --transfer jpegdct4 --mode upload

echo "=== $(stamp) 4. e2e bench v3 then v4 ==="
timeout 3600 python bench.py
BENCH_TRANSFER=jpegdct4 timeout 3600 python bench.py

echo "=== $(stamp) 5. standalone kernel A/B (fast compiles; decides which"
echo "    full-pyramid fused config is worth its 400-900 s cold compile) ==="
timeout 2400 python tools/fused_block_bench.py --stage layer1
timeout 2400 python tools/fused_block_bench.py --stage layer2
echo "=== $(stamp) 5b. full-pyramid fused-blocks A/B: run MANUALLY for the"
echo "    winning variant only, e.g.:"
echo "    python tools/jpegdct_ceiling.py --mode device --fused-blocks on --fused-impl blocked ==="

echo "=== $(stamp) 6. train-step warm (bench_train path) ==="
timeout 3600 python tools/prewarm_cache.py --transfer yuv420 --skip-eval

echo "=== $(stamp) done ==="
