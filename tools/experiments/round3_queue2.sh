#!/bin/bash
# Round-3 queue, part 2 — the items the first queue run didn't reach
# (session ended mid-bench32), plus a short-horizon fp32 scan-vs-host
# probe to isolate driver correctness from bf16 trajectory chaos.
# One TPU process at a time (axon); host CPU must be otherwise idle.
set -u
cd "$(dirname "$0")/../.."

run() { # name, cmd...
  local name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))"
  timeout 7200 "$@" > "/tmp/r3_${name}.log" 2>&1
  echo "--- exit $? ($(date +%H:%M:%S)); tail:"
  tail -3 "/tmp/r3_${name}.log"
}

# driver correctness: 5 fp32 steps can't amplify ulp noise chaotically
run scan_short_fp32 python tools/experiments/scan_on_tpu.py --t_sampling 5 --dtype float32

# item 5 continuation: flagship batch-32 probe (first run was killed mid-warmup)
run bench32 python bench.py --batch 32

# item 8: execute the CPU-built ("cpu","tpu") artifact on the chip
run artifact python tools/experiments/export_artifact_tpu.py --run

# item 4: saturate hq posterior serving (64 clients >= 8x max_batch)
run hqserve python tools/experiments/serve_load_tpu.py 64 300 --hq
run hqserve_noisy python tools/experiments/serve_load_tpu.py 64 300 --hq --sigma_y 0.2

echo "=== queue2 done ($(date +%H:%M:%S))"
