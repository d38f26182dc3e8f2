#!/bin/bash
# Round-3 on-chip measurement queue (VERDICT r2 items #3, #5, #4, #8 + a
# flagship batch-16/32 probe). Runs each probe as its own process — the
# axon tunnel allows ONE TPU process at a time — and logs JSON to /tmp.
# Launch only when the chip is otherwise idle.
set -u
cd "$(dirname "$0")/../.."

run() { # name, cmd...
  local name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))"
  timeout 7200 "$@" > "/tmp/r3_${name}.log" 2>&1
  echo "--- exit $? ($(date +%H:%M:%S)); tail:"
  tail -3 "/tmp/r3_${name}.log"
}

# item 3: scan driver on the real chip (one-time scan compile, cached)
run scan python tools/experiments/scan_on_tpu.py

# item 5: extend the ADM cliff table to batch 16/32
run cliff16 python tools/experiments/adm_batch1_profile.py --batch 16 --no-trace
run cliff32 python tools/experiments/adm_batch1_profile.py --batch 32 --no-trace

# flagship batch probe: does the headline workload ride past batch 8?
run bench16 python bench.py --batch 16
run bench32 python bench.py --batch 32

# item 8: execute the CPU-built ("cpu","tpu") artifact on the chip
run artifact python tools/experiments/export_artifact_tpu.py --run

# item 4: saturate hq posterior serving (64 clients >= 8x max_batch),
# noise-free and noisy
run hqserve python tools/experiments/serve_load_tpu.py 64 300 --hq
run hqserve_noisy python tools/experiments/serve_load_tpu.py 64 300 --hq --sigma_y 0.2

echo "=== queue done ($(date +%H:%M:%S))"
