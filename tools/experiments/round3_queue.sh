#!/bin/bash
# Round-3 on-chip measurement queue (VERDICT r2 items #3, #5, #4, #8 + a
# flagship batch-16/32 probe). Runs each probe as its own process — the
# axon tunnel allows ONE TPU process at a time — and logs JSON to /tmp.
# Launch only when the chip AND the host CPU are otherwise idle: this dev
# host has ONE core, and the host-driven loops are dispatch-heavy, so a
# concurrent CPU job (e.g. a golden suite) skews every timing here.
set -u
cd "$(dirname "$0")/../.."

run() { # name, cmd...
  local name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))"
  timeout 7200 "$@" > "/tmp/r3_${name}.log" 2>&1
  echo "--- exit $? ($(date +%H:%M:%S)); tail:"
  tail -3 "/tmp/r3_${name}.log"
}

# item 3: scan driver on the real chip (one-time scan compile, cached).
# bf16 is the production config; the fp32 pass is the numerics control —
# host and scan compile different fusions, so bf16 trajectories diverge
# chaotically (random weights); fp32 agreement isolates driver correctness.
run scan python tools/experiments/scan_on_tpu.py
run scan_fp32 python tools/experiments/scan_on_tpu.py --dtype float32
# short horizon: 5 steps can't amplify ulp noise, so this isolates the
# drivers' step-level agreement from trajectory chaos
run scan_short python tools/experiments/scan_on_tpu.py --t_sampling 5

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
