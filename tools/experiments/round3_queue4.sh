#!/bin/bash
# Round-3 queue, part 4 — the re-run of the interrupted sigma_y=0.2 hq
# serving probe (queue2 was killed after its warmup) plus all of queue3's
# scan-driver numerics controls, in one launch. One TPU process at a time
# (axon); host CPU must be otherwise idle — this dev host has ONE core.
set -u
cd "$(dirname "$0")/../.."

run() { # name, cmd...
  local name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))"
  timeout 7200 "$@" > "/tmp/r3_${name}.log" 2>&1
  echo "--- exit $? ($(date +%H:%M:%S)); tail:"
  tail -3 "/tmp/r3_${name}.log"
}

# scan-vs-host numerics controls (docs/PERFORMANCE.md "Scan vs host"):
# 1 fp32 step = bare fusion delta, no chaotic amplification possible
run scan_1step_fp32 python tools/experiments/scan_on_tpu.py --t_sampling 1 --dtype float32
# trained mid64 fixture = contractive denoiser; end-metric must agree
run scan_mid_bf16 python tools/experiments/scan_on_tpu.py --trained mid64
run scan_mid_fp32 python tools/experiments/scan_on_tpu.py --trained mid64 --dtype float32

# item 4 completion: noisy (sigma_y=0.2, per-singular Lambda path) hq
# posterior serving at saturating load
run hqserve_noisy python tools/experiments/serve_load_tpu.py 64 300 --hq --sigma_y 0.2

# serve.py --loop scan end-to-end under saturating load: same steady
# img/s as the host-driven service, much faster warm start
run serve_scan python tools/experiments/serve_load_tpu.py 64 300 --loop scan

echo "=== queue4 done ($(date +%H:%M:%S))"
