#!/bin/bash
# Round-3 queue, part 3 — driver-correctness controls for the scan-vs-host
# numerics question (docs/PERFORMANCE.md "Scan vs host, measured"):
#  - 1 step, fp32, flagship: no chaotic amplification is possible, so any
#    residual host-vs-scan delta IS the bare fusion difference;
#  - trained mid64 fixture, full 100-step horizon: a contractive denoiser
#    stops amplifying, and both drivers' restored-vs-gt PSNR must agree.
# One TPU process at a time (axon); host CPU otherwise idle.
set -u
cd "$(dirname "$0")/../.."

run() { # name, cmd...
  local name=$1; shift
  echo "=== $name: $* ($(date +%H:%M:%S))"
  timeout 7200 "$@" > "/tmp/r3_${name}.log" 2>&1
  echo "--- exit $? ($(date +%H:%M:%S)); tail:"
  tail -3 "/tmp/r3_${name}.log"
}

run scan_1step_fp32 python tools/experiments/scan_on_tpu.py --t_sampling 1 --dtype float32
run scan_mid_bf16 python tools/experiments/scan_on_tpu.py --trained mid64
run scan_mid_fp32 python tools/experiments/scan_on_tpu.py --trained mid64 --dtype float32

# the new serve.py --loop scan knob, end-to-end under saturating load:
# same steady img/s as the host-driven service, much faster warm start
run serve_scan python tools/experiments/serve_load_tpu.py 64 300 --loop scan

echo "=== queue3 done ($(date +%H:%M:%S))"
