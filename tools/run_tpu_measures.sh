#!/bin/bash
# Round-3 pending on-TPU measures (docs/performance.md "Pending
# on-TPU measures"). Run when tools/relay_probe.py answers; one
# command, results logged. Each phase bounded so a relay stall cannot
# wedge the whole run. Remember: one process holds the chip at a time
# — do not run anything else TPU-bound concurrently.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
OUT=${1:-/tmp/tpu_measures_$(date +%m%d_%H%M).log}
{
  echo "== relay probe =="
  timeout 90 python tools/relay_probe.py || { echo "relay down"; exit 1; }

  echo "== pool-writer A/B refresh (xla/krn/bnd) + band tiling sweep =="
  timeout 5400 python tools/profile_search.py --corpus 1000000 \
    --pool_tiles b256x1024x4,b512x1024x4,b256x1024x8,512x1024x8

  echo "== serving mutation latency at 1M (f32) =="
  timeout 2400 python tools/scale_bench.py --corpus 1000000 --mutate

  echo "== serving mutation latency at 1M (bf16) =="
  timeout 2400 python tools/scale_bench.py --corpus 1000000 --mutate \
    --dtype bfloat16

  echo "== bench sanity (serving metrics included) =="
  timeout 2000 python bench.py
} 2>&1 | tee "$OUT"
echo "results: $OUT"
