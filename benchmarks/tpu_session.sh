#!/bin/bash
# One-shot TPU measurement session — run the moment the axon tunnel is up.
# Everything sequential (1-core host: NEVER two TPU processes at once).
# Outputs land in benchmarks/tpu_r02_*.log; summarize into RESULTS.md after.
set -x
cd "$(dirname "$0")/.."
mkdir -p benchmarks/logs

run() { # run <tag> <timeout_s> <cmd...>
  local tag=$1 to=$2; shift 2
  timeout "$to" "$@" > "benchmarks/logs/tpu_r02_${tag}.log" 2>&1
  echo "rc=$? tag=${tag}" | tee -a benchmarks/logs/tpu_r02_status.log
}

# 1. kernel compile checks + timings (the VERDICT item-2 deliverable);
#    separate invocations: a Mosaic compile hang on one kernel (known
#    failure mode on odd tiles) must not eat the others' budget
run kernels_conv3x3    1200 python benchmarks/tpu_kernel_check.py conv3x3
run kernels_upsample   1200 python benchmarks/tpu_kernel_check.py upsample
run kernels_conv_block 1200 python benchmarks/tpu_kernel_check.py conv_block
# 2. headline bench (R inversion; picks the faster parity-tested path)
run bench        2400 python bench.py
# 3. full bench: G XLA vs Pallas + end-to-end rate
run bench_full   3600 python bench.py --full
# 4. the five-config matrix (fused paths + Pallas-vs-lax kmeans inside)
run matrix       5400 python benchmarks/matrix.py
echo done
