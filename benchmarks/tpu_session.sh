#!/bin/bash
# One-shot TPU measurement session — run the moment the axon tunnel is up.
# Everything sequential (1-core host: NEVER two TPU processes at once).
# Outputs land in benchmarks/logs/tpu_*.log; summarize into RESULTS.md after.
#
# RESUMABLE: re-running with the same tag skips every leg already rc=0, so
# a mid-session tunnel wedge (it has died mid-session in 3 of 4 rounds)
# costs only the unfinished legs. probe_or_exit aborts with rc=3 the
# moment a tiny matmul probe wedges, instead of burning every remaining
# leg's timeout — the watcher (/tmp/tpu_watch_run.sh) then re-probes and
# re-invokes this script with the SAME tag when the tunnel returns.
set -x
cd "$(dirname "$0")/.."
mkdir -p benchmarks/logs
TAG=${1:-r05}
STATUS="benchmarks/logs/tpu_${TAG}_status.log"

ok() { grep -q "rc=0 tag=${1}\$" "$STATUS" 2>/dev/null; }

run() { # run <tag> <timeout_s> <cmd...>
  local tag=$1 to=$2; shift 2
  if ok "$tag"; then echo "skip tag=${tag} (already ok)"; return 0; fi
  timeout "$to" "$@" > "benchmarks/logs/tpu_${TAG}_${tag}.log" 2>&1
  echo "rc=$? tag=${tag}" | tee -a "$STATUS"
}

run_tpu() { # run, but green ONLY if the log evidences a tpu backend:
  # bench.py degrades to CPU honestly (rc=0), which must not mark the
  # leg ok in this ledger or the resume would skip the real measurement
  # (observed: r05 bench_full fell to CPU mid-window, 03:01 UTC)
  local tag=$1
  run "$@"
  if ok "$tag" && ! grep -q "backend tpu" \
      "benchmarks/logs/tpu_${TAG}_${tag}.log"; then
    sed -i "/rc=0 tag=${tag}\$/d" "$STATUS"
    echo "rc=9 tag=${tag}" | tee -a "$STATUS"   # cpu-fallback: re-run
  fi
}

probe_or_exit() { # cheap health gate between phases (150s-boxed matmul)
  if timeout 150 python -c "
import jax, jax.numpy as jnp
jax.devices()
x = jnp.ones((128, 128), jnp.bfloat16)
print('OK', float((x @ x).sum()))
" 2>&1 | grep -q '^OK'; then return 0; fi
  echo "WEDGED at $(date -u +%H:%M:%S) — aborting (resume: same tag)" \
    | tee -a "$STATUS"
  python benchmarks/summarize_session.py "$TAG" \
    > "benchmarks/logs/tpu_${TAG}_digest.md" 2>&1
  exit 3
}

# 0. is Mosaic healthy on this tunnel? (separates infra from kernel bugs)
run probe        600  python benchmarks/tpu_pallas_probe.py
# 1. headline bench (R inversion; picks the faster parity-tested path)
run_tpu bench    2400 python bench.py
# 2'. DECISION-CRITICAL round-4/5 legs FIRST, each a small bite: the r05
#     tunnel gives ~13-min health windows (02:48-03:01 UTC), so the legs
#     that answer open axes (VERDICT r4 items 2-5) must not queue behind
#     the 30-60 min bench_full/ablate/matrix bites. Each kernel_check
#     leg is a handful of small-program compiles.
run g_breakdown  1800 python benchmarks/g_breakdown.py
run s3_packed    1800 python benchmarks/tpu_kernel_check.py s3_packed
run recall_guard 1200 python benchmarks/tpu_kernel_check.py recall_guard
probe_or_exit
run co64_packed  1800 python benchmarks/tpu_kernel_check.py co64_packed
# round-5: int8 weight+activation eval paths (ops/quant.py) — v5e MXU
# does int8 at 2x bf16; these legs answer whether XLA routes int8 convs
# onto it, with the ranking-recall quality gate in the same record
run int8_r       1800 python benchmarks/tpu_kernel_check.py int8_r
run int8_g       1800 python benchmarks/tpu_kernel_check.py int8_g
run e2e_int8     2400 python benchmarks/tpu_kernel_check.py e2e_int8
probe_or_exit
run convbn       2400 python benchmarks/convbn_probe.py
run ablate       3600 python benchmarks/train_ablate.py
# 2. full bench: all G legs + the MEASURED fused e2e program (item 2);
#    --mesh_data 1 also times the distributed shard_map e2e on the one
#    chip (its delta vs the plain fused program = collective-wrapping
#    overhead, the evidence behind the x8 pod projection)
probe_or_exit
run_tpu bench_full 3600 python bench.py --full --mesh_data 1
# 3. the six-config matrix (training rates, inversion pipeline, refinement)
probe_or_exit
run matrix       7200 python benchmarks/matrix.py
# 4. round-3: wide-D pixel-similarity selection shot (VERDICT r2 item 8)
run pixel_topk   1800 python benchmarks/tpu_kernel_check.py pixel_topk
# 4b. TPU-native approximate k-selection vs exact (time + measured recall)
# (recall_guard moved to the decision-critical block above)
run approx_topk  1800 python benchmarks/tpu_kernel_check.py approx_topk
# 5. training-step roofline (item 3) — one section per process: a wedged
#    remote compile (observed live: scan program hung 30+ min at 0% CPU)
#    then burns one small timeout instead of the whole phase
probe_or_exit
run roofline_d   1500 python benchmarks/roofline.py d
run roofline_g   1500 python benchmarks/roofline.py g
run roofline_dg  1500 python benchmarks/roofline.py dg
run roofline_r   1500 python benchmarks/roofline.py r
run roofline_f32 2400 python benchmarks/roofline.py --f32 dg
# 5a. (ablate/convbn/g_breakdown/s3_packed moved up to 2' — decision-
#     critical legs run before the matrix)
# 5b. kernel tile sweeps (round-2 parity maintenance — keep, cheaper now)
run up_stages    1800 python benchmarks/tpu_kernel_check.py upsample_stages
run cb_stages    1800 python benchmarks/tpu_kernel_check.py conv_block_stages
# 5. production pipeline ON HARDWARE at the flagship geometry (bf16):
#    round 2 proved this catches bugs CPU interpret tests cannot (the
#    pixel-similarity VMEM blowout) — keep it in every session
probe_or_exit
# keep artifacts across resumes: later legs consume earlier legs' outputs,
# so only clear when the producing leg itself is about to re-run
E2E=/tmp/tpu_session_e2e; ok e2e_train || rm -rf "$E2E"
run e2e_train    1800 python -m ganreverser_tpu.cli.train \
  --dataset synthetic --save "$E2E/logs" --epochs 2 --N_epoch 5 \
  --batchSize 32 --noiseDim 100 --saveFreq 1 --colorSpace rgb \
  --height 64 --width 64 --compute_dtype bfloat16
run e2e_train_r  1800 python -m ganreverser_tpu.cli.train_r \
  --G "$E2E/logs/adversarial" --save "$E2E/logs" --nbBatches 50 \
  --batchSize 32 --saveFreq 50 --dataset synthetic \
  --compute_dtype bfloat16
run e2e_apply    2400 python -m ganreverser_tpu.cli.apply_r \
  --G "$E2E/logs/adversarial" --save "$E2E/logs" \
  --writeto "$E2E/apply_out" --N 2048 --clusters 4 --kmeans_iters 5 \
  --needles 2 --anomalies_n 256 --batchSize 256 --refine_steps 5 \
  --pallas --compute_dtype bfloat16
# round-3: the approx k-selection CLI path (the NHWC->flat + approx_max_k
# chain that needs _select_topk's optimization_barrier — TPU-only bug)
run e2e_apply_ax 2400 python -m ganreverser_tpu.cli.apply_r \
  --G "$E2E/logs/adversarial" --save "$E2E/logs" \
  --writeto "$E2E/apply_ax" --N 2048 --clusters 4 --kmeans_iters 5 \
  --needles 2 --anomalies_n 256 --batchSize 256 \
  --approx --recall_target 0.95 --compute_dtype bfloat16
# round-5: the user-reachable int8 serving path on device (the program
# itself is A/B'd + recall-gated by the e2e_int8 leg above)
run e2e_apply_i8 2400 python -m ganreverser_tpu.cli.apply_r \
  --G "$E2E/logs/adversarial" --save "$E2E/logs" \
  --writeto "$E2E/apply_i8" --N 2048 --clusters 4 --kmeans_iters 5 \
  --needles 2 --anomalies_n 256 --batchSize 256 \
  --int8 --compute_dtype bfloat16
# round-5: serving artifact export + reload ON DEVICE (cli/export.py —
# the artifact's tpu lowering deserializes and matches the live program)
run e2e_export   1800 python -m ganreverser_tpu.cli.export \
  --G "$E2E/logs/adversarial" --save "$E2E/logs" \
  --out "$E2E/serve_invert" --what invert --batch 256 \
  --compute_dtype bfloat16 --check
# round-5: the Torch7 drop-in path ON DEVICE (VERDICT r4 item 6):
# reference-layout .net files (GPU nn.Copy wrappers, full saved opt) ->
# import_t7 -> sample + apply_r on the IMPORTED checkpoints, real chip.
probe_or_exit
T7=/tmp/tpu_session_t7; ok t7_make || rm -rf "$T7"
run t7_make      600  python benchmarks/make_t7_fixture.py "$T7" \
  --height 32 --width 32 --nd 32
run t7_import_g  600  python -m ganreverser_tpu.cli.import_t7 \
  "$T7/adversarial.net" --out "$T7/logs"
run t7_import_r  600  python -m ganreverser_tpu.cli.import_t7 \
  "$T7/r_3x32x32_nd32_normal.net" --out "$T7/logs"
run t7_import_rf 600  python -m ganreverser_tpu.cli.import_t7 \
  "$T7/r_3x32x32_nd32_normal_fixer.net" --out "$T7/logs"
run t7_sample    1800 python -m ganreverser_tpu.cli.sample \
  --network "$T7/logs/adversarial" --writeto "$T7/samples" \
  --dataset synthetic
run t7_apply     2400 python -m ganreverser_tpu.cli.apply_r \
  --G "$T7/logs/adversarial" --save "$T7/logs" --writeto "$T7/apply" \
  --N 1024 --clusters 4 --kmeans_iters 5 --needles 2 \
  --anomalies_n 256 --batchSize 256
# digest every leg (JSON metrics + rc ledger) into one markdown summary —
# host-side only, cheap; this is the artifact RESULTS.md sections start from
python benchmarks/summarize_session.py "$TAG" \
  > "benchmarks/logs/tpu_${TAG}_digest.md" 2>&1
echo done
