#!/bin/bash
# Unattended on-chip validation + benchmark sequence. Run when the TPU
# relay is healthy:   bash scripts/tpu_runbook.sh [outdir]
# Produces: <outdir>/measure.json, bench_*.json, f32_repro.json, runbook.log
set -uo pipefail
OUT=${1:-tpu_reports}
mkdir -p "$OUT"
LOG="$OUT/runbook.log"
# strip ANSI escapes (the axon compile-helper colors its warnings) so the
# committed log diffs clean
exec > >(sed -u $'s/\x1b\[[0-9;]*[A-Za-z]//g' | tee -a "$LOG") 2>&1

echo "=== TPU runbook $(date -u +%FT%TZ) ==="

# 1-core box: a concurrently-running pytest suite times compiles out in
# both directions. If a tracked foreground pytest is alive, wait for it
# (bounded) before grabbing the core.
PYPID=$(cat /tmp/pytest.pid 2>/dev/null || true)
if [ -n "${PYPID:-}" ] && kill -0 "$PYPID" 2>/dev/null; then
  echo "--- waiting for pytest (pid $PYPID) to release the core"
  for _ in $(seq 1 360); do
    kill -0 "$PYPID" 2>/dev/null || break
    sleep 10
  done
fi

echo "--- health check"
# fresh relay connections can take minutes when the relay is loaded
# (2026-08-19: probes timed out at 90 s while a held connection worked
# fine) — retry 3x with a generous budget before declaring it wedged
HEALTHY=0
for _try in 1 2 3; do
  if timeout 300 python -c "
import time, numpy as np, jax, jax.numpy as jnp
t0=time.time(); y=jax.jit(lambda a:a+1)(jnp.ones((8,8)))
print('TPU alive:', float(np.asarray(y).sum()), f'{time.time()-t0:.1f}s')
print(jax.devices())"; then HEALTHY=1; break; fi
  echo "--- health probe $_try timed out; retrying"
  sleep 60
done
[ "$HEALTHY" = "1" ] || { echo "TPU unhealthy; aborting"; exit 1; }

echo "--- measurement suite (352x640, incl. on-chip golden probe + f32 NaN check + train step)"
MEASURE_CMD="python scripts/measure_tpu.py --res 352x640 \
    --sections basic,ops,pallas,model,golden,f32check,bf16db,train \
    --out $OUT/measure.json"
timeout 3600 $MEASURE_CMD || echo "measure failed (continuing)"
# required-key gate (round-3 advisor): a relay hiccup can truncate the
# suite while the JSON still parses — retry ONCE to completion
if ! python - "$OUT/measure.json" <<'EOF'
import json, sys
need = ("fps_bf16", "golden_bf16_ok", "golden_f32_ok",
        "f32_352x640_finite", "train_loss_finite_bf16",
        "psnr_bf16_vs_f32_db", "bf16_measured_shift_db",
        "bf16_headline_label")
try:
    m = json.load(open(sys.argv[1]))
except Exception:
    sys.exit(1)
sys.exit(0 if all(k in m for k in need) else 1)
EOF
then
  echo "--- measure.json incomplete; retrying the suite once"
  timeout 3600 $MEASURE_CMD || echo "measure retry failed (continuing)"
fi

echo "--- f32 miscompile repro (toolchain retirement test for the engine reroute)"
timeout 2400 python scripts/f32_repro.py --res 352x640 \
    --out "$OUT/f32_repro.json" || true

echo "--- bench bf16 352x640"
timeout 2400 python bench.py --res 352x640 --dtype bfloat16 \
    | tee "$OUT/bench_352x640_bf16.json" || true

echo "--- motion-calibration A/B at 352x640 (round-5: calibrated headline vs raw-init fallback path)"
timeout 2400 python bench.py --res 352x640 --dtype bfloat16 --raw_flows \
    | tee "$OUT/bench_352x640_bf16_rawflows.json" || true

echo "--- bench bf16 720p (the BASELINE headline geometry; auto t_map)"
timeout 3600 python bench.py --res 720x1280 --dtype bfloat16 \
    | tee "$OUT/bench_720p_bf16.json" || true

echo "--- bench f32 352x640 (engine-reroute tiled path — the shipping f32)"
timeout 3000 python bench.py --res 352x640 --dtype float32 \
    | tee "$OUT/bench_352x640_f32.json" || true

echo "--- 720p model window: tiered one-hot fwarp A/B (default vs single-window D=32)"
timeout 3000 python scripts/measure_tpu.py --res 720x1280 \
    --sections model --dtypes bfloat16 --t_map \
    --out "$OUT/measure_720p_tmap.json" || true
timeout 3000 env DEMFI_FWARP_ONEHOT_D_SMALL=0 \
    python scripts/measure_tpu.py --res 720x1280 \
    --sections model --dtypes bfloat16 --t_map \
    --out "$OUT/measure_720p_tmap_notier.json" || true

echo "--- variant lab: agg3 lane-pad A/B (VERDICT r3 item 5 candidate)"
timeout 1800 python scripts/variant_lab.py --sections pad \
    --out "$OUT/variant_lab_pad.json" || true

echo "--- fresh stage breakdown (incl. Stage-I cumulative prefixes)"
timeout 3600 python scripts/breakdown_tpu.py --res 352x640 \
    --stages warps,synth,stage1,synth0cut \
    --out "$OUT/breakdown.json" || true

echo "--- train-side breakdown (fwd/bwd/opt split + scan/unroll + remat granularity)"
timeout 3600 python scripts/measure_tpu.py --res 352x640 \
    --sections trainbd --merge --out "$OUT/measure.json" || true

echo "--- eval dispatch-overlap probe (two-deep pipeline A/B vs device time)"
timeout 2400 python scripts/eval_overlap_probe.py --res 352x640 \
    --windows 4 --out "$OUT/eval_overlap.json" || true

echo "--- pallas compile-helper diagnosis (incl. gather-500 minimization ladder)"
timeout 2400 python scripts/pallas_diag.py || true

echo "--- e2e CLI smoke on-chip (full --phase test_custom surface, both dtypes)"
timeout 1800 python scripts/e2e_tpu_smoke.py --res 192x320 \
    --dtype bfloat16 --out "$OUT/e2e_smoke_bf16.json" || true
timeout 1800 python scripts/e2e_tpu_smoke.py --res 192x320 \
    --dtype float32 --out "$OUT/e2e_smoke_f32.json" || true

echo "--- summary"
python scripts/analyze_runbook.py "$OUT"
COMPLETE=$?

echo "--- committing artifacts (so results survive even with no session active)"
MSG="tpu runbook results ($(date -u +%FT%TZ)): on-chip measure/bench/repro artifacts"
if [ "$COMPLETE" != "0" ]; then
  MSG="$MSG [INCOMPLETE: required measurement keys missing — see analyzer]"
fi
git add -A "$OUT" && git commit -m "$MSG" || echo "commit skipped"

echo "=== runbook done $(date -u +%FT%TZ) ==="
