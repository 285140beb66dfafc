#!/bin/bash
# Unattended on-chip validation + benchmark sequence. Run when the TPU
# relay is healthy:   bash scripts/tpu_runbook.sh [outdir]
# Produces: <outdir>/measure.json, bench_*.json, runbook.log
set -uo pipefail
OUT=${1:-tpu_reports}
mkdir -p "$OUT"
LOG="$OUT/runbook.log"
exec > >(tee -a "$LOG") 2>&1

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
timeout 90 python -c "
import time, numpy as np, jax, jax.numpy as jnp
t0=time.time(); y=jax.jit(lambda a:a+1)(jnp.ones((8,8)))
print('TPU alive:', float(np.asarray(y).sum()), f'{time.time()-t0:.1f}s')
print(jax.devices())" || { echo "TPU unhealthy; aborting"; exit 1; }

echo "--- measurement suite (352x640, incl. on-chip golden probe + f32 NaN check + train step)"
timeout 3600 python scripts/measure_tpu.py --res 352x640 \
    --sections basic,ops,pallas,model,golden,f32check,train \
    --out "$OUT/measure.json" || echo "measure failed (continuing)"

echo "--- bench bf16 352x640"
timeout 2400 python bench.py --res 352x640 --dtype bfloat16 \
    | tee "$OUT/bench_352x640_bf16.json" || true

echo "--- bench f32 352x640"
timeout 2400 python bench.py --res 352x640 --dtype float32 \
    | tee "$OUT/bench_352x640_f32.json" || true

echo "--- bench bf16 720p"
timeout 3000 python bench.py --res 720x1280 --dtype bfloat16 \
    | tee "$OUT/bench_720p_bf16.json" || true

echo "--- 720p instant-batch policy A/B (B=7 OOMs at 720p; t_map=B1 vs t_chunk=3)"
timeout 3000 python scripts/measure_tpu.py --res 720x1280 \
    --sections model --dtypes bfloat16 --t_map \
    --out "$OUT/measure_720p_tmap.json" || true
timeout 3000 python scripts/measure_tpu.py --res 720x1280 \
    --sections model --dtypes bfloat16 --t_chunk 3 \
    --out "$OUT/measure_720p_tchunk3.json" || true

echo "--- one-hot fwarp vertical-window sweep (K=(2D+1)(C+1) scales the GEMM)"
for D in 8 16 32; do
  timeout 2400 python scripts/time_fwarp_onehot.py --res 352x640 --B 7 \
      --D "$D" --out "$OUT/fwarp_onehot_D$D.json" || true
done

echo "--- one-hot fwarp D sweep at 720p, B=1 (CFR geometry for the 720p window)"
for D in 8 16 32; do
  timeout 2400 python scripts/time_fwarp_onehot.py --res 720x1280 --B 1 \
      --D "$D" --out "$OUT/fwarp_onehot_720p_D$D.json" || true
done

echo "--- bench at the D-sweep winner (only if a non-default D wins by >3%)"
WINNER=$(python - "$OUT" <<'EOF'
import glob, json, sys
best = (32, float("inf")); d32 = None
for f in glob.glob(f"{sys.argv[1]}/fwarp_onehot_D*.json"):
    if "720p" in f:
        continue
    try:
        r = json.load(open(f))
        ms = r.get("onehot_guarded_bf16_ms")
        if ms is None:
            continue
        if r["D"] == 32:
            d32 = ms
        if ms < best[1]:
            best = (r["D"], ms)
    except Exception:
        pass
print(best[0] if (d32 and best[1] < 0.97 * d32) else 32)
EOF
)
echo "D winner: $WINNER"
if [ "$WINNER" != "32" ]; then
  timeout 2400 env DEMFI_FWARP_ONEHOT_D="$WINNER" \
      python bench.py --res 352x640 --dtype bfloat16 \
      | tee "$OUT/bench_352x640_bf16_D$WINNER.json" || true
  timeout 3000 env DEMFI_FWARP_ONEHOT_D="$WINNER" \
      python bench.py --res 720x1280 --dtype bfloat16 \
      | tee "$OUT/bench_720p_bf16_D$WINNER.json" || true
fi

echo "--- 720p t_chunk refinement (chunk=3 won: probe 2,4; t_map won: probe 1,2 —"
echo "    the engine's auto policy picks chunk=3 at 720p, so a t_map win means"
echo "    the default needs retuning toward smaller instant batches)"
TCHUNK_WIN=$(python - "$OUT" <<'EOF'
import json, sys
def ms(path):
    try:
        r = json.load(open(path))
        for k, v in r.items():
            if k.startswith("window_x8_") and isinstance(v, (int, float)):
                return v
    except Exception:
        pass
    return None
tm = ms(f"{sys.argv[1]}/measure_720p_tmap.json")
tc = ms(f"{sys.argv[1]}/measure_720p_tchunk3.json")
print(1 if (tm and tc and tc < tm) else 0)
EOF
)
if [ "$TCHUNK_WIN" = "1" ]; then PROBES="2 4"; else PROBES="1 2"; fi
for TC in $PROBES; do
  timeout 3000 python scripts/measure_tpu.py --res 720x1280 \
      --sections model --dtypes bfloat16 --t_chunk "$TC" \
      --out "$OUT/measure_720p_tchunk$TC.json" || true
done

echo "--- fresh stage breakdown (re-rank Stage-II glue post one-hot fwarp)"
timeout 3600 python scripts/breakdown_tpu.py --res 352x640 \
    --stages warps,synth --out "$OUT/breakdown.json" || true

echo "--- e2e CLI smoke on-chip (full --phase test_custom surface, both dtypes)"
timeout 1800 python scripts/e2e_tpu_smoke.py --res 192x320 \
    --dtype bfloat16 --out "$OUT/e2e_smoke_bf16.json" || true
timeout 1800 python scripts/e2e_tpu_smoke.py --res 192x320 \
    --dtype float32 --out "$OUT/e2e_smoke_f32.json" || true

echo "--- summary"
python scripts/analyze_runbook.py "$OUT" || true

echo "--- committing artifacts (so results survive even with no session active)"
git add -A "$OUT" && git commit -m "tpu runbook results ($(date -u +%FT%TZ)): on-chip measure/bench/sweep artifacts" || echo "commit skipped"

echo "=== runbook done $(date -u +%FT%TZ) ==="
