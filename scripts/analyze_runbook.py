"""Summarize a tpu_runbook.sh output directory into one readable table.

Usage: python scripts/analyze_runbook.py [tpu_reports]

Reads whatever artifacts exist (missing ones are skipped) and prints:
- headline bench lines (352x640 bf16/f32, 720p bf16) with vs_baseline,
- the 720p instant-batch policy A/B (t_map vs t_chunk window ms),
- the one-hot fwarp D sweep at both geometries (winner flagged),
- golden-probe / f32check verdicts from measure.json,
- the fresh stage breakdown, sorted by cost.

Pure stdlib; no JAX import (safe to run while the relay is wedged).
"""
import glob
import json
import os
import sys


def _load(path):
    if not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            txt = f.read().strip()
        try:
            return json.loads(txt)          # plain / pretty-printed JSON
        except json.JSONDecodeError:
            pass
        # bench files may hold one JSON line surrounded by log noise
        for line in txt.splitlines():
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line)
        raise ValueError("no JSON object found")
    except Exception as e:  # noqa: BLE001 - report and continue
        print(f"  [unreadable: {path}: {e}]")
        return None


def main(out="tpu_reports"):
    if not os.path.isdir(out):
        print(f"no {out}/ directory — runbook has not fired yet")
        return 1

    print(f"== runbook summary: {out}/ ==")

    print("\n-- bench headlines")
    for name in ("bench_352x640_bf16.json", "bench_352x640_f32.json",
                 "bench_720p_bf16.json",
                 # round-4 default-formulation A/Bs (prior forms)
                 "bench_352x640_bf16_gruSplit.json",
                 "bench_352x640_bf16_noBwOnehot.json"):
        d = _load(os.path.join(out, name))
        if d:
            err = f"  ERROR: {d['error']}" if "error" in d else ""
            print(f"  {name}: {d.get('value')} {d.get('unit')} "
                  f"(vs_baseline {d.get('vs_baseline')}){err}")

    print("\n-- 720p instant-batch policy A/B (model window ms)")
    for name, lbl in (("measure_720p_tmap.json", "t_map (B=1 serial)"),
                      ("measure_720p_tchunk3.json", "t_chunk=3")):
        d = _load(os.path.join(out, name))
        if d:
            model = d.get("model", d)
            ms = {k: v for k, v in model.items() if k.endswith("_ms")}
            print(f"  {lbl}: {json.dumps(ms)}")

    for pat, lbl in (("fwarp_onehot_D*.json", "352x640 B=7"),
                     ("fwarp_onehot_720p_D*.json", "720p B=1")):
        files = sorted(glob.glob(os.path.join(out, pat)))
        if not files:
            continue
        print(f"\n-- one-hot fwarp D sweep ({lbl})")
        best = (None, float("inf"))
        for f in files:
            d = _load(f)
            if not d:
                continue
            ms = {k: v for k, v in d.items()
                  if k.endswith("_ms") and "floor" not in k}
            key = min(ms.values()) if ms else float("inf")
            if key < best[1]:
                best = (os.path.basename(f), key)
            print(f"  {os.path.basename(f)}: {json.dumps(ms)}")
        if best[0]:
            print(f"  WINNER: {best[0]} ({best[1]:.1f} ms)")

    # Keys the full measurement suite (runbook sections basic,ops,model,
    # golden,f32check,train) is REQUIRED to produce. An incomplete run
    # (relay outage mid-suite) must say MISSING loudly — round-3 advisor
    # finding: a silent skip made a truncated measure.json look clean.
    required = ("fps_bf16", "window_x8_bf16_ms", "golden_bf16_ok",
                "golden_f32_ok", "f32_352x640_finite",
                "train_loss_finite_bf16", "train_loss_finite_f32",
                # bf16 serving-mode dB certification (round-4 VERDICT #2)
                "psnr_bf16_vs_f32_db", "bf16_measured_shift_db",
                "bf16_headline_label")
    optional = ("fps_f32", "window_x8_f32_ms",
                "golden_bf16_worst_absdiff", "golden_f32_worst_absdiff",
                "train_step_b4_256_bf16_ms", "train_step_b2_256_f32_ms",
                # fallback-ladder rungs (measure_tpu walks remat/batch
                # fallbacks when the plain step OOMs at compile)
                "train_step_b4_256_bf16_remat_ms",
                "train_step_b2_256_f32_remat_ms",
                "train_step_b2_256_bf16_remat_ms",
                "train_step_b1_256_f32_remat_ms")
    incomplete = False
    m = _load(os.path.join(out, "measure.json"))
    if m:
        print("\n-- measure.json verdicts (flat keys)")
        for k in required:
            if k in m:
                print(f"  {k:32s} {m[k]}")
            else:
                print(f"  {k:32s} MISSING (suite did not complete)")
                incomplete = True
        for k in optional:
            if k in m:
                print(f"  {k:32s} {m[k]}")
        for k in sorted(m):
            if "error" in k:  # section-isolated failures are loud, not lost
                print(f"  {k:32s} ERROR: {str(m[k])[:160]}")
    else:
        print("\n-- measure.json verdicts: MISSING ENTIRELY")
        incomplete = True
    if incomplete:
        print("  WARNING: measurement suite incomplete — re-run "
              "`python scripts/measure_tpu.py --res 352x640 --sections "
              "basic,ops,model,golden,f32check,train` before trusting "
              "this snapshot")

    f32r = _load(os.path.join(out, "f32_repro.json"))
    if f32r:
        print("\n-- f32 miscompile repro (scripts/f32_repro.py)")
        for k in ("c1_gather_blend_fused", "c2_gather_blend_guarded",
                  "c3_model_full"):
            v = f32r.get(k)
            if isinstance(v, dict):
                s = ("CLEAN" if v.get("clean")
                     else v.get("error", f"DIRTY {v.get('nonfinite')}"
                                f"/{v.get('total')}"))
                print(f"  {k:28s} {s}")
        if f32r.get("all_clean"):
            print("  toolchain FIXED: retire the engine f32 reroute "
                  "(_F32_TPU_SAFE_PIXELS)")

    smokes = [n for n in ("e2e_smoke_bf16.json", "e2e_smoke_f32.json")
              if os.path.exists(os.path.join(out, n))]
    if smokes:
        print("\n-- e2e CLI smoke (--phase test_custom on-chip)")
        for name in smokes:
            d = _load(os.path.join(out, name))
            if d:
                print(f"  {name}: ok={d.get('ok')} n_pngs={d.get('n_pngs')} "
                      f"backend={d.get('backend')} wall={d.get('wall_s')}s")

    b = _load(os.path.join(out, "breakdown.json"))
    if b:
        print("\n-- stage breakdown (sorted)")
        ms = sorted(((v, k) for k, v in b.items()
                     if isinstance(v, (int, float)) and k.endswith("_ms")),
                    reverse=True)
        for v, k in ms:
            print(f"  {k:40s} {v:9.2f}")
    # exit 2 = artifacts exist but the required measurement keys are
    # absent; the runbook uses this to label its auto-commit honestly
    return 2 if incomplete else 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
