"""One-shot on-chip measurement suite for DeMFI-TPU.

Methodology notes (this dev environment tunnels the TPU through a relay):
  - block_until_ready returns early here, and full-array device_get drags
    tens of MB through the tunnel — both poison naive timings. Every
    measurement below jits the workload with an on-device scalar
    reduction and times float() readbacks; the trivial-program latency
    floor is reported and subtracted where meaningful.

Usage: python scripts/measure_tpu.py [--res 352x640] [--out report.json]
"""
from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time

import numpy as np

import jax as _jax
try:
    _jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
except Exception:
    pass
if _os.environ.get("DEMFI_PLATFORM"):   # CPU smokes of new sections
    _jax.config.update("jax_platforms", _os.environ["DEMFI_PLATFORM"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=str, default="352x640")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--out", type=str, default="")
    ap.add_argument("--skip-pallas", action="store_true")
    ap.add_argument("--sections", type=str, default="basic,ops,pallas,model",
                    help="comma list of: basic, ops, pallas, model")
    ap.add_argument("--dtypes", type=str, default="bfloat16,float32")
    ap.add_argument("--merge", action="store_true",
                    help="start from the existing --out file if present")
    ap.add_argument("--bd_patch", type=int, default=256,
                    help="trainbd section: training crop size (default "
                         "= the reference's 256; small for CPU smokes)")
    ap.add_argument("--bd_batch", type=int, default=4,
                    help="trainbd section: per-chip batch")
    ap.add_argument("--t_map", action="store_true",
                    help="model section: run the 7 instants via lax.map "
                         "at B=1 instead of one B=7 batch (720p x8 at "
                         "B=7 exceeds HBM: 22.8G vs 15.75G)")
    ap.add_argument("--t_chunk", type=int, default=0,
                    help="model section: batch the instants in chunks of "
                         "this size (the engine's HBM-derived auto-chunk "
                         "policy; ~3 at 720p on v5e) instead of B=7 or "
                         "t_map's B=1")
    args = ap.parse_args()
    h, w = (int(x) for x in args.res.split("x"))

    import jax
    import jax.numpy as jnp

    sections = set(args.sections.split(","))
    report = {"res": f"{h}x{w}", "backend": jax.default_backend(),
              "device": str(jax.devices()[0])}
    if args.merge and args.out:
        try:
            with open(args.out) as f:
                prev = json.load(f)
            if prev.get("res") == report["res"]:
                report = prev
        except Exception:
            pass
    rng = np.random.RandomState(0)

    import sys as _s

    def put(key, val):
        report[key] = val
        print(f"  {key} = {val}", flush=True)
        if args.out:
            with open(args.out, "w") as f:
                json.dump(report, f, indent=1)
                f.write("\n")

    def scalar_time(fn, *a, n=args.iters, floor=0.0, inner=1):
        """Time fn via an on-device scalar reduction.

        ``inner`` repeats fn inside ONE jitted program (first arg perturbed
        per repeat to defeat CSE) so ops cheaper than the dispatch floor
        still measure: per-op time = (wall - floor) / inner."""
        def body(*a):
            s = jnp.float32(0)
            for i in range(inner):
                a0 = a[0] + jnp.asarray(i, a[0].dtype) * 1e-6 if inner > 1 else a[0]
                s = s + jnp.sum(jnp.asarray(
                    jax.tree_util.tree_leaves(fn(a0, *a[1:]))[0], jnp.float32))
            return s
        g = jax.jit(body)
        float(g(*a))
        t0 = time.time()
        for _ in range(n):
            float(g(*a))
        return max((time.time() - t0) / n - floor, 1e-9) / inner

    # 1. latency floor + tunnel bandwidth
    x_small = jnp.ones((8, 128))
    floor = scalar_time(lambda x: x + 1, x_small)
    put("dispatch_floor_ms", floor * 1000)
    if "basic" not in sections:
        pass  # floor still needed by later sections

    if "basic" in sections:
      big = jnp.ones((4096, 4096))  # 64 MB
      t0 = time.time()
      for _ in range(3):
          _ = np.asarray(jax.jit(lambda x: x * 2)(big))
      bw = 64.0 / ((time.time() - t0) / 3)
      put("tunnel_readback_MBps", bw)

    if "basic" in sections:
      # MXU sanity: chain of 32 bf16 4k matmuls (data dependence defeats
      # CSE; a single matmul is far below the dispatch floor on-chip)
      a = jnp.full((4096, 4096), 1e-3, jnp.bfloat16)

      def matmul_chain(a):
          x = a
          for _ in range(32):
              x = jnp.dot(x, a, preferred_element_type=jnp.float32
                          ).astype(jnp.bfloat16) * jnp.bfloat16(2.0 ** -10)
          return x

      dt = scalar_time(matmul_chain, a, floor=floor)
      put("bf16_4k_matmul_TFLOPs", 32 * 2 * 4096 ** 3 / dt / 1e12)

    # 2. warp ops: XLA vs pallas
    import os
    x64 = jnp.asarray(rng.randn(1, h, w, 64).astype(np.float32))
    flo = jnp.asarray((rng.randn(1, h, w, 2) * 5).astype(np.float32))
    x2 = jnp.asarray(rng.randn(1, h, w, 2).astype(np.float32))

    _prior_no_pallas = os.environ.get("DEMFI_NO_PALLAS")
    os.environ["DEMFI_NO_PALLAS"] = "1"
    import demfi_tpu.ops.warp as W
    if "ops" in sections:
      put("xla_bwarp64_ms", scalar_time(W.bwarp, x64, flo,
                                    floor=floor, inner=4) * 1000)
      put("xla_fwarp2_ms", scalar_time(W.fwarp, x2, flo,
                                   floor=floor, inner=4) * 1000)
      put("xla_abs64_ms", scalar_time(
        W.bilinear_sample_abs, x64,
        jnp.asarray((rng.randn(1, h, w, 2) * 8 + 4).astype(np.float32)),
        floor=floor, inner=4) * 1000)
    if _prior_no_pallas is None:
        del os.environ["DEMFI_NO_PALLAS"]
    else:
        os.environ["DEMFI_NO_PALLAS"] = _prior_no_pallas

    if "pallas" in sections and not args.skip_pallas:
      try:
        from demfi_tpu.ops.pallas_kernels import (
            bwarp_tpu, bilinear_sample_abs_tpu, fwarp_tpu)
        # correctness vs XLA first
        os.environ["DEMFI_NO_PALLAS"] = "1"
        want = np.asarray(W.bwarp(x64, flo))
        wantf, wantn = (np.asarray(v) for v in W.fwarp(x2, flo))
        coords_abs = jnp.asarray((rng.randn(1, h, w, 2) * 8 + 4
                                  ).astype(np.float32))
        wanta = np.asarray(W.bilinear_sample_abs(x64, coords_abs))
        del os.environ["DEMFI_NO_PALLAS"]
        got = np.asarray(bwarp_tpu(x64, flo))
        put("pallas_bwarp_maxerr", float(np.abs(got - want).max()))
        gotf, gotn = fwarp_tpu(x2, flo)
        put("pallas_fwarp_maxerr", float(
            np.abs(np.asarray(gotf) - wantf).max()))
        gota = np.asarray(bilinear_sample_abs_tpu(x64, coords_abs))
        put("pallas_abs_maxerr", float(np.abs(gota - wanta).max()))

        put("pallas_bwarp64_ms", scalar_time(
            bwarp_tpu, x64, flo, floor=floor, inner=4) * 1000)
        put("pallas_fwarp2_ms", scalar_time(
            fwarp_tpu, x2, flo, floor=floor, inner=4) * 1000)
        put("pallas_abs64_ms", scalar_time(
            bilinear_sample_abs_tpu, x64, coords_abs, floor=floor, inner=4) * 1000)
      except Exception as e:  # keep the rest of the report on failure
        import re as _re
        msg = _re.sub(r"\x1b\[[0-9;]*[A-Za-z]", "",
                      f"{type(e).__name__}: {str(e)[:400]}")
        put("pallas_error", msg[:300])
        os.environ["DEMFI_NO_PALLAS"] = "1"
        jax.clear_caches()

    # 3. model stages (both dtypes)
    from demfi_tpu.config import config_rb
    from demfi_tpu.models import make_model

    frames = jnp.asarray(rng.uniform(-1, 1, (1, 4, h, w, 3)).astype(np.float32))
    ts7 = jnp.asarray(np.linspace(1 / 8, 7 / 8, 7, dtype=np.float32))
    model_dtypes = (args.dtypes.split(",") if "model" in sections else ())
    for dt_name in model_dtypes:
        # unrolled booster = the inference engine's configuration
        # (scan blocks cross-iteration specialization, ~200 ms/window
        # slower at 352x640 — breakdown_r03.json scan-vs-unroll)
        cfg = config_rb(5, 3, compute_dtype=dt_name, scan_booster=False)
        model = make_model(cfg)
        params = model.init(jax.random.PRNGKey(0), frames[:, :, :64, :64],
                            jnp.zeros((1, 1)), num_update=1)
        # production-representative motion (bench.py rationale): the
        # random-init ~76 px flows otherwise time the unbounded quad
        # fallbacks a trained checkpoint never hits
        from demfi_tpu.utils.profiling import calibrate_flow_head
        params, raw_max = calibrate_flow_head(params, model, frames)
        put("raw_init_max_flow_px", raw_max)
        tag = "bf16" if dt_name == "bfloat16" else "f32"

        put(f"extract_{tag}_ms", scalar_time(
            lambda p, f: model.apply(p, f, method=model.extract),
            params, frames, floor=floor) * 1000)

        def window(p, f, ts):
            ctx = model.apply(p, f, method=model.extract)
            if args.t_map:
                def one(t):
                    o = model.apply(p, ctx, t[None], 3,
                                    method=model.synthesize)
                    return (jnp.sum(o.st_final.astype(jnp.float32))
                            + jnp.sum(o.st_prime.astype(jnp.float32)))
                return jax.lax.map(one, ts[:, None])
            if args.t_chunk:
                s = jnp.float32(0)
                for i in range(0, int(ts.shape[0]), args.t_chunk):
                    tc = ts[i:i + args.t_chunk]
                    cc = jax.tree_util.tree_map(
                        lambda x: jnp.repeat(x, tc.shape[0], axis=0), ctx)
                    o = model.apply(p, cc, tc[:, None], 3,
                                    method=model.synthesize)
                    s = s + (jnp.sum(o.st_final.astype(jnp.float32))
                             + jnp.sum(o.st_prime.astype(jnp.float32)))
                return s
            ctx = jax.tree_util.tree_map(
                lambda x: jnp.repeat(x, ts.shape[0], axis=0), ctx)
            out = model.apply(p, ctx, ts[:, None], 3,
                              method=model.synthesize)
            return out.st_final

        dtw = scalar_time(window, params, frames, ts7, floor=floor)
        put(f"window_x8_{tag}_ms", dtw * 1000)
        put(f"fps_{tag}", 7.0 / dtw)

    def _err_text(e):
        import re as _re
        return _re.sub(r"\x1b\[[0-9;]*[A-Za-z]", "",
                       f"{type(e).__name__}: {str(e)[:400]}")[:300]

    # golden + f32check run BEFORE the train probe: the train step is the
    # largest-footprint program in the suite and has OOM'd at compile time
    # (2026-08-19: f32 b2 missed HBM by 11.7 MB and took these correctness
    # sections down with it — the round-3 advisor's exact complaint).
    if "golden" in sections:
      try:
        # On-chip golden probe (round-2 VERDICT weak 5): the fixed-seed
        # forward's per-pixel probes must match the CPU-captured goldens
        # — drift or a miscompile on a toolchain bump fails HERE, not
        # silently in PSNR. f32 small-size is exact-ish on this chip;
        # bf16 gets a rounding-appropriate tolerance.
        import sys as _sys2
        _sys2.path.insert(0, _os.path.join(
            _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
            "tests"))
        from test_regression import GOLDEN_PATH, compute_stats
        with open(GOLDEN_PATH) as f:
            golden = json.load(f)
        got = compute_stats()
        worst = {k: max(abs(a - b) for a, b in zip(got[k], golden[k]))
                 for k in golden}
        put("golden_f32_worst_by_key", worst)
        put("golden_f32_worst_absdiff", max(worst.values()))
        # f32 matmuls/convs on TPU run bf16-ish passes under the relay's
        # forced --xla_allow_excess_precision (the model requests
        # precision HIGHEST, but the small-size probe still sees ~1e-3
        # drift vs the CPU goldens) — threshold accordingly
        put("golden_f32_ok", max(worst.values()) <= 5e-3)

        # bf16 methodology: per-pixel probes and abs-max stats are NOT
        # meaningful under bf16 — rounding a flow value changes WHICH
        # source pixel a warp samples, so isolated activations diverge
        # arbitrarily at motion edges while the field stays correct.
        # The honest bf16 invariants are the mean/std of each output.
        got_bf16 = compute_stats(dtype="bfloat16")
        worst16 = {k: max(abs(a - b) for a, b in
                          zip(got_bf16[k][:2], golden[k][:2]))
                   for k in golden
                   if not k.startswith("flow") and not k.endswith("_pix")}
        put("golden_bf16_meanstd_by_key", worst16)
        put("golden_bf16_worst_absdiff", max(worst16.values()))
        put("golden_bf16_ok", max(worst16.values()) <= 0.08)
      except Exception as e:  # isolate: later sections must still run
        put("golden_error", _err_text(e))
        jax.clear_caches()

    if "f32check" in sections:
      try:
        # On-chip golden-class probe for the round-2 f32 fusion
        # miscompile (ROUND2_NOTES.md "Open bug"): a full x8 window at
        # 352x640 float32 must produce finite Stage-II outputs. Run
        # whenever the toolchain bumps; a regression fails loudly here
        # instead of silently poisoning PSNR.
        cfg = config_rb(5, 3, compute_dtype="float32")
        model = make_model(cfg)
        params = model.init(jax.random.PRNGKey(0), frames[:, :, :64, :64],
                            jnp.zeros((1, 1)), num_update=1)

        def window_full(p, f, ts):
            ctx = model.apply(p, f, method=model.extract)
            ctx = jax.tree_util.tree_map(
                lambda x: jnp.repeat(x, ts.shape[0], axis=0), ctx)
            return model.apply(p, ctx, ts[:, None], 3,
                               method=model.synthesize)

        out = jax.jit(window_full)(params, frames, ts7)
        bad = {
            name: int(jnp.sum(~jnp.isfinite(getattr(out, name))))
            for name in ("st_prime", "st_final", "s0_final", "s1_final")}
        put(f"f32_{h}x{w}_nonfinite_counts", bad)
        put(f"f32_{h}x{w}_finite", all(v == 0 for v in bad.values()))
      except Exception as e:
        put("f32check_error", _err_text(e))
        jax.clear_caches()

    if "bf16db" in sections:
      try:
        # bf16 serving-mode certification in dB (round-4 VERDICT #2):
        # every headline fps number is bf16, but the 0.05 dB BASELINE
        # budget had only been demonstrated for f32. Run textured
        # synthetic windows (structured gratings + fine texture + real
        # inter-frame motion) through the REAL serving path (the
        # InferenceEngine, fetch="images") in f32 and bf16 with
        # identical parameters, and record PSNR(bf16 vs f32) on the
        # denormalized outputs. metrics.bf16_serving_label translates
        # that into the expected PSNR-vs-GT shift at the Table-2
        # operating point (independent-noise model; see its docstring)
        # and the headline wording PERF.md/README must carry.
        # Caveat recorded with the number: parameters are seeded-init
        # (the released checkpoint blob is not mounted), so this
        # certifies the serving *computation*, not the trained weights.
        from demfi_tpu.infer.engine import InferenceEngine
        from demfi_tpu.metrics import bf16_serving_label, denorm255, psnr

        def textured_window(k, t_list):
            """4 input frames (global translation over a textured base)
            plus per-instant sharp reference crops at t in t_list and at
            t=0 / t=1 — an independent structured reference signal for
            the measured-PSNR-shift gate."""
            r = np.random.RandomState(100 + k)
            hh, ww = h + 64, w + 64
            yy, xx = np.mgrid[0:hh, 0:ww].astype(np.float32)
            base = np.zeros((hh, ww, 3), np.float32)
            for _ in range(6):
                fy, fx = r.uniform(0.02, 0.45, 2)
                ph_ = r.uniform(0, 2 * np.pi, 3).astype(np.float32)
                base += (np.sin(fy * yy[..., None] + fx * xx[..., None]
                                + ph_)
                         * r.uniform(0.08, 0.25)).astype(np.float32)
            base += r.uniform(-0.15, 0.15, base.shape).astype(np.float32)
            base = np.clip(base, -1, 1)
            vel = r.uniform(-5, 5, 2)

            def crop(tpos):
                oy = 32 + int(round(vel[0] * tpos))
                ox = 32 + int(round(vel[1] * tpos))
                return base[oy:oy + h, ox:ox + w]

            win = np.stack([crop(tp) for tp in (0.0, 1.0, -1.0, 2.0)])
            refs = {"st": np.stack([crop(float(tp)) for tp in t_list]),
                    "s0": crop(0.0), "s1": crop(1.0)}
            return win[None].astype(np.float32), refs

        cfg32 = config_rb(5, 3, compute_dtype="float32",
                          scan_booster=False)
        mdl32 = make_model(cfg32)
        var = mdl32.init(jax.random.PRNGKey(7),
                         jnp.zeros((1, 4, 64, 64, 3)), jnp.zeros((1, 1)),
                         num_update=1)
        mdl16 = make_model(config_rb(5, 3, compute_dtype="bfloat16",
                                     scan_booster=False))
        from demfi_tpu.utils.profiling import calibrate_flow_head
        var, _ = calibrate_flow_head(
            var, mdl32, jnp.asarray(textured_window(
                0, np.linspace(1 / 8, 7 / 8, 7))[0]))
        # param_dtype is f32 in both models: identical variables serve
        # both engines — the ONLY difference is the compute dtype
        eng = {"f32": InferenceEngine(mdl32, var, 3, fetch="images"),
               "bf16": InferenceEngine(mdl16, var, 3, fetch="images")}
        ts_np = np.linspace(1 / 8, 7 / 8, 7, dtype=np.float32)[None]

        fields = ("st_final", "s0_final", "s1_final", "st_prime")
        ref_of = {"st_final": "st", "st_prime": "st",
                  "s0_final": "s0", "s1_final": "s1"}
        vals = {f: [] for f in fields}   # PSNR(bf16 out, f32 out)
        shifts = []                      # PSNR(f32, ref) - PSNR(bf16, ref)
        for k in range(3):
            win, refs = textured_window(k, ts_np[0])
            res = {tag: e.forward_windows(win, ts_np)[0]
                   for tag, e in eng.items()}
            for f in fields:
                o32 = denorm255(getattr(res["f32"], f))
                o16 = denorm255(getattr(res["bf16"], f))
                vals[f].append(psnr(o16, o32))
                ref = denorm255(refs[ref_of[f]])
                if ref.ndim == 3:
                    ref = np.broadcast_to(ref, o32.shape)
                shifts.append(psnr(o32, ref) - psnr(o16, ref))
        put("psnr_bf16_vs_f32_db_by_field",
            {f: float(np.mean(v)) for f, v in vals.items()})
        p_all = [v for vs in vals.values() for v in vs]
        put("psnr_bf16_vs_f32_db", float(np.mean(vals["st_final"])))
        put("psnr_bf16_vs_f32_db_min", float(np.min(p_all)))
        put("bf16_expected_shift_db", bf16_serving_label(
            float(np.min(p_all)))[0])
        # the gate: the DIRECTLY measured PSNR shift on independent
        # structured references (what the 0.05 dB budget constrains)
        from demfi_tpu.metrics import bf16_measured_label
        shift_m = float(np.mean(shifts))
        put("bf16_measured_shift_db", shift_m)
        put("bf16_measured_shift_db_max", float(np.max(shifts)))
        certified_m, label_m = bf16_measured_label(shift_m)
        put("bf16_certified_005db", bool(certified_m))
        put("bf16_headline_label", label_m)
        eng = res = var = mdl32 = mdl16 = None  # noqa: F841
        jax.clear_caches()
      except Exception as e:
        put("bf16db_error", _err_text(e))
        jax.clear_caches()

    if "train" in sections:
        # The train step is the largest-footprint program in the suite;
        # the earlier sections' live arrays (full f32 outputs pytree,
        # model params, bench inputs) plus their cached executables'
        # constant buffers starve its compile-time HBM budget
        # (2026-08-19: every ladder rung incl. b1+remat OOM'd in-suite
        # while a fresh-process train ran fine). Drop everything before
        # compiling it.
        out = bad = params = model = cfg = None  # noqa: F841
        frames = ts7 = x64 = flo = x2 = None  # noqa: F841
        jax.clear_caches()
        # One optimizer step of DeMFI-Net_rb(5,3) on the reference's
        # training geometry (256x256 crops, /root/reference/main.py
        # patch-based train loader) — evidence for the BASELINE "full
        # training run" config. f32 is the reference contract and is
        # clean at this size (the >=352x640 full-frame miscompile does
        # not hit 256x256 — ROUND2_NOTES "Open bug").
        from demfi_tpu.train import create_train_state, make_train_step

        def train_probe(dt_name, bsz, remat):
            tcfg = config_rb(5, 3, compute_dtype=dt_name, batch_size=bsz,
                             patch_size=256, remat_backbone=remat)
            tmodel = make_model(tcfg)
            state, tx = create_train_state(
                tcfg, tmodel, jax.random.PRNGKey(0),
                sample_shape=(1, 4, 256, 256, 3))
            step = make_train_step(tcfg, tmodel, tx)  # jitted, donates state
            tb = jnp.asarray(rng.uniform(
                -1, 1, (bsz, 9, 256, 256, 3)).astype(np.float32))
            tt = jnp.full((bsz, 1), 0.375, jnp.float32)
            st2, m = step(state, tb, tt)
            float(m["total_loss"])  # compile + settle
            t0 = time.time()
            k = max(2, args.iters // 2)
            for _ in range(k):
                st2, m = step(st2, tb, tt)
                float(m["total_loss"])
            return (time.time() - t0) / k, m

        for dt_name in args.dtypes.split(","):
            # per-chip batch: bf16 B=4 fits a v5e's 15.75G HBM; the f32
            # step's N_trn=5 boost-unroll temporaries OOM at B=4 (26G),
            # so f32 starts at B=2 — DP over 'data' scales the global
            # batch either way. 2026-08-19: f32 B=2 plain missed HBM by
            # 11.7 MB at compile, so each dtype walks a fallback ladder
            # (remat the RDB backbone, then halve the batch) and records
            # which rung succeeded instead of dying.
            bsz = 4 if dt_name == "bfloat16" else 2
            tag = "bf16" if dt_name == "bfloat16" else "f32"
            ladder = [(bsz, False), (bsz, True), (max(1, bsz // 2), True)]
            for k in [k for k in report
                      if k.startswith(f"train_error_{tag}")]:
                report.pop(k)  # re-measuring: drop stale --merge errors
            for b, remat in ladder:
                try:
                    dt_step, m = train_probe(dt_name, b, remat)
                except Exception as e:
                    put(f"train_error_{tag}_b{b}{'_remat' if remat else ''}",
                        _err_text(e))
                    jax.clear_caches()
                    continue
                suffix = "_remat" if remat else ""
                put(f"train_step_b{b}_256_{tag}{suffix}_ms", dt_step * 1000)
                put(f"train_loss_finite_{tag}",
                    bool(np.isfinite(float(m["total_loss"]))))
                break

    if "trainbd" in sections:
        # Train-side breakdown (round-4 VERDICT #3): where does the
        # ~1 s b4 256^2 bf16 step go? Sections: forward+loss only,
        # forward+backward, optimizer-only, full step; then A/Bs for
        # the knobs that shape the train graph (booster scan vs unroll,
        # remat granularity backbone vs per-RDB vs none). Each config
        # is isolated in try/except and frees its arrays (the train
        # graphs are the largest-footprint programs in the suite).
        out = bad = params = model = cfg = None  # noqa: F841
        frames = ts7 = x64 = flo = x2 = None  # noqa: F841
        jax.clear_caches()
        import dataclasses as _dc

        import optax
        from demfi_tpu.train import (create_train_state, demfi_loss,
                                     make_train_step)

        bp, bb = args.bd_patch, args.bd_batch

        def mk_cfg(scan, remat, gran):
            c = config_rb(5, 3, compute_dtype="bfloat16", batch_size=bb,
                          patch_size=bp, remat_backbone=remat)
            return _dc.replace(c, scan_booster=scan,
                               remat_granularity=gran)

        def probe(tag, scan=True, remat=False, gran="backbone",
                  parts=False, calib=True):
            try:
                tcfg = mk_cfg(scan, remat, gran)
                tmodel = make_model(tcfg)
                state, tx = create_train_state(
                    tcfg, tmodel, jax.random.PRNGKey(0),
                    sample_shape=(1, 4, bp, bp, 3))
                tb = jnp.asarray(rng.uniform(
                    -1, 1, (bb, 9, bp, bp, 3)).astype(np.float32))
                tt = jnp.full((bb, 1), 0.375, jnp.float32)
                if calib:
                    # steady-state training regime: bounded flows ride
                    # the one-hot warp rungs (the train graph's
                    # lax.switch picks rungs at RUNTIME, so step time
                    # depends on the flow magnitudes — random init =
                    # early-training worst case on the quad fallbacks)
                    from demfi_tpu.utils.profiling import \
                        calibrate_flow_head
                    p2, _ = calibrate_flow_head(state.params, tmodel,
                                                tb[:1, :4])
                    state = state.replace(params=p2)

                def fwd(params, fr, t_):
                    o = tmodel.apply(params, fr[:, :4], t_,
                                     num_update=tcfg.N_trn)
                    loss, _ = demfi_loss(tcfg, o, fr[:, 5], fr[:, 6],
                                         fr[:, 4])
                    return loss

                if parts:
                    # each probe reduces over EVERY output leaf inside
                    # the jitted fn — summing only the first grad leaf
                    # lets XLA dead-code-eliminate the rest of the
                    # backward pass (measured: 493 ms "fwdbwd" vs a
                    # 1046 ms full step)
                    def _all(tree):
                        return sum(jnp.sum(l.astype(jnp.float32)) for l
                                   in jax.tree_util.tree_leaves(tree))

                    put(f"trainbd_{tag}_fwd_ms", scalar_time(
                        fwd, state.params, tb, tt, floor=floor) * 1000)
                    put(f"trainbd_{tag}_fwdbwd_ms", scalar_time(
                        lambda p, fr, t_: _all(jax.grad(fwd)(p, fr, t_)),
                        state.params, tb, tt, floor=floor) * 1000)
                    # optimizer-only: Adam moments + L2 + apply on real
                    # grad shapes (params stay donated-free here)
                    grads = jax.jit(jax.grad(fwd))(state.params, tb, tt)
                    put(f"trainbd_{tag}_opt_ms", scalar_time(
                        lambda g, s, p: _all(optax.apply_updates(
                            p, tx.update(g, s, p)[0])),
                        grads, state.opt_state, state.params,
                        floor=floor) * 1000)
                    grads = None
                    jax.clear_caches()

                # full step, timed exactly like the train section
                step = make_train_step(tcfg, tmodel, tx)
                st2, m = step(state, tb, tt)
                float(m["total_loss"])
                t0 = time.time()
                k = max(2, args.iters // 2)
                for _ in range(k):
                    st2, m = step(st2, tb, tt)
                    float(m["total_loss"])
                dt_step = (time.time() - t0) / k
                put(f"trainbd_{tag}_step_ms", dt_step * 1000)
                return dt_step
            except Exception as e:
                put(f"trainbd_{tag}_error", _err_text(e))
                return None
            finally:
                jax.clear_caches()

        # main config = the train section's headline rung
        dt_main = probe("scan", scan=True, remat=False, parts=True)
        probe("unroll", scan=False, remat=False)
        probe("remat_backbone", scan=True, remat=True)
        probe("remat_rdb", scan=True, remat=True, gran="rdb")
        probe("scan_rawinit", scan=True, remat=False, calib=False)
        if dt_main:
            # effective throughput: fwd+bwd ~= 3x forward FLOPs; the
            # forward at 256^2 b4 N_trn=5 is ~3.2 TFLOP (1.71 TFLOP is
            # 640x352 N=3 — scale by pixels and boost count)
            fwd_tflop = 1.71 * (bp * bp * bb) / (640 * 352) * (
                (573 + 5 * 123) / (573 + 3 * 123))  # N=5 vs N=3 windows
            put("trainbd_est_tflops_per_s", 3 * fwd_tflop / dt_main)

    print(json.dumps(report, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
