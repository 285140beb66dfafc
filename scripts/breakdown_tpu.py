"""Stage-level on-chip breakdown of the x8 window (which op eats the ms).

Usage: python scripts/breakdown_tpu.py [--res 352x640] [--stages a,b,c]
Stages: warps (bwarp64/bwarp3/fwarp2/cfr at B=7), synth0 (Stage I only),
synth1/synth3 (N boosting iterations), all on the eval t-batch of 7.
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
if _os.environ.get("DEMFI_PLATFORM"):
    _jax.config.update("jax_platforms", _os.environ["DEMFI_PLATFORM"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=str, default="352x640")
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--stages", type=str, default="warps,synth")
    ap.add_argument("--dtype", type=str, default="bfloat16")
    ap.add_argument("--out", type=str, default="")
    ap.add_argument("--raw_flows", action="store_true",
                    help="skip the flow-head calibration (time the "
                         "random-init unbounded-motion fallbacks)")
    args = ap.parse_args()

    def _calibrate(params, model, frames):
        # production-representative motion (see bench.py / profiling.py:
        # random-init flows reach ~76 px and drive every guarded warp
        # onto its unbounded fallback — breakdown_r05_cuts.json)
        if args.raw_flows:
            return params, -1.0
        from demfi_tpu.utils.profiling import calibrate_flow_head
        return calibrate_flow_head(params, model, frames)
    h, w = (int(x) for x in args.res.split("x"))
    stages = set(args.stages.split(","))

    import jax
    import jax.numpy as jnp

    report = {"res": f"{h}x{w}", "backend": jax.default_backend(),
              "B": 7, "dtype": args.dtype}
    rng = np.random.RandomState(0)

    def put(k, v):
        report[k] = v
        print(f"  {k} = {v}", flush=True)
        if args.out:
            with open(args.out, "w") as f:
                json.dump(report, f, indent=1)

    def scalar_time(fn, *a, n=args.iters, floor=0.0):
        g = jax.jit(lambda *a: jnp.sum(jnp.asarray(
            jax.tree_util.tree_leaves(fn(*a))[0], jnp.float32)))
        float(g(*a))
        t0 = time.time()
        for _ in range(n):
            float(g(*a))
        return max((time.time() - t0) / n - floor, 1e-9)

    floor = scalar_time(lambda x: x + 1, jnp.ones((8, 128)))
    put("floor_ms", floor * 1000)

    import demfi_tpu.ops.warp as W

    B = 7
    dt_ = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    if "warps" in stages:
        # Inputs in the MODEL's dtype: features (x64/x3) are bf16 in a
        # bf16 model, flows stay f32, and fwarp/cfr take compute_dtype
        # so the bf16 one-hot MXU ladder actually dispatches (the
        # r05 first cut measured the f32 quad path by mistake).
        x64 = jnp.asarray(rng.randn(B, h, w, 64).astype(np.float32)
                          ).astype(dt_)
        x3 = jnp.asarray(rng.randn(B, h, w, 3).astype(np.float32)
                         ).astype(dt_)
        flo = jnp.asarray((rng.randn(B, h, w, 2) * 5).astype(np.float32))
        t = jnp.full((B, 1, 1, 1), 0.375, jnp.float32)
        put("bwarp64_B7_ms", scalar_time(W.bwarp, x64, flo,
                                         floor=floor) * 1000)
        put("bwarp3_B7_ms", scalar_time(W.bwarp, x3, flo,
                                        floor=floor) * 1000)
        put("fwarp2_B7_ms", scalar_time(
            lambda f: W.fwarp(f, f, dt_), flo, floor=floor) * 1000)
        put("cfr_B7_ms", scalar_time(
            lambda a, b, tt: W.cfr_flow_t_align(a, b, tt, dt_),
            flo, flo, t, floor=floor) * 1000)
        put("abs64_B7_ms", scalar_time(
            W.bilinear_sample_abs, x64,
            jnp.asarray((rng.randn(B, h, w, 2) * 8 + 4).astype(np.float32)),
            floor=floor) * 1000)

    if "stage1" in stages:
        # Isolated t-dependent Stage-I blocks at the eval t-batch, in
        # the real model dtype — budgets synth_B7_N0 (demfi.py:574-621).
        import flax.linen as nn
        from demfi_tpu.models.demfi import (Mixer, RefineUNet, ResBlock,
                                            _conv, _t_blend)

        key = jax.random.PRNGKey(0)
        nf = 64

        def mk(s, dtype=None):
            return jnp.asarray(rng.uniform(-1, 1, s).astype(np.float32)
                               ).astype(dtype or dt_)

        flo = jnp.asarray((rng.randn(B, h, w, 2) * 5).astype(np.float32))
        t = jnp.full((B, 1, 1, 1), 0.375, jnp.float32)
        occ = jnp.asarray(rng.uniform(0, 1, (B, h, w, 1)
                                      ).astype(np.float32))
        put("s1_cfr_ms", scalar_time(
            lambda a, b, tt: W.cfr_flow_t_align(a, b, tt, dt_),
            flo, flo, t, floor=floor) * 1000)

        f0, f1 = mk((B, h, w, nf)), mk((B, h, w, nf))
        def blend64(a, b, fa, fb, o, tt):
            return _t_blend(*W.bwarp_pair(a, b, fa, fb), o, tt)
        put("s1_ftblend_ms", scalar_time(
            lambda *a: blend64(*a).astype(jnp.float32).sum(),
            f0, f1, flo, -flo, occ, t, floor=floor) * 1000)

        refine = RefineUNet(nf, dt_)
        agg1 = mk((B, h, w, 2 * nf + nf + 4 + 4 + 1))
        p_ref = refine.init(key, agg1)
        put("s1_refine_ms", scalar_time(
            lambda p, x: refine.apply(p, x).astype(jnp.float32).sum(),
            p_ref, agg1, floor=floor) * 1000)

        class D1(nn.Module):
            dtype: object = dt_

            @nn.compact
            def __call__(self, x):
                out = nn.relu(_conv(nf, 3, dtype=self.dtype,
                                    name="first")(x))
                for i in range(5):
                    out = ResBlock(nf, self.dtype, name=f"res_{i}")(out)
                out = nn.relu(_conv(nf, 3, dtype=self.dtype,
                                    name="last1")(out))
                return _conv(3, 3, dtype=self.dtype, name="last2")(out)

        d1 = D1()
        dec_in = mk((3 * B, h, w, nf))
        p_d1 = d1.init(key, dec_in)
        put("s1_d1_ms", scalar_time(
            lambda p, x: d1.apply(p, x).astype(jnp.float32).sum(),
            p_d1, dec_in, floor=floor) * 1000)

        # Stage-II prologue: Ch_Reducer (7x7 conv 192->64) + ref encode
        class ChRed(nn.Module):
            @nn.compact
            def __call__(self, x):
                return jnp.tanh(_conv(nf, 7, dtype=dt_,
                                      name="Ch_Reducer")(x))
        chred = ChRed()
        x192 = mk((B, h, w, 3 * nf))
        p_cr = chred.init(key, x192)
        put("s1_chred_ms", scalar_time(
            lambda p, x: chred.apply(p, x).astype(jnp.float32).sum(),
            p_cr, x192, floor=floor) * 1000)

        mixer = Mixer(nf, dt_)
        ref = mk((B, h, w, 30))
        p_mx = mixer.init(key, ref, mk((B, h, w, 5)))
        put("s1_refenc_ms", scalar_time(
            lambda p, x: mixer.apply(p, x, method=mixer.encode_ref
                                     ).astype(jnp.float32).sum(),
            p_mx, ref, floor=floor) * 1000)

    if "synth" in stages:
        from demfi_tpu.config import config_rb
        from demfi_tpu.models import make_model

        cfg = config_rb(5, 3, compute_dtype=args.dtype)
        model = make_model(cfg)
        frames = jnp.asarray(
            rng.uniform(-1, 1, (1, 4, h, w, 3)).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), frames[:, :, :64, :64],
                            jnp.zeros((1, 1)), num_update=1)
        params, raw_max = _calibrate(params, model, frames)
        put("raw_init_max_flow_px", raw_max)
        ts7 = jnp.asarray(np.linspace(1 / 8, 7 / 8, 7, dtype=np.float32))

        ctx = jax.jit(lambda p, f: model.apply(p, f, method=model.extract)
                      )(params, frames)
        ctx7 = jax.tree_util.tree_map(
            lambda x: jnp.repeat(x, 7, axis=0), ctx)
        ctx7 = jax.device_put(ctx7)

        for n_up in (0, 1, 3):
            # sum over BOTH stages' outputs — summing only the first
            # pytree leaf (s0_prime) lets XLA dead-code-eliminate the
            # whole Stage-II loop
            def run(p, c, ts, n_up=n_up):
                o = model.apply(p, c, ts[:, None], n_up,
                                method=model.synthesize)
                s = jnp.sum(o.st_prime.astype(jnp.float32))
                if n_up:
                    s = s + jnp.sum(o.st_final.astype(jnp.float32)) \
                        + jnp.sum(o.flow_preds)
                return s
            dt = scalar_time(run, params, ctx7, ts7, floor=floor)
            put(f"synth_B7_N{n_up}_ms", dt * 1000)

    if "synth0cut" in stages:
        # Cumulative-prefix timing of the Stage-I graph (synthesize with
        # the static ``upto`` measurement hook): consecutive differences
        # attribute the synth_N0 budget INSIDE the fused graph, where
        # isolated-op timings miss fusion boundaries and glue (the r05
        # stage1 section left ~150 ms of synth_N0 unattributed).
        from demfi_tpu.config import config_rb
        from demfi_tpu.models import make_model

        cfg = config_rb(5, 3, compute_dtype=args.dtype)
        model = make_model(cfg)
        frames = jnp.asarray(
            rng.uniform(-1, 1, (1, 4, h, w, 3)).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), frames[:, :, :64, :64],
                            jnp.zeros((1, 1)), num_update=1)
        params, _ = _calibrate(params, model, frames)
        ts7 = jnp.asarray(np.linspace(1 / 8, 7 / 8, 7, dtype=np.float32))
        ctx = jax.jit(lambda p, f: model.apply(p, f, method=model.extract)
                      )(params, frames)
        ctx7 = jax.device_put(jax.tree_util.tree_map(
            lambda x: jnp.repeat(x, 7, axis=0), ctx))

        prev = 0.0
        for cut in ("cfr", "ftblend", "agg1", "refine", "rftblend",
                    "d1", None):
            def run(p, c, ts, cut=cut):
                o = model.apply(p, c, ts[:, None], 0,
                                method=model.synthesize, upto=cut)
                return sum(jnp.sum(l.astype(jnp.float32)) for l in
                           jax.tree_util.tree_leaves(o))
            dt = scalar_time(run, params, ctx7, ts7, floor=floor) * 1000
            name = cut or "full_n0"
            put(f"cut_{name}_ms", dt)
            put(f"cut_{name}_delta_ms", dt - prev)
            prev = dt

    if "scanvs" in stages:
        # scan vs unrolled Stage-II at N=3: isolates the lax.scan
        # carry/const handling cost from the per-iteration math
        import dataclasses as _dc
        from demfi_tpu.config import config_rb
        from demfi_tpu.models import make_model

        frames = jnp.asarray(
            rng.uniform(-1, 1, (1, 4, h, w, 3)).astype(np.float32))
        ts7 = jnp.asarray(np.linspace(1 / 8, 7 / 8, 7, dtype=np.float32))
        for scan in (True, False):
            cfg = _dc.replace(config_rb(5, 3, compute_dtype=args.dtype),
                              scan_booster=scan)
            model = make_model(cfg)
            params = model.init(jax.random.PRNGKey(0),
                                frames[:, :, :64, :64],
                                jnp.zeros((1, 1)), num_update=1)
            params, _ = _calibrate(params, model, frames)
            ctx = jax.jit(lambda p, f, m=model: m.apply(
                p, f, method=m.extract))(params, frames)
            ctx7 = jax.device_put(jax.tree_util.tree_map(
                lambda x: jnp.repeat(x, 7, axis=0), ctx))

            def run(p, c, ts, m=model):
                o = m.apply(p, c, ts[:, None], 3, method=m.synthesize)
                return (jnp.sum(o.st_prime.astype(jnp.float32))
                        + jnp.sum(o.st_final.astype(jnp.float32))
                        + jnp.sum(o.flow_preds))
            dt = scalar_time(run, params, ctx7, ts7, floor=floor)
            put(f"synth_B7_N3_{'scan' if scan else 'unroll'}_ms",
                dt * 1000)

    if "booster" in stages:
        # isolated Stage-II sub-modules at the eval batch — each jitted
        # alone runs at its best; the gap to (synth_N3-synth_N0)/3 is
        # scan/fusion overhead
        import flax.linen as nn
        from demfi_tpu.models.demfi import (FlowOcc, Mixer, ResBlock,
                                            SepConvGRU, _conv, _t_blend)

        dt_ = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
        key = jax.random.PRNGKey(0)

        def t_mod(name, mod, *shapes):
            xs = [jnp.asarray(rng.uniform(-1, 1, s).astype(np.float32)
                              ).astype(dt_) for s in shapes]
            p = mod.init(key, *xs)
            put(name, scalar_time(
                lambda *a: jax.tree_util.tree_leaves(
                    mod.apply(a[0], *a[1:]))[0].astype(jnp.float32).sum(),
                p, *xs, floor=floor) * 1000)

        t_mod("mixer_B7_ms", Mixer(64, dt_), (B, h, w, 30), (B, h, w, 5))
        t_mod("gru_B7_ms", SepConvGRU(64, dt_), (B, h, w, 64),
              (B, h, w, 64))
        t_mod("flowocc_B7_ms", FlowOcc(64, dt_), (B, h, w, 64))

        class D2(nn.Module):
            dtype: object = dt_

            @nn.compact
            def __call__(self, x):
                out = nn.relu(_conv(64, 3, dtype=self.dtype,
                                    name="first")(x))
                for i in range(5):
                    out = ResBlock(64, self.dtype, name=f"res_{i}")(out)
                out = nn.relu(_conv(64, 3, dtype=self.dtype,
                                    name="last1")(out))
                return _conv(9, 3, dtype=self.dtype, name="last2")(out)

        t_mod("dec2_B7_ms", D2(), (B, h, w, 103))

        # the per-iteration st_new blend (2x bwarp3 + t-blend)
        s0 = jnp.asarray(rng.uniform(-1, 1, (B, h, w, 3)
                                     ).astype(np.float32)).astype(dt_)
        s1 = jnp.asarray(rng.uniform(-1, 1, (B, h, w, 3)
                                     ).astype(np.float32)).astype(dt_)
        f01 = jnp.asarray((rng.randn(B, h, w, 2) * 3).astype(np.float32))
        occ = jnp.asarray(rng.uniform(0, 1, (B, h, w, 1)
                                      ).astype(np.float32))
        tv = jnp.full((B, 1, 1, 1), 0.375, jnp.float32)

        def st_blend(s0, s1, f01, occ, tv):
            return _t_blend(W.bwarp(s0, f01), W.bwarp(s1, -f01), occ, tv)
        put("stblend_B7_ms", scalar_time(
            lambda *a: st_blend(*a).astype(jnp.float32).sum(),
            s0, s1, f01, occ, tv, floor=floor) * 1000)

    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
