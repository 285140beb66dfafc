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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=str, default="352x640")
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--stages", type=str, default="warps,synth")
    ap.add_argument("--dtype", type=str, default="bfloat16")
    ap.add_argument("--out", type=str, default="")
    args = ap.parse_args()
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
    if "warps" in stages:
        x64 = jnp.asarray(rng.randn(B, h, w, 64).astype(np.float32))
        x3 = jnp.asarray(rng.randn(B, h, w, 3).astype(np.float32))
        flo = jnp.asarray((rng.randn(B, h, w, 2) * 5).astype(np.float32))
        t = jnp.full((B, 1, 1, 1), 0.375, jnp.float32)
        put("bwarp64_B7_ms", scalar_time(W.bwarp, x64, flo,
                                         floor=floor) * 1000)
        put("bwarp3_B7_ms", scalar_time(W.bwarp, x3, flo,
                                        floor=floor) * 1000)
        put("fwarp2_B7_ms", scalar_time(W.fwarp, flo, flo,
                                        floor=floor) * 1000)
        put("cfr_B7_ms", scalar_time(W.cfr_flow_t_align, flo, flo, t,
                                     floor=floor) * 1000)
        put("abs64_B7_ms", scalar_time(
            W.bilinear_sample_abs, x64,
            jnp.asarray((rng.randn(B, h, w, 2) * 8 + 4).astype(np.float32)),
            floor=floor) * 1000)

    if "synth" in stages:
        from demfi_tpu.config import config_rb
        from demfi_tpu.models import make_model

        cfg = config_rb(5, 3, compute_dtype=args.dtype)
        model = make_model(cfg)
        frames = jnp.asarray(
            rng.uniform(-1, 1, (1, 4, h, w, 3)).astype(np.float32))
        params = model.init(jax.random.PRNGKey(0), frames[:, :, :64, :64],
                            jnp.zeros((1, 1)), num_update=1)
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

    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
