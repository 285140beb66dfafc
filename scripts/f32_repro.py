"""Standalone repro for the XLA:TPU float32 fusion miscompile.

Symptom (ROUND2/ROUND3_NOTES, measure_r03_352x640.json): float32 whole-
frame Stage-II outputs go NaN at >=352x640 on the current relay/libtpu
(2.36M non-finite values from mathematically-bounded inputs) while
<=192x320 tiles and ALL bfloat16 runs are clean. InferenceEngine
therefore reroutes big-frame f32 eval through the tiled path
(demfi_tpu/infer/engine.py:_route_f32_tpu, _F32_TPU_SAFE_PIXELS).

This script is the retirement test for that reroute: run it whenever the
toolchain (jax/jaxlib/libtpu or the axon relay) updates. Constructs:

  c1_gather_blend_fused   distilled, self-contained (no demfi_tpu model):
                          quad-row bilinear gather + the Eq.2 occlusion
                          blend with IMPLICIT [...,None] broadcasts and
                          no optimization_barrier — the fusion pattern
                          the in-model bisect implicated.
  c2_gather_blend_guarded same numbers with the shipped mitigations
                          (broadcast_to + optimization_barrier). Expected
                          clean on every toolchain; isolates whether c1
                          failures are the known fusion bug.
  c3_model_full           authoritative: one full x8 352x640 f32 window
                          through DeMFINet synthesize (random params) —
                          the exact program the engine guards.

Verdicts land in the JSON report keyed per construct. RETIREMENT DONE
(2026-08-19): this suite came back all-clean on jax/jaxlib 0.9.0 /
TPU v5 lite (tpu_reports/f32_repro.json), so the engine reroute is
disarmed by default. DEMFI_F32_TPU_SAFE_PIXELS=<pixels> re-arms it
(61440 restores the round-3 behavior) if a future toolchain makes this
suite go dirty again.

Usage: python scripts/f32_repro.py [--res 352x640] [--skip_model]
                                   [--out tpu_reports/f32_repro.json]
"""
from __future__ import annotations

import os as _os
import sys as _sys

# c3 imports demfi_tpu; when the site-packages .pth is absent (fresh
# venv) the bare `python scripts/f32_repro.py` can't see the repo root
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))

import argparse
import json

import numpy as np


def _toolchain():
    import jax
    info = {"jax": jax.__version__, "backend": jax.default_backend()}
    try:
        import jaxlib
        info["jaxlib"] = jaxlib.__version__
    except Exception:
        pass
    try:
        d = jax.devices()[0]
        info["device"] = str(d.device_kind)
        info["platform_version"] = str(
            getattr(jax.extend.backend.get_backend(), "platform_version",
                    ""))
    except Exception:
        pass
    return info


def _quad_gather(img, px, py):
    """Self-contained copy of the shipped quad-row bilinear-zeros gather
    (demfi_tpu/ops/warp.py:_bilinear_zeros_quad) so the repro needs no
    package import and pins TODAY'S formulation."""
    import jax.numpy as jnp
    b, h, w, c = img.shape
    imgp = jnp.pad(img, ((0, 0), (1, 1), (1, 1), (0, 0)))
    quad = jnp.concatenate(
        [imgp[:, :-1, :-1], imgp[:, :-1, 1:],
         imgp[:, 1:, :-1], imgp[:, 1:, 1:]], axis=-1)
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    fx = px - x0
    fy = py - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    flat = quad.reshape(b, (h + 1) * (w + 1), 4 * c)
    idx = (jnp.clip(y0 + 1, 0, h) * (w + 1)
           + jnp.clip(x0 + 1, 0, w)).reshape(b, -1, 1)
    q = jnp.take_along_axis(flat, idx, axis=1).reshape(b, h, w, 4 * c)
    out = None
    for i, (dy, dx) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
        xi = x0 + dx
        yi = y0 + dy
        valid = ((xi >= 0) & (xi < w) & (yi >= 0) & (yi < h))
        wgt = (fx if dx else 1.0 - fx) * (fy if dy else 1.0 - fy)
        wgt = wgt * valid.astype(jnp.float32)
        contrib = q[..., i * c:(i + 1) * c] * wgt[..., None]
        out = contrib if out is None else out + contrib
    return out


def _bwarp_like(feat, flow):
    import jax.numpy as jnp
    b, h, w, _ = feat.shape
    gx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    gy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    return _quad_gather(feat, gx + flow[..., 0], gy + flow[..., 1])


def construct_c1(h, w, c=64, guarded=False):
    """Gather + Eq.2 blend; guarded=True applies the shipped mitigations."""
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    f0 = jnp.asarray(rng.randn(1, h, w, c).astype(np.float32))
    f1 = jnp.asarray(rng.randn(1, h, w, c).astype(np.float32))
    fl0 = jnp.asarray(rng.uniform(-20, 20, (1, h, w, 2)).astype(np.float32))
    fl1 = jnp.asarray(rng.uniform(-20, 20, (1, h, w, 2)).astype(np.float32))
    occ = jnp.asarray(rng.uniform(0.05, 0.95,
                                  (1, h, w, 1)).astype(np.float32))
    t = jnp.float32(0.5)

    def prog(f0, f1, fl0, fl1, occ):
        a = _bwarp_like(f0, fl0)
        b_ = _bwarp_like(f1, fl1)
        if guarded:
            a, b_ = jax.lax.optimization_barrier((a, b_))
            occ_b = jnp.broadcast_to(occ, a.shape)
        else:
            occ_b = occ  # implicit [...,1] broadcast into the fused blend
        num = (1.0 - t) * occ_b * a + t * (1.0 - occ_b) * b_
        den = (1.0 - t) * occ_b + t * (1.0 - occ_b)
        return num / den

    out = jax.jit(prog)(f0, f1, fl0, fl1, occ)
    return int(jnp.sum(~jnp.isfinite(out))), int(out.size)


def construct_c3(h, w):
    import jax
    import jax.numpy as jnp
    from demfi_tpu.config import config_rb
    from demfi_tpu.models import make_model

    cfg = config_rb(5, 3, compute_dtype="float32")
    model = make_model(cfg)
    rng = np.random.RandomState(0)
    frames = jnp.asarray(rng.uniform(-1, 1, (1, 4, h, w, 3)
                                     ).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), frames[:, :, :64, :64],
                        jnp.zeros((1, 1)), num_update=1)
    ts = jnp.asarray(np.linspace(1 / 8, 7 / 8, 7, dtype=np.float32))

    def window(p, f, ts):
        ctx = model.apply(p, f, method=model.extract)
        ctx = jax.tree_util.tree_map(
            lambda x: jnp.repeat(x, ts.shape[0], axis=0), ctx)
        return model.apply(p, ctx, ts[:, None], 3, method=model.synthesize)

    out = jax.jit(window)(params, frames, ts)
    bad = sum(int(jnp.sum(~jnp.isfinite(getattr(out, k))))
              for k in ("st_prime", "st_final", "s0_final", "s1_final"))
    tot = sum(int(np.prod(getattr(out, k).shape))
              for k in ("st_prime", "st_final", "s0_final", "s1_final"))
    return bad, tot


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=str, default="352x640")
    ap.add_argument("--skip_model", action="store_true",
                    help="distilled constructs only (no demfi_tpu import)")
    ap.add_argument("--out", type=str, default="")
    args = ap.parse_args()
    h, w = (int(x) for x in args.res.split("x"))

    report = {"res": args.res, "toolchain": _toolchain()}
    runs = [("c1_gather_blend_fused",
             lambda: construct_c1(h, w, guarded=False)),
            ("c2_gather_blend_guarded",
             lambda: construct_c1(h, w, guarded=True))]
    if not args.skip_model:
        runs.append(("c3_model_full", lambda: construct_c3(h, w)))

    for name, fn in runs:
        try:
            bad, tot = fn()
            report[name] = {"nonfinite": bad, "total": tot,
                            "clean": bad == 0}
            print(f"{name}: {'CLEAN' if bad == 0 else 'DIRTY'} "
                  f"({bad}/{tot} non-finite)", flush=True)
        except Exception as e:
            report[name] = {"error": f"{type(e).__name__}: {e}"[:500]}
            print(f"{name}: ERROR {type(e).__name__}: {e}", flush=True)

    verdict_keys = [n for n, _ in runs]
    clean = all(report.get(k, {}).get("clean") for k in verdict_keys)
    report["all_clean"] = clean
    msg = ("all clean — the engine reroute (_F32_TPU_SAFE_PIXELS) can "
           "be retired on this toolchain" if clean
           else "miscompile still present — keep the reroute")
    print("VERDICT: " + msg)
    print(json.dumps(report, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
            f.write("\n")


if __name__ == "__main__":
    main()
