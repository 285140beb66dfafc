"""On-chip eval-pipeline overlap probe (round-4 VERDICT #8 done-bar).

Builds a synthetic GT dataset tree at --res, runs the REAL ``evaluate``
driver (x8, fetch="images", PNGs off) with the two-deep device pipeline
ON and OFF (DEMFI_EVAL_PIPELINE), and reports wall-clock per window for
both against the pure device window time (scalar-readback timed, the
only honest device number through this tunnel — see CLAUDE.md).

On a normal TPU host (PCIe readback) the pipelined wall should sit
within ~15% of pure device time; through this relay the readback of the
six fetched frames (~100 MB/window at 352x640 x8 over a 6-8 MB/s
tunnel) dominates BOTH modes, so the honest criterion here is the
ON-vs-OFF delta ~= min(device, readback) (the pipeline hides the device
time under the readback).

Usage: python scripts/eval_overlap_probe.py [--res 352x640]
       [--windows 4] [--out tpu_reports/eval_overlap.json]
"""
from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import os
import tempfile
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


def build_tree(root: str, h: int, w: int, n_windows: int) -> None:
    import cv2
    sharp = os.path.join(root, "test", "scene0")
    blur = os.path.join(root, "test_blur", "scene0")
    os.makedirs(sharp, exist_ok=True)
    os.makedirs(blur, exist_ok=True)
    rng = np.random.RandomState(0)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    n_blur = n_windows + 3          # windows skip first/last blur frames
    for i in range(8 * n_blur + 16):
        img = (128 + 90 * np.sin(0.07 * (xx + 3 * i))
               + 30 * np.sin(0.11 * (yy - 2 * i)))[..., None]
        img = np.repeat(img, 3, -1) + rng.uniform(-9, 9, (h, w, 3))
        cv2.imwrite(os.path.join(sharp, f"{str(i).zfill(5)}.png"),
                    img.clip(0, 255).astype(np.uint8))
    for k in range(n_blur):
        i = 17 + 8 * k
        img = (128 + 90 * np.sin(0.07 * (xx + 3 * i)))[..., None]
        img = np.repeat(img, 3, -1) + rng.uniform(-9, 9, (h, w, 3))
        cv2.imwrite(os.path.join(blur, f"{str(i).zfill(5)}.png"),
                    img.clip(0, 255).astype(np.uint8))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", default="352x640")
    ap.add_argument("--windows", type=int, default=4)
    ap.add_argument("--out", default="")
    args = ap.parse_args()
    h, w = (int(x) for x in args.res.split("x"))

    import jax
    import jax.numpy as jnp

    from demfi_tpu.config import config_rb
    from demfi_tpu.infer import InferenceEngine
    from demfi_tpu.infer.driver import evaluate
    from demfi_tpu.models import make_model

    tmp = tempfile.mkdtemp(prefix="demfi_ovl_")
    build_tree(tmp, h, w, args.windows)
    cfg = config_rb(5, 3, compute_dtype="bfloat16", scan_booster=False,
                    test_data_path=tmp,
                    test_img_dir=os.path.join(tmp, "imgs"),
                    text_dir=os.path.join(tmp, "text"),
                    checkpoint_dir=os.path.join(tmp, "ckpt"),
                    log_dir=os.path.join(tmp, "log"))
    model = make_model(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 4, 64, 64, 3)), jnp.zeros((1, 1)),
                        num_update=1)
    engine = InferenceEngine(model, params, num_update=3, fetch="images")

    report = {"res": args.res, "backend": jax.default_backend(),
              "n_windows": args.windows}

    # pure device window time: scalar readback over the engine's own
    # jitted forward (no tunnel array readback in the timed region)
    frames = np.random.RandomState(1).uniform(
        -1, 1, (1, 4, h, w, 3)).astype(np.float32)
    ts = np.linspace(1 / 8, 7 / 8, 7, dtype=np.float32)[None]
    g = jax.jit(lambda v, f, t: jnp.sum(jnp.asarray(
        engine._jit_forward(v, f, t)["st_final"], jnp.float32)))
    fd, td = jnp.asarray(frames), jnp.asarray(ts)
    float(g(engine.variables, fd, td))
    t0 = time.time()
    for _ in range(4):
        float(g(engine.variables, fd, td))
    report["device_window_ms"] = (time.time() - t0) / 4 * 1000

    # warm the engine's own jitted forward so neither timed mode pays
    # the compile (g above is a separate jit)
    engine.forward_windows(frames, ts)

    for mode, env in (("pipelined", "1"), ("serial", "0")):
        os.environ["DEMFI_EVAL_PIPELINE"] = env
        t0 = time.time()
        evaluate(cfg, engine, multiple=8, epoch=0, post_fix=f"_{mode}",
                 save_images=False)
        wall = time.time() - t0
        report[f"eval_wall_{mode}_s"] = round(wall, 2)
        report[f"eval_wall_{mode}_per_window_ms"] = (
            wall / args.windows * 1000)
    os.environ.pop("DEMFI_EVAL_PIPELINE", None)
    report["overlap_gain_ms_per_window"] = (
        report["eval_wall_serial_per_window_ms"]
        - report["eval_wall_pipelined_per_window_ms"])
    report["pipelined_within_15pct_of_device"] = bool(
        report["eval_wall_pipelined_per_window_ms"]
        <= 1.15 * report["device_window_ms"])

    print(json.dumps(report, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)
            f.write("\n")


if __name__ == "__main__":
    main()
