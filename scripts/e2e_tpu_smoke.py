"""End-to-end CLI smoke on the current backend (TPU when healthy).

Exercises the REAL user surface on silicon — not a jitted window but the
full `--phase test_custom` path: parse_args -> checkpoint load ->
InferenceEngine -> evaluate_custom -> PNGs on disk (the reference's
custom-clip flow, /root/reference/main.py:840-905). A random-init
checkpoint is seeded first (no released weights ship in this
environment; parity is pinned separately by tests/test_checkpoint.py).

Prints ONE JSON line {"ok": bool, ...} and exits non-zero on failure.

Usage: python scripts/e2e_tpu_smoke.py [--res 192x320] [--dtype bfloat16]
       [--multiple 4] [--out e2e_smoke.json]

Default geometry 192x320: the largest size verified f32-clean on this
relay/libtpu (ROUND3_NOTES.md "f32 NaN"), so the same command can A/B
both dtypes.
"""
from __future__ import annotations

import argparse
import dataclasses
import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def synthetic_scene(root: str, h: int, w: int, n: int = 5) -> str:
    """n frames of a smoothly translating gradient + blob (structured, so
    interpolation output is meaningful and non-constant)."""
    import cv2

    scene = os.path.join(root, "clipA")
    os.makedirs(scene, exist_ok=True)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    for i in range(n):
        cx, cy = w * (0.3 + 0.1 * i), h * (0.4 + 0.05 * i)
        blob = 255.0 * np.exp(-(((xx - cx) / (w * 0.08)) ** 2
                                + ((yy - cy) / (h * 0.08)) ** 2))
        grad = 128.0 + 100.0 * np.sin(2 * np.pi * (xx + 7 * i) / w)
        img = np.stack([grad, blob, 0.5 * grad + 0.5 * blob], -1)
        cv2.imwrite(os.path.join(scene, f"{str(i).zfill(5)}.png"),
                    img.clip(0, 255).astype(np.uint8))
    return scene


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", default="192x320")
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--multiple", type=int, default=4)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    h, w = (int(x) for x in args.res.split("x"))

    import jax

    # same override hook as demfi_tpu.main.cli — needed here too because
    # the checkpoint seeding below runs jax ops BEFORE cli() applies it
    plat = os.environ.get("DEMFI_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    import cv2  # noqa: F401 (fail early if unavailable)
    import jax.numpy as jnp

    from demfi_tpu.checkpoint.manager import ExperimentManager
    from demfi_tpu.main import cli, parse_args
    from demfi_tpu.models import make_model

    tmp = tempfile.mkdtemp(prefix="demfi_e2e_")
    scene = synthetic_scene(os.path.join(tmp, "custom"), h, w)
    argv = ["--phase", "test_custom",
            "--custom_path", os.path.join(tmp, "custom"),
            "--multiple_MFI", str(args.multiple),
            "--compute_dtype", args.dtype,
            "--checkpoint_dir", os.path.join(tmp, "ckpt"),
            "--text_dir", os.path.join(tmp, "text"),
            "--log_dir", os.path.join(tmp, "log"),
            "--test_img_dir", os.path.join(tmp, "imgs")]
    cfg = parse_args(argv)
    model = make_model(dataclasses.replace(cfg, scan_booster=False))
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 4, 32, 32, 3)), jnp.zeros((1, 1)),
                        num_update=1)
    ExperimentManager(cfg).save_latest(params, meta={"last_epoch": 0})

    t0 = time.time()
    cli(argv)
    wall = time.time() - t0

    out_dir = scene + f"_sharply_interpolated_x{args.multiple}"
    pngs = sorted(glob.glob(os.path.join(out_dir, "*.png")))
    finite = bool(pngs)
    nonconst = False
    for p in pngs:
        im = cv2.imread(p)
        finite &= bool(im is not None
                       and np.isfinite(im.astype(np.float64)).all())
        nonconst |= bool(im is not None and im.std() > 1.0)
    rec = {
        "ok": bool(finite and nonconst and len(pngs) >= args.multiple),
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "res": args.res, "dtype": args.dtype,
        "multiple": args.multiple, "n_pngs": len(pngs),
        "outputs_finite": finite, "outputs_nonconstant": nonconst,
        "wall_s": round(wall, 1),
    }
    line = json.dumps(rec)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    return 0 if rec["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
