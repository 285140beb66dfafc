"""End-to-end learning sanity check on synthetic motion.

Generates a tiny Adobe240-style dataset with the reference's BIN blur
formation (sharp 240fps frames of a translating texture; blurry frames =
average of 11 consecutive sharp frames at stride 8, README.md:71) and
overfits DeMFI-Net_rb(1,1) for a few hundred steps. Passing criterion:
validation interpolation PSNR improves by a clear margin over the
untrained model — demonstrating the loss/gradients/data plumbing learns.

Usage: python scripts/synthetic_sanity.py [--steps 150] [--root DIR]
"""
from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import math
import os
import shutil
import tempfile

import numpy as np


def make_dataset(root: str, scenes: int = 2, n_sharp: int = 90,
                 size=(64, 96), seed: int = 0) -> None:
    import cv2

    rng = np.random.RandomState(seed)
    h, w = size
    for split in ("train", "test"):
        for s in range(scenes):
            # smooth random texture, periodic so translation wraps cleanly
            base = rng.uniform(0, 255, (h, w, 3)).astype(np.float32)
            for _ in range(3):
                base = cv2.blur(base, (7, 7))
            base = cv2.normalize(base, None, 0, 255, cv2.NORM_MINMAX)
            vx, vy = rng.uniform(0.5, 1.5, 2)  # px / sharp frame

            sharp_dir = os.path.join(root, split, f"scene{s}")
            blur_dir = os.path.join(root, f"{split}_blur", f"scene{s}")
            os.makedirs(sharp_dir, exist_ok=True)
            os.makedirs(blur_dir, exist_ok=True)

            sharps = []
            for i in range(n_sharp):
                m = np.float32([[1, 0, vx * i], [0, 1, vy * i]])
                f = cv2.warpAffine(base, m, (w, h),
                                   borderMode=cv2.BORDER_WRAP)
                sharps.append(f)
                cv2.imwrite(os.path.join(sharp_dir, f"{i:05d}.png"),
                            f.astype(np.uint8))
            # BIN: blur at center index c averages sharps [c-5, c+5]
            for k in range(10):
                c = 17 + 8 * k
                if c + 6 > n_sharp:
                    break
                blur = np.mean(sharps[c - 5:c + 6], axis=0)
                cv2.imwrite(os.path.join(blur_dir, f"{c:05d}.png"),
                            blur.astype(np.uint8))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=150)
    ap.add_argument("--root", type=str, default="")
    ap.add_argument("--lr", type=float, default=4e-4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from demfi_tpu.config import config_rb
    from demfi_tpu.models import make_model
    from demfi_tpu.data import AdobeTrainDataset, TrainLoader
    from demfi_tpu.infer import InferenceEngine
    from demfi_tpu.infer.driver import evaluate
    from demfi_tpu.train import create_train_state, make_train_step

    root = args.root or tempfile.mkdtemp(prefix="demfi_synth_")
    if not os.path.exists(os.path.join(root, "train")):
        print(f"generating synthetic BIN dataset under {root}")
        make_dataset(root)

    cfg = config_rb(1, 1, train_data_path=root, test_data_path=root,
                    patch_size=48, batch_size=2, init_lr=args.lr,
                    test_img_dir=os.path.join(root, "imgs"),
                    text_dir=os.path.join(root, "txt"),
                    checkpoint_dir=os.path.join(root, "ckpt"),
                    log_dir=os.path.join(root, "log"))
    model = make_model(cfg)
    state, tx = create_train_state(cfg, model, jax.random.PRNGKey(0),
                                   (1, 4, 48, 48, 3))
    step = make_train_step(cfg, model, tx)
    ds = AdobeTrainDataset(root, patch_size=48)
    loader = TrainLoader(ds, cfg.batch_size, num_threads=2)

    def val_psnr(params):
        engine = InferenceEngine(model, params, num_update=1)
        out = evaluate(cfg, engine, multiple=2, save_images=False)
        return out[1], out[3]  # interp, deblur PSNR

    ip0, dp0 = val_psnr(state.params)
    print(f"untrained: interp {ip0:.2f} dB  deblur {dp0:.2f} dB")

    it = 0
    epoch = 0
    while it < args.steps:
        for frames, ts in loader.epoch(epoch):
            state, m = step(state, jnp.asarray(frames), jnp.asarray(ts))
            it += 1
            if it % 25 == 0:
                print(f"step {it}: loss {float(m['total_loss']):.4f}")
            if it >= args.steps:
                break
        epoch += 1

    ip1, dp1 = val_psnr(state.params)
    print(f"trained({args.steps} steps): interp {ip1:.2f} dB "
          f"(+{ip1 - ip0:.2f})  deblur {dp1:.2f} dB (+{dp1 - dp0:.2f})")
    ok = ip1 - ip0 > 6.0 and dp1 - dp0 > 6.0
    print("SANITY", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
