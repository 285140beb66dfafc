"""One-command Table-2 reproduction harness.

The day the Adobe240/GoPro240 blobs and the released
``DeMFInet_exp1_latest.pt`` checkpoint become available, reproducing the
paper's Table 2 (reference /root/reference/main.py:515-1107,
README.md:100-113) is a single invocation:

    python scripts/repro_table2.py --data /path/to/Adobe_240fps_blur \
        --ckpt /path/to/DeMFInet_exp1_latest.pt

It preflights the dataset layout and the checkpoint key/shape manifest
(clear errors BEFORE any chip time is spent), runs ``--phase test``-
equivalent evaluation at x8 (and optionally x2), and prints a
BASELINE.md-style diff table with pass/fail at the 0.05 dB budget
(BASELINE.json). Known-good end-to-end on a synthetic fixture tree via
tests/test_repro_harness.py (random weights, --budget_db inf).
"""
from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import dataclasses
import json
import os
import time

import numpy as np

# Table 2, DeMFI-Net_rb(5,3) row (figures/Table2.PNG via BASELINE.md):
# per dataset {metric: (PSNR, SSIM)}.
TABLE2_RB53 = {
    "adobe": {"deblur": (34.19, 0.9410), "interp_x8": (34.29, 0.9454)},
    "youtube": {"deblur": (33.31, 0.9282), "interp_x8": (33.33, 0.9300)},
    "gopro": {"deblur": (30.82, 0.8991), "interp_x8": (31.25, 0.9102)},
}


def detect_dataset(data_path: str) -> str:
    p = data_path.lower()
    if "gopro" in p:
        return "gopro"
    if "youtube" in p:
        return "youtube"
    return "adobe"


def preflight_dataset(data_path: str) -> dict:
    """Validate the eval tree layout (data/datasets.py::build_eval_index
    conventions, mirroring reference utils.py:421-469). Raises
    SystemExit with an actionable message on any structural problem."""
    if "BlurLFR" in data_path:
        zf6 = "Gopro" in data_path or "GoPro" in data_path
        sharp = data_path[:-3] + ("_test_GT_zfill6" if zf6
                                  else "_test_GT_zfill5")
        blur = data_path
    else:
        sharp = os.path.join(data_path, "test")
        blur = os.path.join(data_path, "test_blur")
    for d, what in ((blur, "blurry test frames"), (sharp, "sharp GT")):
        if not os.path.isdir(d):
            raise SystemExit(
                f"preflight: missing directory for {what}: {d}\n"
                "expected layout: <data>/test_blur/<scene>/*.png + "
                "<data>/test/<scene>/*.png (or a BlurLFR dir with a "
                "sibling *_test_GT_zfill{5,6})")
    bscenes = sorted(os.listdir(blur))
    sscenes = set(os.listdir(sharp))
    if not bscenes:
        raise SystemExit(f"preflight: no scene directories under {blur}")
    missing = [s for s in bscenes if s not in sscenes]
    if missing:
        raise SystemExit(f"preflight: scenes missing sharp GT: {missing}")
    n_frames, stride = 0, None
    for sc in bscenes:
        frames = sorted(os.listdir(os.path.join(blur, sc)))
        pngs = [f for f in frames if f.endswith(".png")]
        if len(pngs) < 4:
            raise SystemExit(f"preflight: scene {sc} has {len(pngs)} "
                             "blur frames; need >= 4 for one window")
        idxs = [int(f[:-4]) for f in pngs[:3]]
        st = idxs[1] - idxs[0]
        if stride is None:
            stride = st
        n_frames += len(pngs)
    import cv2
    sample = os.path.join(blur, bscenes[0],
                          sorted(os.listdir(os.path.join(blur, bscenes[0])))[0])
    img = cv2.imread(sample)
    if img is None:
        raise SystemExit(f"preflight: unreadable png {sample}")
    info = dict(scenes=len(bscenes), blur_frames=n_frames,
                frame_stride=stride, height=img.shape[0],
                width=img.shape[1],
                zfill=len(os.path.basename(sample)) - 4)
    print(f"preflight dataset OK: {info}")
    return info


def preflight_checkpoint(ckpt: str, cfg) -> dict:
    """Load the checkpoint (reference .pt or native dir/msgpack) and
    verify its key/shape manifest against the rb(N,N) model init."""
    import jax
    import jax.numpy as jnp

    from demfi_tpu.models import make_model

    model = make_model(dataclasses.replace(cfg, scan_booster=False))
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 4, 32, 32, 3)),
                           jnp.zeros((1, 1)), num_update=1))

    if ckpt.endswith(".pt"):
        from demfi_tpu.checkpoint.convert import load_pt_checkpoint
        variables, meta = load_pt_checkpoint(ckpt)
    else:
        from demfi_tpu.checkpoint.manager import ExperimentManager
        zeros = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), template)
        if os.path.isdir(ckpt):
            cfg2 = dataclasses.replace(cfg, checkpoint_dir=os.path.dirname(
                os.path.abspath(ckpt)), model_dir=os.path.basename(
                os.path.normpath(ckpt)))
            variables, _, meta = ExperimentManager(cfg2).load_latest(zeros)
        else:
            raise SystemExit(f"preflight: unsupported checkpoint {ckpt} "
                             "(expected a reference .pt file or a native "
                             "experiment directory)")

    want = {jax.tree_util.keystr(k): v.shape for k, v in
            jax.tree_util.tree_leaves_with_path(template)}
    have = {jax.tree_util.keystr(k): np.asarray(v).shape for k, v in
            jax.tree_util.tree_leaves_with_path(variables)}
    missing = sorted(set(want) - set(have))
    extra = sorted(set(have) - set(want))
    bad = sorted(k for k in set(want) & set(have)
                 if tuple(want[k]) != tuple(have[k]))
    if missing or extra or bad:
        lines = [f"preflight: checkpoint does not match "
                 f"DeMFI-Net_rb params:"]
        for k in missing[:8]:
            lines.append(f"  missing {k} {want[k]}")
        for k in extra[:8]:
            lines.append(f"  unexpected {k} {have[k]}")
        for k in bad[:8]:
            lines.append(f"  shape {k}: ckpt {have[k]} != model {want[k]}")
        raise SystemExit("\n".join(lines))
    print(f"preflight checkpoint OK: {len(have)} arrays, "
          f"epoch={meta.get('last_epoch', '?')}")
    return variables


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--data", required=True,
                    help="dataset root (test/ + test_blur/) or BlurLFR dir")
    ap.add_argument("--ckpt", required=True,
                    help="reference DeMFInet_exp1_latest.pt or a native "
                         "experiment checkpoint directory")
    ap.add_argument("--dataset", default="auto",
                    choices=["auto", "adobe", "youtube", "gopro"])
    ap.add_argument("--multiples", default="8",
                    help="comma list from {2,8}; Table 2 is x8")
    ap.add_argument("--N_tst", type=int, default=3)
    ap.add_argument("--test_patch", type=int, nargs=2, default=(1, 1))
    ap.add_argument("--budget_db", type=float, default=0.05,
                    help="BASELINE.json parity budget")
    ap.add_argument("--compute_dtype", default="float32",
                    help="float32 reproduces reference numerics; "
                         "bfloat16 is the serving mode (see PERF.md "
                         "bf16-vs-f32 dB certification)")
    ap.add_argument("--eval_window_batch", type=int, default=1)
    ap.add_argument("--save_pngs", action="store_true")
    ap.add_argument("--out", default="tpu_reports/repro_table2.json")
    ap.add_argument("--workdir", default="",
                    help="where experiment dirs (pngs/logs) go; default "
                         "a tempdir")
    args = ap.parse_args(argv)

    dataset = (detect_dataset(args.data) if args.dataset == "auto"
               else args.dataset)
    ds_info = preflight_dataset(args.data)

    from demfi_tpu.config import config_rb
    import tempfile
    wd = args.workdir or tempfile.mkdtemp(prefix="repro_t2_")
    cfg = config_rb(args.N_tst, args.N_tst,
                    test_data_path=args.data,
                    compute_dtype=args.compute_dtype,
                    eval_window_batch=args.eval_window_batch,
                    test_patch=tuple(args.test_patch),
                    checkpoint_dir=os.path.join(wd, "ckpt"),
                    test_img_dir=os.path.join(wd, "imgs"),
                    text_dir=os.path.join(wd, "text"),
                    log_dir=os.path.join(wd, "log"))
    variables = preflight_checkpoint(args.ckpt, cfg)

    from demfi_tpu.infer import InferenceEngine
    from demfi_tpu.infer.driver import evaluate
    from demfi_tpu.models import make_model

    model = make_model(dataclasses.replace(cfg, scan_booster=False))
    engine = InferenceEngine(model, variables, cfg.N_tst,
                             t_chunk=cfg.t_chunk or None,
                             fetch="images")

    report = {"data": args.data, "ckpt": args.ckpt, "dataset": dataset,
              "N_tst": args.N_tst, "dtype": args.compute_dtype,
              "budget_db": args.budget_db, "dataset_info": ds_info,
              "results": {}}
    baseline = TABLE2_RB53[dataset]
    rows, n_fail = [], 0
    for mult in (int(m) for m in args.multiples.split(",")):
        t0 = time.time()
        _, ipsnr, issim, dpsnr, dssim, _ = evaluate(
            cfg, engine, multiple=mult, epoch=0,
            post_fix=f"_repro_x{mult}", save_images=args.save_pngs,
            test_patch=tuple(args.test_patch),
            window_batch=args.eval_window_batch)
        report["results"][f"x{mult}"] = dict(
            interp_psnr=ipsnr, interp_ssim=issim,
            deblur_psnr=dpsnr, deblur_ssim=dssim,
            wall_s=time.time() - t0)
        for name, got_p, got_s in (("deblur", dpsnr, dssim),
                                   (f"interp_x{mult}", ipsnr, issim)):
            if name in baseline:
                ref_p, ref_s = baseline[name]
                d = got_p - ref_p
                ok = abs(d) <= args.budget_db
                n_fail += not ok
                rows.append((f"{dataset} {name}", ref_p, got_p, d,
                             ref_s, got_s, "PASS" if ok else "FAIL"))
            else:
                rows.append((f"{dataset} {name}", float("nan"), got_p,
                             float("nan"), float("nan"), got_s, "info"))

    print(f"\n{'metric':28s} {'Table2':>8s} {'ours':>8s} {'dPSNR':>7s} "
          f"{'SSIM(T2)':>9s} {'SSIM':>7s}  verdict")
    for name, rp, gp, d, rs, gs, v in rows:
        print(f"{name:28s} {rp:8.2f} {gp:8.2f} {d:+7.3f} "
              f"{rs:9.4f} {gs:7.4f}  {v}")
    report["rows"] = [list(r) for r in rows]
    report["pass"] = n_fail == 0
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"\nwrote {args.out}; "
          + ("ALL WITHIN BUDGET" if n_fail == 0
             else f"{n_fail} metrics OUTSIDE the {args.budget_db} dB budget"))
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
