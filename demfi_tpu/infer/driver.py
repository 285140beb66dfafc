"""Evaluation drivers: GT benchmark eval and custom (GT-free) interpolation.

Reproduces the reference test/test_custom drivers
(/root/reference/main.py:515-1107, 1109-1196): per-time-index PSNR/SSIM
meters for Stage I ("prime") and Stage II (final), scene-average rollover,
deblur accounting at the t=0.5 sample plus the trailing S1, PNG outputs —
while replacing the serial per-t forward with one t-batched engine call
per 4-frame window.
"""
from __future__ import annotations

import os
import queue
import threading
import time
from typing import Optional, Tuple

import cv2
import numpy as np

from demfi_tpu.config import DeMFIConfig
from demfi_tpu.data.datasets import (CustomDataset, EvalDataset, _imread,
                                     _normalize)
from demfi_tpu.infer.engine import InferenceEngine
from demfi_tpu.metrics import eval_pair_hwc, to_png_uint8
from demfi_tpu.utils.meters import AverageMeter, ProgressPrinter


def _lookahead(gen, depth: int = 2):
    """Run a generator on a worker thread with a bounded queue so device
    inference overlaps the host-side metrics/PNG work."""
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    err = []

    def worker():
        try:
            for item in gen:
                q.put(item)
        except BaseException as e:  # surface worker errors to the consumer
            err.append(e)
        finally:
            q.put(None)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is None:
            if err:
                raise err[0]
            return
        yield item


def _rec_loss_np(loss_type: str):
    if loss_type == "MSE":
        return lambda a, b: float(np.mean((a - b) ** 2))
    if loss_type == "L1_Charbonnier_loss":
        return lambda a, b: float(np.mean(np.sqrt((a - b) ** 2 + 1e-6)))
    return lambda a, b: float(np.mean(np.abs(a - b)))


class _SlotMeters:
    """PSNR/SSIM meters for interp slots 1..7 + deblur slot 8
    (main.py:540-624)."""

    def __init__(self, tag: str):
        self.psnr = {i: AverageMeter(f"PSNR_{i}{tag}:", ":.4e")
                     for i in range(1, 9)}
        self.ssim = {i: AverageMeter(f"SSIM_{i}{tag}:", ":.4e")
                     for i in range(1, 9)}

    def reset(self):
        for m in list(self.psnr.values()) + list(self.ssim.values()):
            m.reset()

    def update_from(self, other: "_SlotMeters"):
        for i in range(1, 9):
            self.psnr[i].update(other.psnr[i].avg, 1)
            self.ssim[i].update(other.ssim[i].avg, 1)


def _load_window(ds: EvalDataset, w: int):
    """Load one 4-frame window: blur inputs once + per-t GT frames."""
    m1 = ds.multiple - 1
    items = ds.items[w * m1:(w + 1) * m1]
    blur = np.stack([_imread(p) for p in items[0].blur_paths])
    s0 = _imread(items[0].s0_path)
    s1 = _imread(items[0].s1_path)
    sts = np.stack([_imread(it.st_path) for it in items])
    if ds.center_patch:
        ps = ds.center_patch
        ih, iw = blur.shape[1:3]
        iy, ix = (ih - ps) // 2, (iw - ps) // 2
        sl = np.s_[iy:iy + ps, ix:ix + ps]
        blur = blur[:, sl[0], sl[1]]
        s0, s1 = s0[sl], s1[sl]
        sts = sts[:, sl[0], sl[1]]
    return (_normalize(blur), _normalize(s0[None])[0], _normalize(s1[None])[0],
            _normalize(sts), items)


def evaluate(cfg: DeMFIConfig, engine: InferenceEngine, multiple: int,
             epoch: int = 0, center_patch: Optional[int] = None,
             test_type: Optional[str] = None, post_fix: str = "",
             save_images: bool = True, writer=None,
             test_patch: Tuple[int, int] = (1, 1),
             window_batch: int = 1,
             shard: Tuple[int, int] = (0, 1),
             ) -> Tuple[float, float, float, float, float, str]:
    """GT evaluation (reference ``test``). Returns (loss, intp_PSNR,
    intp_SSIM, deblur_PSNR, deblur_SSIM, save_path).

    ``shard=(process_id, process_count)``: multi-host evaluation assigns
    whole scenes round-robin to processes (scene rollover and the
    trailing-S1 deblur need contiguous scenes); each process writes its
    own scenes' PNGs and the returned headline metrics are the
    cross-process weighted averages (gathered via jax collectives)."""
    assert multiple in (2, 8), "phase test supports multiple in {2,8} (main.py:518)"
    ds = EvalDataset(cfg.test_data_path, multiple, cfg.t_step_size,
                     center_patch=center_patch, test_type=test_type)
    m1 = multiple - 1
    n_windows = len(ds) // m1
    pid, pcount = shard
    if pcount > 1:
        scene_order = []
        for w_ in range(n_windows):
            sc = ds.items[w_ * m1].scene
            if not scene_order or scene_order[-1] != sc:
                scene_order.append(sc)
        owned_scenes = set(scene_order[pid::pcount])
        owned = [w_ for w_ in range(n_windows)
                 if ds.items[w_ * m1].scene in owned_scenes]
    else:
        owned = list(range(n_windows))
    rec = _rec_loss_np(cfg.loss_type)

    batch_time = AverageMeter("Time:", ":6.3f")
    losses = AverageMeter("testLoss:", ":.4e")
    intp_psnr = {"prime": AverageMeter("intp_testPSNR_prime:", ":.4e"),
                 "final": AverageMeter("intp_testPSNR:", ":.4e")}
    intp_ssim = {"prime": AverageMeter("intp_testSSIM_prime:", ":.4e"),
                 "final": AverageMeter("intp_testSSIM:", ":.4e")}
    deblur_psnr = {"prime": AverageMeter("deblur_testPSNR_prime:", ":.4e"),
                   "final": AverageMeter("deblur_testPSNR:", ":.4e")}
    deblur_ssim = {"prime": AverageMeter("deblur_testSSIM_prime:", ":.4e"),
                   "final": AverageMeter("deblur_testSSIM:", ":.4e")}
    total = {k: _SlotMeters("_prime" if k == "prime" else "")
             for k in ("prime", "final")}
    scene = {k: _SlotMeters("_scene_prime" if k == "prime" else "_scene")
             for k in ("prime", "final")}

    if "val" in post_fix:
        save_root = os.path.join(cfg.test_img_dir, cfg.model_dir,
                                 "val_latest_" + post_fix)
    else:
        save_root = os.path.join(cfg.test_img_dir, cfg.model_dir,
                                 f"epoch_{str(epoch).zfill(5)}{post_fix}")
    os.makedirs(save_root, exist_ok=True)

    prev_scene = None
    last_s1 = None  # (psnr_p, ssim_p, psnr_f, ssim_f) of trailing S1
    tof_meter = AverageMeter("tOF:", ":.4e")
    prev_pred_st = None
    prev_gt_st = None

    def finalize_scene():
        """Scene rollover (main.py:633-720): trailing-S1 deblur update +
        fold scene averages into the totals."""
        if last_s1 is not None:
            pp, sp, pf, sf = last_s1
            scene["prime"].psnr[8].update(pp, 1)
            scene["prime"].ssim[8].update(sp, 1)
            scene["final"].psnr[8].update(pf, 1)
            scene["final"].ssim[8].update(sf, 1)
            deblur_psnr["prime"].update(pp, 1)
            deblur_ssim["prime"].update(sp, 1)
            deblur_psnr["final"].update(pf, 1)
            deblur_ssim["final"].update(sf, 1)
        for k in ("prime", "final"):
            total[k].update_from(scene[k])
            scene[k].reset()

    def iter_dispatched():
        """Yield (chunk, pending-or-results): load ``window_batch``
        same-shape windows, then either async-dispatch them (untiled —
        pending handle) or run them eagerly (tiled path)."""
        w = 0
        n_owned = len(owned)
        while w < n_owned:
            chunk = [_load_window(ds, owned[w])]
            h_, w_ = chunk[0][0].shape[1:3]
            # the batched path skips the reflect-pad step, so it requires
            # 32-multiple frames (forward_window pads otherwise)
            if test_patch == (1, 1) and h_ % 32 == 0 and w_ % 32 == 0:
                while (len(chunk) < window_batch
                       and w + len(chunk) < n_owned):
                    nxt = _load_window(ds, owned[w + len(chunk)])
                    if nxt[0].shape != chunk[0][0].shape:
                        break
                    chunk.append(nxt)
            t0 = time.time()
            if test_patch == (1, 1):
                frames = np.stack([c[0] for c in chunk])
                ts_b = np.asarray([[it.t_value for it in c[4]]
                                   for c in chunk], np.float32)
                dispatch = getattr(engine, "dispatch_windows", None)
                if dispatch is not None:
                    pending = dispatch(frames, ts_b,
                                       patch_boundary=cfg.patch_boundary)
                    if pending is not None:
                        yield chunk, ("pending", pending, t0)
                        w += len(chunk)
                        continue
                elif len(chunk) > 1:   # engine-like stubs (tests)
                    yield chunk, ("done", engine.forward_windows(
                        frames, ts_b,
                        patch_boundary=cfg.patch_boundary), t0)
                    w += len(chunk)
                    continue
            results = [engine.forward_window(
                c[0][None],
                np.asarray([it.t_value for it in c[4]], np.float32),
                test_patch=test_patch,
                patch_boundary=cfg.patch_boundary) for c in chunk]
            yield chunk, ("done", results, t0)
            w += len(chunk)

    def iter_results():
        """Yield (window_data, WindowResult) with a two-deep device
        pipeline: chunk N+1 is DISPATCHED before chunk N's results are
        fetched, so the device computes through the tunnel readback +
        the consumer's metrics work (round-4 VERDICT #8).
        DEMFI_EVAL_PIPELINE=0 restores serial dispatch->fetch for A/B."""
        pipelined = bool(int(os.environ.get("DEMFI_EVAL_PIPELINE",
                                            "1") or "1"))
        it = iter_dispatched()
        prev = next(it, None)
        while prev is not None:
            # pipelined: dispatch N+1 BEFORE fetching N
            nxt = next(it, None) if pipelined else None
            chunk, (kind, payload, t0) = prev
            results = (engine.fetch_windows(payload)
                       if kind == "pending" else payload)
            batch_time.update((time.time() - t0) / len(chunk), len(chunk))
            for c, r in zip(chunk, results):
                yield c, r
            prev = nxt if pipelined else next(it, None)

    for w, ((blur, s0_gt, s1_gt, sts_gt, items), res) in enumerate(
            _lookahead(iter_results())):
        if items[0].scene != prev_scene:
            if prev_scene is not None:
                finalize_scene()
            prev_scene = items[0].scene
            prev_pred_st = prev_gt_st = None

        scene_dir = os.path.join(save_root, items[0].scene)
        if save_images:
            os.makedirs(scene_dir, exist_ok=True)

        for j, it in enumerate(items):
            p_st_p, s_st_p = eval_pair_hwc(res.st_prime[j], sts_gt[j])
            p_st_f, s_st_f = eval_pair_hwc(res.st_final[j], sts_gt[j])
            p_s0_p, s_s0_p = eval_pair_hwc(res.s0_prime[j], s0_gt)
            p_s0_f, s_s0_f = eval_pair_hwc(res.s0_final[j], s0_gt)
            p_s1_p, s_s1_p = eval_pair_hwc(res.s1_prime[j], s1_gt)
            p_s1_f, s_s1_f = eval_pair_hwc(res.s1_final[j], s1_gt)
            last_s1 = (p_s1_p, s_s1_p, p_s1_f, s_s1_f)

            losses.update(cfg.rec_D2_lambda
                          * rec(res.st_final[j], sts_gt[j]), 1)

            if cfg.experimental_tof:
                from demfi_tpu.metrics import tof_pair
                if prev_pred_st is not None:
                    tof_meter.update(tof_pair(prev_pred_st, res.st_final[j],
                                              prev_gt_st, sts_gt[j]), 1)
                prev_pred_st = res.st_final[j]
                prev_gt_st = sts_gt[j]

            # interp slot: x8 -> slots 1..7; x2 -> slot 4 (main.py:890-1032)
            slot = (j + 1) if multiple == 8 else 4
            for k, (pv, sv) in (("prime", (p_st_p, s_st_p)),
                                ("final", (p_st_f, s_st_f))):
                scene[k].psnr[slot].update(pv, 1)
                scene[k].ssim[slot].update(sv, 1)
                intp_psnr[k].update(pv, 1)
                intp_ssim[k].update(sv, 1)

            # deblur at the t=0.5 sample (x8: j==3; x2: every sample)
            if (multiple == 8 and j == 3) or multiple == 2:
                scene["prime"].psnr[8].update(p_s0_p, 1)
                scene["prime"].ssim[8].update(s_s0_p, 1)
                scene["final"].psnr[8].update(p_s0_f, 1)
                scene["final"].ssim[8].update(s_s0_f, 1)
                deblur_psnr["prime"].update(p_s0_p, 1)
                deblur_ssim["prime"].update(s_s0_p, 1)
                deblur_psnr["final"].update(p_s0_f, 1)
                deblur_ssim["final"].update(s_s0_f, 1)

            if save_images:
                cv2.imwrite(os.path.join(scene_dir, it.st_path and
                                         os.path.basename(it.st_path)),
                            to_png_uint8(res.st_final[j]))
                if j == 0 or (multiple == 8 and j == 3) or multiple == 2:
                    cv2.imwrite(os.path.join(
                        scene_dir, os.path.basename(it.s0_path)),
                        to_png_uint8(res.s0_final[j]))
                    cv2.imwrite(os.path.join(
                        scene_dir, os.path.basename(it.s1_path)),
                        to_png_uint8(res.s1_final[j]))

            if save_images and cfg.visualization_flag:
                from demfi_tpu.utils.viz import eval_visualization
                viz_dir = os.path.join(
                    save_root + "_visualizations", items[0].scene)
                os.makedirs(viz_dir, exist_ok=True)
                grid = eval_visualization(
                    res.ovlp[j], res.st_prime[j], res.st_final[j],
                    sts_gt[j], res.flow_init[j], res.flow_final[j],
                    res.occ0_init[j], res.occ0_final[j],
                    res.blend_w0[j], res.blend_w1[j],
                    res.diff_10[j], res.diff_01[j],
                    fgac_10=(res.fgac_src_10[j], res.fgac_ref_10[j],
                             res.fgac_warp_10[j], res.fgac_fcw_10[j]),
                    fgac_01=(res.fgac_src_01[j], res.fgac_ref_01[j],
                             res.fgac_warp_01[j], res.fgac_fcw_01[j]),
                    flow_01=res.flow_01[j], flow_10=res.flow_10[j])
                cv2.imwrite(os.path.join(
                    viz_dir, os.path.basename(it.st_path)), grid)

        if writer is not None:
            tb = w * m1 + epoch * len(ds)
            writer.add_scalar("testLoss", losses.val, tb)
            writer.add_scalar("intp_testPSNR", intp_psnr["final"].val, tb)
            writer.add_scalar("deblur_testPSNR", deblur_psnr["final"].val, tb)

    finalize_scene()

    if pcount > 1:
        # Weighted cross-process aggregation: the 5 headline meters AND
        # the 2x2x8 per-slot (Fig.5 per-time-index PSNR_1..7 + deblur)
        # meters, so a scene-sharded eval prints the same publishable
        # per-index table a single-process run would
        # (reference main.py:890-1032,1098-1105).
        from jax.experimental import multihost_utils
        meters = [losses, intp_psnr["final"], intp_ssim["final"],
                  deblur_psnr["final"], deblur_ssim["final"]]
        meters += [total[k].psnr[i]
                   for k in ("prime", "final") for i in range(1, 9)]
        meters += [total[k].ssim[i]
                   for k in ("prime", "final") for i in range(1, 9)]
        n_m = len(meters)
        local = np.asarray([[m.sum for m in meters]
                            + [m.count for m in meters]], np.float64)
        allp = np.asarray(multihost_utils.process_allgather(local))
        allp = allp.reshape(-1, 2 * n_m)
        sums, counts = allp[:, :n_m].sum(0), allp[:, n_m:].sum(0)
        for m, s_, c_ in zip(meters, sums, counts):
            m.sum, m.count = float(s_), int(c_)
            m.avg = float(s_ / max(c_, 1))
        print(f"[eval shard {pid}/{pcount}] aggregated over "
              f"{int(counts[1])} interp samples across processes")

    # the per-stage tables now read cross-process-merged slot meters;
    # only the per-window timing below stays process-local
    loc = ""
    n_print = n_windows
    print("-" * 40 + f" x{multiple} MFI results{loc} " + "-" * 40)
    for k in ("prime", "final"):
        stage = "Stage I" if k == "prime" else "Stage II"
        pp = ProgressPrinter(n_print, *total[k].psnr.values(),
                             prefix=f"[PSNR {stage} (7 intp, 1 dblr)]{loc} :")
        pp.print(n_print)
        ps = ProgressPrinter(n_print, *total[k].ssim.values(),
                             prefix=f"[SSIM {stage} (7 intp, 1 dblr)]{loc} :")
        ps.print(n_print)
    if cfg.experimental_tof:
        print(" tOF (EXPERIMENTAL, unvalidated definition):", tof_meter.avg)
    print(" Average Inference Time per Window:", batch_time.avg)
    return (losses.avg, intp_psnr["final"].avg, intp_ssim["final"].avg,
            deblur_psnr["final"].avg, deblur_ssim["final"].avg, save_root)


def evaluate_custom(cfg: DeMFIConfig, engine: InferenceEngine,
                    multiple: int,
                    test_patch: Tuple[int, int] = (1, 1),
                    shard: Tuple[int, int] = (0, 1)) -> None:
    """GT-free interpolation of user scenes (reference ``test_custom``,
    main.py:1109-1196): writes S0/S1 once per window plus every St into
    <custom_path>/<scene>_sharply_interpolated_xM/.

    ``shard=(process_id, process_count)`` assigns whole scenes
    round-robin for multi-host runs (each process writes its own)."""
    ds = CustomDataset(cfg.custom_path, multiple)
    m1 = multiple - 1
    n_windows = len(ds) // m1
    batch_time = AverageMeter("Time:", ":6.3f")

    pid, pcount = shard
    owned_w = list(range(n_windows))
    if pcount > 1:
        scene_order = []
        for w_ in range(n_windows):
            sc = ds.items[w_ * m1].scene
            if not scene_order or scene_order[-1] != sc:
                scene_order.append(sc)
        owned = set(scene_order[pid::pcount])
        owned_w = [w_ for w_ in range(n_windows)
                   if ds.items[w_ * m1].scene in owned]

    for w in owned_w:
        items = ds.items[w * m1:(w + 1) * m1]
        blur = _normalize(np.stack([_imread(p)
                                    for p in items[0].blur_paths]))
        ts = np.asarray([it.t_value for it in items], np.float32)
        t0 = time.time()
        res = engine.forward_window(blur[None], ts, test_patch=test_patch,
                                    patch_boundary=cfg.patch_boundary)
        batch_time.update(time.time() - t0)

        out_dir = os.path.join(
            cfg.custom_path,
            f"{items[0].scene}_sharply_interpolated_x{multiple}")
        os.makedirs(out_dir, exist_ok=True)
        cv2.imwrite(os.path.join(out_dir, items[0].s0_path),
                    to_png_uint8(res.s0_final[0]))
        cv2.imwrite(os.path.join(out_dir, items[0].s1_path),
                    to_png_uint8(res.s1_final[0]))
        for j, it in enumerate(items):
            cv2.imwrite(os.path.join(out_dir, it.st_path),
                        to_png_uint8(res.st_final[j]))
            print(f"png for predicted St frame has been saved in "
                  f"[{os.path.join(out_dir, it.st_path)}]")

            if cfg.visualization_flag:
                from demfi_tpu.utils.viz import eval_visualization
                viz_dir = out_dir + "_visualizations"
                os.makedirs(viz_dir, exist_ok=True)
                grid = eval_visualization(
                    res.ovlp[j], res.st_prime[j], res.st_final[j], None,
                    res.flow_init[j], res.flow_final[j],
                    res.occ0_init[j], res.occ0_final[j],
                    res.blend_w0[j], res.blend_w1[j],
                    res.diff_10[j], res.diff_01[j],
                    fgac_10=(res.fgac_src_10[j], res.fgac_ref_10[j],
                             res.fgac_warp_10[j], res.fgac_fcw_10[j]),
                    fgac_01=(res.fgac_src_01[j], res.fgac_ref_01[j],
                             res.fgac_warp_01[j], res.fgac_fcw_01[j]),
                    flow_01=res.flow_01[j], flow_10=res.flow_10[j])
                cv2.imwrite(os.path.join(viz_dir, it.st_path), grid)
    print(" Average Inference Time per Window:", batch_time.avg)
