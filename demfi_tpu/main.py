"""DeMFI-TPU command-line interface.

Preserves the reference CLI surface (/root/reference/main.py:22-127):

  python -m demfi_tpu.main --phase train
  python -m demfi_tpu.main --phase test        --multiple_MFI 8
  python -m demfi_tpu.main --phase test_custom --custom_path ./custom_path

plus TPU extensions (--compute_dtype, --mesh_data/--mesh_spatial).
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import time
from datetime import datetime

import numpy as np

from demfi_tpu.config import DeMFIConfig


def str2bool(v) -> bool:
    """Boolean CLI parser (the reference ships one unused at
    utils.py:724-743 while its own ``type=bool`` flags silently parse
    '--need_patch False' as True — any non-empty string is truthy).
    Accepts yes/no/true/false/t/f/y/n/1/0, case-insensitive."""
    if isinstance(v, bool):
        return v
    s = str(v).strip().lower()
    if s in ("yes", "true", "t", "y", "1"):
        return True
    if s in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError(f"boolean value expected, got {v!r}")


def parse_args(argv=None) -> DeMFIConfig:
    p = argparse.ArgumentParser(description="TPU-native DeMFI")
    d = DeMFIConfig()
    p.add_argument("--gpu", type=int, default=0,
                   help="accepted for reference compatibility; ignored "
                        "(device selection is JAX's)")
    p.add_argument("--net_type", type=str, default=d.net_type,
                   choices=["DeMFInet"])
    p.add_argument("--exp_num", type=int, default=d.exp_num)
    p.add_argument("--phase", type=str, default=d.phase,
                   choices=["train", "test", "test_custom"])
    p.add_argument("--test_epoch_point", type=int, default=None)
    p.add_argument("--fine_tuning", action="store_true")
    p.add_argument("--fine_tuning_epoch_point", type=int, default=None)
    p.add_argument("--test_img_dir", type=str, default=d.test_img_dir)
    p.add_argument("--text_dir", type=str, default=d.text_dir)
    p.add_argument("--checkpoint_dir", type=str, default=d.checkpoint_dir)
    p.add_argument("--log_dir", type=str, default=d.log_dir)
    p.add_argument("--train_data_path", type=str, default=d.train_data_path)
    p.add_argument("--test_data_path", type=str, default=d.test_data_path)
    p.add_argument("--t_step_size", type=int, default=d.t_step_size)
    p.add_argument("--t_sampling_num", type=int, default=d.t_sampling_num)
    p.add_argument("--epochs", type=int, default=d.epochs)
    p.add_argument("--freq_display", type=int, default=d.freq_display)
    p.add_argument("--epoch_freq_display", type=int,
                   default=d.epoch_freq_display)
    p.add_argument("--epoch_freq_save", type=int, default=d.epoch_freq_save)
    p.add_argument("--init_lr", type=float, default=d.init_lr)
    p.add_argument("--lr_type", type=str, default=d.lr_type,
                   choices=["linear_decay", "stair_decay", "no_decay"])
    p.add_argument("--lr_dec_fac", type=float, default=d.lr_dec_fac)
    p.add_argument("--lr_milestones", type=int, nargs="+",
                   default=list(d.lr_milestones))
    p.add_argument("--lr_dec_start", type=int, default=d.lr_dec_start)
    p.add_argument("--batch_size", type=int, default=d.batch_size)
    p.add_argument("--weight_decay", type=float, default=d.weight_decay)
    p.add_argument("--need_patch", type=str2bool, default=d.need_patch)
    p.add_argument("--img_ch", type=int, default=d.img_ch,
                   help="accepted for reference CLI compatibility; only "
                        "3 is supported (see parse_args validation)")
    p.add_argument("--nf", type=int, default=d.nf)
    p.add_argument("--scale_factor", type=int, default=d.scale_factor)
    p.add_argument("--patch_size", type=int, default=d.patch_size)
    p.add_argument("--num_thrds", type=int, default=d.num_thrds)
    p.add_argument("--loss_type", type=str, default=d.loss_type,
                   choices=["L1", "MSE", "L1_Charbonnier_loss"])
    p.add_argument("--num_ResB_FACFB", type=int, default=d.num_ResB_FACFB)
    p.add_argument("--num_ResB_Dec", type=int, default=d.num_ResB_Dec)
    p.add_argument("--N_trn", type=int, default=d.N_trn)
    p.add_argument("--N_tst", type=int, default=d.N_tst)
    p.add_argument("--shared_FGAC_flag", type=str2bool,
                   default=d.shared_FGAC_flag)
    p.add_argument("--rec_D1_lambda", type=float, default=d.rec_D1_lambda)
    p.add_argument("--rec_D2_lambda", type=float, default=d.rec_D2_lambda)
    p.add_argument("--load_best_PSNR_flag", action="store_true")
    p.add_argument("--visualization_flag", action="store_true")
    p.add_argument("--test_patch", type=int, nargs=2, default=list(d.test_patch))
    p.add_argument("--patch_boundary", type=int, default=d.patch_boundary)
    p.add_argument("--multiple_MFI", type=int, default=d.multiple_MFI)
    p.add_argument("--custom_path", type=str, default=d.custom_path)
    # TPU extensions
    p.add_argument("--compute_dtype", type=str, default=d.compute_dtype,
                   choices=["float32", "bfloat16"])
    p.add_argument("--mesh_data", type=int, default=d.mesh_data)
    p.add_argument("--mesh_spatial", type=int, default=d.mesh_spatial)
    p.add_argument("--coordinator_address", type=str, default=None,
                   help="host:port of process 0 for multi-host training")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--auto_resume", action="store_true",
                   help="resume from the latest checkpoint if one exists "
                        "(elastic restart after crash/preemption)")
    p.add_argument("--experimental_tof", "--compute_tOF",
                   dest="experimental_tof", action="store_true",
                   help="EXPERIMENTAL tOF-style metric (not validated "
                        "against the paper's Table 2 numbers; the "
                        "reference code never computes tOF)")
    p.add_argument("--eval_window_batch", type=int, default=d.eval_window_batch)
    p.add_argument("--t_chunk", type=int, default=d.t_chunk)
    p.add_argument("--pallas_vr", type=int, default=d.pallas_vr,
                   help="Pallas warp-kernel vertical motion window (rows); "
                        "larger flows auto-fall back to the exact XLA path")
    p.add_argument("--pallas_span", type=int, default=d.pallas_span,
                   help="Pallas FGAC-sampler absolute row span")
    p.add_argument("--seed", type=int, default=d.seed)
    a = p.parse_args(argv)

    if a.img_ch != 3:
        # The reference plumbs --img_ch only into its data loaders
        # (utils.py:360,494,591); its model hard-codes 3-channel convs,
        # so img_ch=1 crashes upstream with an opaque shape error.
        # Reject loudly instead of silently ignoring the flag (the
        # BT.601 Y-conversion itself is implemented and tested:
        # data/datasets.py::_normalize(channels=1)).
        p.error(f"--img_ch {a.img_ch} is not supported: the DeMFI "
                "architecture is 3-channel (the reference model "
                "hard-codes 3-channel convs and would crash too); "
                "only --img_ch 3 is valid")

    fields = {f.name for f in dataclasses.fields(DeMFIConfig)}
    kwargs = {k: v for k, v in vars(a).items() if k in fields}
    kwargs["test_patch"] = tuple(a.test_patch)
    kwargs["lr_milestones"] = tuple(a.lr_milestones)
    kwargs["fine_tuning"] = bool(a.fine_tuning)
    kwargs["auto_resume"] = bool(a.auto_resume)
    return DeMFIConfig(**kwargs)


def _writer(cfg):
    try:
        from tensorboardX import SummaryWriter
        return SummaryWriter(cfg.log_dir)
    except Exception:
        return None


def run_train(cfg: DeMFIConfig) -> None:
    import jax
    import jax.numpy as jnp

    from demfi_tpu.checkpoint.manager import AsyncExperimentManager
    from demfi_tpu.data import AdobeTrainDataset, TrainLoader
    from demfi_tpu.infer import InferenceEngine
    from demfi_tpu.infer.driver import evaluate
    from demfi_tpu.models import make_model
    from demfi_tpu.parallel import (init_distributed, make_global_mesh,
                                    make_mesh)
    from demfi_tpu.train import create_train_state, make_train_step
    from demfi_tpu.utils.meters import AverageMeter, ProgressPrinter

    # multi-host: join the process group BEFORE touching devices
    pid, pcount = init_distributed(cfg.coordinator_address,
                                   cfg.num_processes, cfg.process_id)
    is_main = pid == 0

    em = AsyncExperimentManager(cfg)
    model = make_model(cfg)
    state, tx = create_train_state(cfg, model, jax.random.PRNGKey(cfg.seed))
    from demfi_tpu.utils.meters import model_summary
    if is_main:
        print(model_summary(state.params))
    mesh = (make_global_mesh(cfg.mesh_data, cfg.mesh_spatial) if pcount > 1
            else make_mesh(cfg.mesh_data, cfg.mesh_spatial))
    step = make_train_step(cfg, model, tx, mesh=mesh)
    writer = _writer(cfg) if is_main else None

    start_epoch = 0
    best_psnr = 0.0
    results = (0.0,) * 5 + ("",)
    resume = cfg.fine_tuning or (cfg.auto_resume and em.has("latest"))
    if pcount > 1:
        # The resume decision and the restored state must agree across
        # processes (each host checks its LOCAL disk; without shared
        # storage only process 0 owns the saves). Process 0 decides and
        # its loaded state is broadcast to everyone below.
        from jax.experimental import multihost_utils
        resume = bool(multihost_utils.broadcast_one_to_all(
            np.asarray(resume if is_main else False)))
    if resume:
        meta = {}
        if is_main or pcount == 1:
            if cfg.fine_tuning and cfg.fine_tuning_epoch_point:
                state_params, opt_state, meta = em.load_epoch(
                    cfg.fine_tuning_epoch_point, state.params, state.opt_state)
            else:
                state_params, opt_state, meta = em.load_latest(
                    state.params, state.opt_state)
            state = dataclasses.replace(
                state, params=state_params,
                opt_state=(opt_state if opt_state is not None
                           else state.opt_state))
        if pcount > 1:
            from jax.experimental import multihost_utils
            # replicate process-0's restored state and metadata so hosts
            # without the checkpoint files start from identical weights
            state = multihost_utils.broadcast_one_to_all(
                jax.device_get(state))
            meta_keys = ("last_epoch", "best_PSNR", "testLoss",
                         "intp_testPSNR", "intp_testSSIM",
                         "deblur_testPSNR", "deblur_testSSIM")
            vals = multihost_utils.broadcast_one_to_all(np.asarray(
                [float(meta.get(k, -1.0 if k == "last_epoch" else 0.0))
                 for k in meta_keys], np.float64))
            meta = dict(zip(meta_keys, vals))
        start_epoch = int(meta.get("last_epoch", -1)) + 1
        best_psnr = float(meta.get("best_PSNR", 0.0))
        # carry the loaded metrics until the next validation pass
        # (reference restores them from the checkpoint, main.py:204-208)
        results = (float(meta.get("testLoss", 0.0)),
                   float(meta.get("intp_testPSNR", 0.0)),
                   float(meta.get("intp_testSSIM", 0.0)),
                   float(meta.get("deblur_testPSNR", 0.0)),
                   float(meta.get("deblur_testSSIM", 0.0)), "")

    ds = AdobeTrainDataset(cfg.train_data_path, cfg.t_sampling_num,
                           cfg.patch_size, cfg.need_patch)
    loader = TrainLoader(ds, cfg.batch_size, cfg.num_thrds, cfg.seed,
                         process_id=pid, process_count=pcount)

    # debug-sheet forward (reference saves sample sheets while training,
    # main.py:463-508)
    debug_fwd = jax.jit(lambda p, f, t: model.apply(
        p, f, t, num_update=cfg.N_trn))

    def save_debug(epoch, it, frames, ts, params):
        from demfi_tpu.utils.viz import train_debug_sheet
        import cv2
        out = jax.device_get(debug_fwd(params, jnp.asarray(frames[:, :4]),
                                       jnp.asarray(ts)))
        path = os.path.join(cfg.test_img_dir, cfg.model_dir,
                            "while_training")
        os.makedirs(path, exist_ok=True)
        sheet = train_debug_sheet(frames, ts, out)
        cv2.imwrite(os.path.join(
            path, f"trainIdx_{str(it).zfill(5)}_Bx20.png"), sheet)
        # individual sample frames (reference main.py:470-502)
        from demfi_tpu.metrics import to_png_uint8
        tag = f"trainIdx_{str(it).zfill(5)}"
        t0v = float(np.asarray(ts)[0, 0])
        has_final = out.s0_final.shape[0] > 0
        s0 = out.s0_final[-1][0] if has_final else out.s0_prime[0]
        s1 = out.s1_final[-1][0] if has_final else out.s1_prime[0]
        st = out.st_final[-1][0] if has_final else out.st_prime[0]
        for name, img in ((f"{tag}_Ovld", np.asarray(out.ovlp_b0b1[0])),
                          (f"{tag}_S0_Prd", np.asarray(s0)),
                          (f"{tag}_t_{t0v}_Prd", np.asarray(st)),
                          (f"{tag}_S1_Prd", np.asarray(s1)),
                          (f"{tag}_S0_GT", frames[0, 5]),
                          (f"{tag}_t_{t0v}_GT", frames[0, 4]),
                          (f"{tag}_S1_GT", frames[0, 6])):
            cv2.imwrite(os.path.join(path, name + ".png"),
                        to_png_uint8(np.asarray(img)))
    if is_main:
        em.write_info("Epoch\tintp_testPSNR\tdeblur_testPSNR\tavg_testPSNR"
                      "\tbest_PSNR\n")
        print("[*] Training starts")

    for epoch in range(start_epoch, cfg.epochs):
        state = dataclasses.replace(state,
                                    epoch=jnp.asarray(epoch, jnp.int32))
        losses = AverageMeter("trainLoss:", ":.4e")
        d1m = AverageMeter("trainLoss_rec_D1:", ":.4e")
        d2m = AverageMeter("trainLoss_rec_D2:", ":.4e")
        btime = AverageMeter("Batch_Time[s]:", ":6.3f")
        progress = ProgressPrinter(len(loader), btime, losses, d1m, d2m,
                                   prefix=f"Epoch: [{epoch}]")
        print(f"Start epoch {epoch} at [{str(datetime.now())[:-7]}], "
              f"learning rate : [{cfg.lr_at_epoch(epoch)}]")
        t_last = time.time()
        from demfi_tpu.data.pipeline import device_prefetch
        from demfi_tpu.train import train_batch_specs
        bspecs = train_batch_specs(mesh) if mesh is not None else None
        # Debug sheets need HOST numpy of the local batch: with pcount>1
        # the prefetched arrays are globally-sharded jax.Arrays that
        # process 0 cannot slice or fetch alone, so tap the loader output
        # (pre-shard, process-local) at the debug iterations instead.
        debug_its = {0, cfg.freq_display - 1, (cfg.freq_display - 1) * 2}
        host_debug = {}

        def _tap(gen):
            for i, (f, t) in enumerate(gen):
                if is_main and i in debug_its:
                    host_debug[i] = (np.asarray(f), np.asarray(t))
                yield f, t

        for it, (frames, ts) in enumerate(
                device_prefetch(_tap(loader.epoch(epoch)), mesh,
                                specs=bspecs)):
            state, m = step(state, frames, ts)
            losses.update(float(m["total_loss"]), 1)
            d1m.update(float(m["rec_D1"]), 1)
            d2m.update(float(m["rec_D2"]), 1)
            btime.update(time.time() - t_last)
            t_last = time.time()
            # print/log every freq_display iterations, like the reference
            # (/root/reference/main.py:448-461)
            if (it + 1) % cfg.freq_display == 0:
                progress.print(it)
                if writer:
                    tb = it + epoch * len(loader)
                    writer.add_scalar("trainLoss", losses.val, tb)
                    writer.add_scalar("trainLoss_rec_D1", d1m.val, tb)
                    writer.add_scalar("trainLoss_rec_D2", d2m.val, tb)
            if is_main and it in debug_its:
                dbg_frames, dbg_ts = host_debug.pop(it)
                # params are replicated: the host copy is exact and keeps
                # the debug forward process-local under multi-host
                dbg_params = (jax.device_get(state.params) if pcount > 1
                              else state.params)
                save_debug(epoch, it, dbg_frames, dbg_ts, dbg_params)

        if is_main and ((epoch + 1) % cfg.epoch_freq_display == 0
                        or epoch == 0):
            # validation runs on process 0 only (no cross-process
            # collectives inside the eval engine); params are replicated
            # so the host copy is exact
            eval_params = (jax.device_get(state.params) if pcount > 1
                           else state.params)
            engine = InferenceEngine(model, eval_params, cfg.N_trn,
                                     t_chunk=cfg.t_chunk or None,
                                     mesh=mesh if pcount == 1 else None,
                                     fetch=("full" if cfg.visualization_flag
                                            else "images"))
            results = evaluate(cfg, engine, multiple=2, epoch=epoch,
                               center_patch=cfg.patch_size,
                               test_type="valid_5_per_scene",
                               post_fix="_x2_valid_5_intervals",
                               writer=writer,
                               window_batch=cfg.eval_window_batch)
        test_loss, intp_p, intp_s, dblr_p, dblr_s, save_path = results
        score = (intp_p + dblr_p) / 2
        best_flag = score > best_psnr
        best_psnr = max(score, best_psnr)
        meta = dict(last_epoch=epoch, best_PSNR=best_psnr,
                    intp_testPSNR=intp_p, intp_testSSIM=intp_s,
                    deblur_testPSNR=dblr_p, deblur_testSSIM=dblr_s,
                    testLoss=test_loss, trainLoss=losses.avg,
                    learningRate=cfg.lr_at_epoch(epoch),
                    batch_size=cfg.batch_size)
        if is_main:
            em.save_latest(state.params, state.opt_state, meta, best_flag)
            if (epoch + 1) % cfg.epoch_freq_save == 0:
                em.save_epoch(epoch, state.params, state.opt_state, meta)
            em.write_info(f"{epoch}\t{intp_p:.4}\t{dblr_p:.4}\t{score:.4}"
                          f"\t{best_psnr:.4}\n")

    print("-" * 20, "Training has been ended.", "-" * 20)
    print("best_PSNR of model:", best_psnr)
    # Final full-resolution evaluation. Multi-host: every process
    # evaluates its round-robin share of SCENES with a process-local
    # engine (host copy of the replicated params — feeding
    # mesh-committed arrays into a process-local jit raises); the driver
    # aggregates the headline metrics across processes. Single-process:
    # the (data, spatial) mesh shards windows/rows across local chips.
    eval_params = (jax.device_get(state.params) if pcount > 1
                   else state.params)
    engine = InferenceEngine(model, eval_params, cfg.N_tst,
                             t_chunk=cfg.t_chunk or None,
                             mesh=mesh if pcount == 1 else None,
                             fetch=("full" if cfg.visualization_flag
                                    else "images"))
    evaluate(cfg, engine, multiple=cfg.multiple_MFI,
             epoch=cfg.epochs - 1,
             post_fix=f"_final_x{cfg.multiple_MFI}_full_resolution"
                      f"_Ntst{cfg.N_tst}",
             test_patch=cfg.test_patch, writer=writer,
             window_batch=cfg.eval_window_batch,
             shard=(pid, pcount))


def _load_eval_params(cfg):
    import jax
    import jax.numpy as jnp

    from demfi_tpu.checkpoint.manager import AsyncExperimentManager
    from demfi_tpu.models import make_model

    em = AsyncExperimentManager(cfg)
    # Inference uses the UNROLLED booster: on-chip the nn.scan body
    # blocks cross-iteration XLA specialization and costs ~200 ms per
    # x8 window at 352x640 (breakdown_r03.json synth_B7_N3_scan_ms vs
    # _unroll). The param tree is identical (shared _boost_step), so
    # checkpoints load unchanged; scan stays the training default for
    # its N× lower compile cost.
    model = make_model(dataclasses.replace(cfg, scan_booster=False))
    template = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 4, 32, 32, 3)),
                           jnp.zeros((1, 1)), num_update=1))
    template = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), template)
    if cfg.test_epoch_point:
        params, _, meta = em.load_epoch(cfg.test_epoch_point, template)
    elif cfg.load_best_PSNR_flag:
        params, _, meta = em.load_best_psnr(template)
    else:
        params, _, meta = em.load_latest(template)
    print(f"loaded checkpoint, epoch: {meta.get('last_epoch', '?')}")
    return model, params


def _eval_process_group(cfg):
    """Multi-process eval setup shared by run_test/run_test_custom:
    join the process group when launched with coordinator flags (like
    run_train), and shard SCENES across processes — without this,
    N launched processes would each evaluate everything and race on the
    same output files (round-3 review finding). The local (data,
    spatial) mesh is only used single-process; a multi-process engine
    runs process-local (the driver's scene sharding is the parallelism,
    matching run_train's final evaluate)."""
    from demfi_tpu.parallel import init_distributed

    pid, pcount = init_distributed(cfg.coordinator_address,
                                   cfg.num_processes, cfg.process_id)
    return pid, pcount


def run_test(cfg: DeMFIConfig) -> None:
    from demfi_tpu.infer import InferenceEngine
    from demfi_tpu.infer.driver import evaluate
    from demfi_tpu.parallel import make_mesh

    pid, pcount = _eval_process_group(cfg)
    model, params = _load_eval_params(cfg)
    # --mesh_data/--mesh_spatial shard eval windows / frame rows across
    # chips (the reference's serial tile loop, utils.py:1389-1450, runs
    # as SPMD instead)
    mesh = make_mesh(cfg.mesh_data, cfg.mesh_spatial) if pcount == 1 else None
    engine = InferenceEngine(model, params, cfg.N_tst,
                             t_chunk=cfg.t_chunk or None, mesh=mesh,
                             fetch=("full" if cfg.visualization_flag
                                    else "images"))
    print(f"Evaluating on {cfg.test_data_path} with multiple = "
          f"{cfg.multiple_MFI} with full resolution")
    evaluate(cfg, engine, multiple=cfg.multiple_MFI,
             epoch=cfg.epochs - 1, test_patch=cfg.test_patch,
             post_fix=f"_final_x{cfg.multiple_MFI}_full_resolution"
                      f"_Ntst{cfg.N_tst}",
             window_batch=cfg.eval_window_batch,
             shard=(pid, pcount))


def run_test_custom(cfg: DeMFIConfig) -> None:
    from demfi_tpu.infer import InferenceEngine
    from demfi_tpu.infer.driver import evaluate_custom
    from demfi_tpu.parallel import make_mesh

    pid, pcount = _eval_process_group(cfg)
    model, params = _load_eval_params(cfg)
    mesh = make_mesh(cfg.mesh_data, cfg.mesh_spatial) if pcount == 1 else None
    engine = InferenceEngine(model, params, cfg.N_tst,
                             t_chunk=cfg.t_chunk or None, mesh=mesh,
                             fetch=("full" if cfg.visualization_flag
                                    else "images"))
    print(f"Evaluating on {cfg.custom_path} with multiple = "
          f"{cfg.multiple_MFI}")
    evaluate_custom(cfg, engine, multiple=cfg.multiple_MFI,
                    test_patch=cfg.test_patch,
                    shard=(pid, pcount))


def cli(argv=None) -> None:
    # Optional platform override (e.g. DEMFI_PLATFORM=cpu) — applied via
    # jax.config because the axon sitecustomize ignores JAX_PLATFORMS.
    plat = os.environ.get("DEMFI_PLATFORM")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)
    cfg = parse_args(argv)
    for f in dataclasses.fields(cfg):
        print(f"# {f.name} : {getattr(cfg, f.name)}")
    from demfi_tpu.ops.warp import set_pallas_window
    set_pallas_window(vr=cfg.pallas_vr, span=cfg.pallas_span)
    if cfg.phase == "train":
        run_train(cfg)
    elif cfg.phase == "test":
        run_test(cfg)
    else:
        run_test_custom(cfg)


if __name__ == "__main__":
    cli()
