"""Benchmark: interpolated frames/sec/chip for x8 MFI on DeMFI-Net_rb(5,3).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"} — on
success AND on every failure (a machine-readable failure record with an
"error" field; this script never dies with a raw traceback).

Baseline (BASELINE.md): the reference runs at Rt = 0.61 s per output frame
at 640x352 on a TITAN RTX (figures/Table2.PNG), i.e. 1.64 frames/s. We
measure the same workload — one 4-frame window interpolated x8 (7 output
instants, N_tst=3) — as *device* throughput: Stage I once + the t-batched
synthesize passes, outputs reduced to a scalar checksum on device, so the
timing excludes the development tunnel's host-transfer cost (a production
host reads back 7 frames over PCIe in ~1 ms). The dispatch-latency floor
is measured with a trivial program and subtracted. --readback switches to
full end-to-end mode (includes host transfer of all outputs).

Memory-bounded execution shapes (the 720p x8 batch is ~22 GB of
activations — far past a 16 GB v5e):
  * full t-batch when the HBM pixel-instant budget allows (352x640);
  * otherwise sequential per-instant `lax.map` inside one program — the
    measured 720p winner (tpu_reports/measure_720p_tmap.json 3599 ms vs
    chunked-call 2: 3763, 1: 3827) and the shape measure_tpu --t_map uses;
  * --t_chunk N forces N-instant chunks as SEPARATE device calls — the
    InferenceEngine execution shape (engine.py forward_windows). A Python
    chunk loop inside one jitted program is deliberately NOT offered: all
    chunks' intermediates coexist in one XLA buffer assignment, which is
    how the round-3 bench OOM'd at 720p.

float32 runs the ordinary untiled path: the round-2/3 XLA:TPU f32
miscompile is gone on the current toolchain (scripts/f32_repro.py all
clean; the engine reroute is retired). If DEMFI_F32_TPU_SAFE_PIXELS
re-arms the engine guard, the bench times the reroute tile grid instead
— always the path users actually get. The device checksum is asserted
finite before a number is reported either way.

Default geometry is 720x1280 — the BASELINE headline metric's literal
resolution ("interp frames/sec/chip at 720p x8"); --res 352x640 measures
at Table 2's Rt geometry instead.

Usage: python bench.py [--quick] [--res 720x1280] [--dtype float32|bfloat16]
                       [--n_tst N] [--iters K] [--readback] [--t_chunk N]
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np


def probe_backend(timeout_s: float = 300.0):
    """Run jit(x+1) in a subprocess with a hard timeout.

    The axon relay can wedge such that backend init hangs or raises; a
    same-process probe would hang this script too (BENCH_r01 died inside
    device_put with no JSON emitted). Returns (ok, detail)."""
    code = ("import jax; x = jax.jit(lambda x: x + 1)(1.0); "
            "print('PROBE_OK', float(x), jax.default_backend())")
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True,
                           timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return False, f"probe timeout after {timeout_s:.0f}s (relay wedged)"
    if r.returncode == 0 and "PROBE_OK" in r.stdout:
        return True, r.stdout.strip().splitlines()[-1]
    tail = (r.stderr or r.stdout).strip().splitlines()[-1:]
    return False, f"probe rc={r.returncode}: {' '.join(tail)}"


_LAST_GOOD_HINT: list = []  # [(res, dtype)] recorded by run_bench


def _last_good_onchip():
    """Most recent committed on-chip artifact, preferring the requested
    geometry/dtype (tpu_reports/bench_<res>_<dtype>.json from the last
    runbook), falling back to the round-3 352x640 snapshot."""
    root = os.path.dirname(os.path.abspath(__file__))
    names = []
    if _LAST_GOOD_HINT:
        res, dtype = _LAST_GOOD_HINT[0]
        short = {"bfloat16": "bf16", "float32": "f32"}.get(dtype, dtype)
        tag = "720p" if res == "720x1280" else res
        names.append(os.path.join(root, "tpu_reports",
                                  f"bench_{tag}_{short}.json"))
    names.append(os.path.join(root, "tpu_reports", "bench_720p_bf16.json"))
    names.append(os.path.join(root, "bench_r03_352x640.json"))
    for p in names:
        try:
            with open(p) as f:
                rec = json.load(f)
            if rec.get("value"):  # skip committed failure records
                return rec
        except Exception:
            continue
    return None


def _strip_ansi(s: str) -> str:
    import re
    return re.sub(r"\x1b\[[0-9;]*[A-Za-z]", "", s)


def _failure_record(reason: str, kind: str, attach_last_good: bool = True):
    rec = {
        "metric": f"x8 MFI interp frames/sec/chip ({kind})",
        "value": 0.0,
        "unit": "frames/s",
        "vs_baseline": 0.0,
        "error": _strip_ansi(reason)[:2000],
        "error_kind": kind,
    }
    if attach_last_good:
        lg = _last_good_onchip()
        if lg is not None:
            rec["last_good_onchip"] = lg
    return rec


def _error_kind(e: BaseException) -> str:
    """Classify compile/infra markers BEFORE the OOM substring scan: a
    remote-compile HTTP 500 embeds the helper's full log, which can
    contain an incidental 'oom' (the round-4 f32 artifact was mislabeled
    error_kind=oom that way)."""
    s = f"{type(e).__name__}: {e}".lower()
    if "mosaic" in s or "pallas" in s:
        return "pallas-compile"
    if "remote_compile" in s:
        return "remote-compile"
    if ("resource_exhausted" in s or "out of memory" in s
            or "oom" in s.replace("boom", "")):
        return "oom"
    if "unimplemented" in s or "compil" in s:
        return "compile"
    return type(e).__name__


def _inject(stage: str):
    """Test hook: DEMFI_BENCH_FAIL_INJECT=oom|nan|generic raises/corrupts
    at a fixed point so the failure-record contract is CPU-testable."""
    mode = os.environ.get("DEMFI_BENCH_FAIL_INJECT", "")
    if not mode:
        return None
    if mode == "oom" and stage == "run":
        raise RuntimeError(
            "RESOURCE_EXHAUSTED: Out of memory while trying to allocate "
            "1234567890 bytes. [injected by DEMFI_BENCH_FAIL_INJECT]")
    if mode == "generic" and stage == "run":
        raise ValueError("injected generic failure")
    if mode == "nan" and stage == "checksum":
        return float("nan")
    return None


def run_bench(args) -> dict:
    import jax
    import jax.numpy as jnp


    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        if not args.quick and args.res in ("352x640", "720x1280"):
            args.quick = True  # full-res CPU run is pointlessly slow

    from demfi_tpu.config import config_rb
    from demfi_tpu.models import make_model
    from demfi_tpu.infer import InferenceEngine
    from demfi_tpu.infer.engine import (_pixel_instant_budget,
                                        _F32_TPU_SAFE_PIXELS,
                                        _f32_tpu_tiling, _tile_bounds,
                                        _pad_reflect_to_multiple)

    if int(os.environ.get("DEMFI_BENCH_TINY", "0") or "0"):
        # CPU contract tests: smallest legal geometry, single iteration
        h, w = 64, 64
        args.iters, args.inner = 1, 1
    elif args.quick:
        h, w = 128, 256
        args.iters = 3
    else:
        h, w = (int(x) for x in args.res.split("x"))

    cfg = config_rb(5, args.n_tst, compute_dtype=args.dtype)
    # unrolled booster: ~200 ms faster per window than the nn.scan body
    # (breakdown_r03.json), identical params
    import dataclasses as _dc
    cfg = _dc.replace(cfg, scan_booster=False)
    model = make_model(cfg)
    wb = max(1, args.wb)
    rng = np.random.RandomState(0)
    frames = jnp.asarray(
        rng.uniform(-1, 1, (wb, 4, h, w, 3)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), frames[:1, :, :64, :64],
                        jnp.zeros((1, 1)), num_update=1)
    # Production-representative motion: at random init the backbone
    # emits flows up to ~76 px (vertical 59), past every guarded window
    # rung, so the un-calibrated bench times the unbounded quad
    # fallbacks a trained checkpoint never hits (CFR 233 ms vs ~30 —
    # tpu_reports/breakdown_r05_cuts.json). calibrate_flow_head rescales
    # the flow head (exact; graph unchanged) to trained-range motion.
    # --raw_flows restores the uncalibrated weights for A/B.
    flow_cal = {"flow_calibration": "off (--raw_flows)"}
    if not args.raw_flows:
        from demfi_tpu.utils.profiling import calibrate_flow_head
        params, raw_max = calibrate_flow_head(params, model, frames)
        flow_cal = {"flow_calibration": "target 24 px",
                    "raw_init_max_flow_px": round(raw_max, 1)}
    n_t = 7
    ts = jnp.asarray(np.linspace(1 / 8, 7 / 8, n_t, dtype=np.float32))

    on_tpu = jax.default_backend() == "tpu"
    # the f32 reroute is RETIRED by default (scripts/f32_repro.py came
    # back all-clean on the current toolchain); this branch only runs
    # when DEMFI_F32_TPU_SAFE_PIXELS re-arms the engine guard, so the
    # bench times what the engine actually executes
    f32_tiled = (args.dtype == "float32" and on_tpu
                 and _F32_TPU_SAFE_PIXELS > 0
                 and h * w > _F32_TPU_SAFE_PIXELS
                 and not int(os.environ.get("DEMFI_F32_TPU_UNSAFE_OK",
                                            "0") or "0"))

    def checksum(out):
        return jnp.float32(
            jnp.sum(out.st_final[-1]) + jnp.sum(out.s0_final[-1])
            + jnp.sum(out.s1_final[-1]) + jnp.sum(out.st_prime))

    def run_once(chunk):
        """One measurement. Returns (sec/window, checksum, mode-str)."""
        _inject("run")
        if args.readback:
            engine = InferenceEngine(model, params, num_update=args.n_tst)
            ts_nm = np.tile(np.asarray(ts)[None], (wb, 1))
            res = engine.forward_windows(np.asarray(frames), ts_nm)
            t0 = time.time()
            for _ in range(args.iters):
                res = engine.forward_windows(np.asarray(frames), ts_nm)
            dt = (time.time() - t0) / args.iters
            cs = float(np.sum(res[0].st_final[0]))
            return dt, cs, "e2e+readback"

        def synth(params, ctx, tc, reps):
            """ctx (window batch wb) -> synthesize at the [wb*len(tc)]
            batch; returns the on-device checksum."""
            cc = jax.tree_util.tree_map(
                lambda x: jnp.repeat(x, reps, axis=0), ctx)
            out = model.apply(params, cc, jnp.tile(tc, wb)[:, None],
                              args.n_tst, method=model.synthesize)
            return checksum(out)

        def timed_region(fn, fargs, calls_per_iter=1):
            """Compile+settle, measure the dispatch floor, then time
            `iters` runs of fn; returns (sec/run_net_of_floor, last val)."""
            val = float(fn(*fargs))  # compile + settle
            triv = jax.jit(lambda x: jnp.sum(x))
            float(triv(ts))
            t0 = time.time()
            for _ in range(args.iters):
                float(triv(ts))
            floor = (time.time() - t0) / args.iters
            t0 = time.time()
            for _ in range(args.iters):
                val = float(fn(*fargs))
            dt = (time.time() - t0) / args.iters
            return max(dt - floor * calls_per_iter, 1e-6), val, floor

        if f32_tiled:
            # engine-reroute f32 path: time the actual tile-grid compute
            # (same tile shapes/batches forward_window runs; the numpy
            # stitch is host work outside device throughput)
            pb = 32
            grid = _f32_tpu_tiling(h, w, pb)
            fr_np, _, _ = _pad_reflect_to_multiple(np.asarray(frames), pb)
            new_h, new_w = fr_np.shape[2], fr_np.shape[3]
            sh, sw = new_h // grid[0], new_w // grid[1]
            groups: dict = {}
            for ph in range(grid[0]):
                for pw in range(grid[1]):
                    lo = _tile_bounds(pb, new_h, new_w, ph, sh, pw, sw)
                    tile = fr_np[:, :, lo[0]:lo[1], lo[2]:lo[3], :]
                    groups.setdefault(tile.shape, []).append(tile)
            # bound each batch by the HBM budget (tiles x instants x
            # tile-pixels, f32 = 2x the bf16-measured bytes/pixel-
            # instant) — the unbounded same-shape concat OOM'd in r4
            batches = []
            for shape, g in groups.items():
                per_call = max(1, _pixel_instant_budget()
                               // max(n_t * shape[2] * shape[3] * 2, 1))
                for i in range(0, len(g), per_call):
                    batches.append(jnp.asarray(
                        np.concatenate(g[i:i + per_call], axis=0)))

            def tile_win(params, batch, ts):
                ctx = model.apply(params, batch, method=model.extract)
                cc = jax.tree_util.tree_map(
                    lambda x: jnp.repeat(x, n_t, axis=0), ctx)
                out = model.apply(params, cc,
                                  jnp.tile(ts, batch.shape[0])[:, None],
                                  args.n_tst, method=model.synthesize)
                return checksum(out)

            # ONE jit callable: same-shape sub-batches share the cache
            fn = jax.jit(tile_win)
            for b in batches:
                float(fn(params, b, ts))  # compile each distinct shape

            def all_tiles():
                acc = 0.0
                for b in batches:
                    acc += float(fn(params, b, ts))
                return acc

            dt, cs, floor = timed_region(lambda: jnp.float32(all_tiles()),
                                         (), calls_per_iter=len(batches))
            return dt, cs, (f"device, f32 engine-reroute tile grid "
                            f"{grid[0]}x{grid[1]} ({len(batches)} calls, "
                            f"floor {floor*1000:.0f} ms x calls subtracted)")

        if chunk is not None and 1 < chunk < n_t:
            # engine execution shape: each chunk a SEPARATE device call
            # so chunk intermediates never coexist in one buffer
            # assignment (the round-3 in-jit chunk loop OOM'd at 720p)
            extract = jax.jit(
                lambda p, f: model.apply(p, f, method=model.extract))
            sizes = sorted({len(range(i, min(i + chunk, n_t)))
                            for i in range(0, n_t, chunk)})
            synths = {s: jax.jit(lambda p, c, t, s=s: synth(p, c, t, s))
                      for s in sizes}
            tcs = [np.asarray(ts[i:i + chunk]) for i in range(0, n_t, chunk)]

            def window_calls():
                ctx = extract(params, frames)
                acc = 0.0
                for tc in tcs:
                    acc += float(synths[len(tc)](params, ctx,
                                                 jnp.asarray(tc)))
                return acc

            ncalls = 1 + len(tcs)
            # compile both programs (the synth checksum's data dependency
            # forces the extract to finish; the pytree itself has no
            # scalar to read back)
            ctx0 = extract(params, frames)
            for tc in tcs:
                float(synths[len(tc)](params, ctx0, jnp.asarray(tc)))
            dt, cs, floor = timed_region(
                lambda: jnp.float32(window_calls()), (),
                calls_per_iter=ncalls)
            return dt, cs, (f"device ({ncalls} calls/window, t_chunk="
                            f"{chunk}, floor {floor*1000:.0f} ms x calls "
                            f"subtracted)")

        # single-program shapes: full t-batch, or sequential lax.map
        t_map = chunk == 1

        def window(params, frames, ts):
            ctx = model.apply(params, frames, method=model.extract)
            if t_map:
                return jnp.sum(jax.lax.map(
                    lambda t: synth(params, ctx, t[None], 1), ts))
            return synth(params, ctx, ts, n_t)

        # The ~30 ms tunnel dispatch floor is ~20% of a single window at
        # wb=1, so amortize it: run `inner` windows inside ONE jitted
        # fori_loop (body compiles once; the carry-dependent no-op scale
        # defeats CSE so every iteration really executes).
        inner = args.inner

        def window_k(params, frames, ts):
            def body(_, s):
                f = frames * jnp.sign(jnp.abs(s) * 1e-30 + 1.0)
                return s + jnp.float32(window(params, f, ts))
            return jax.lax.fori_loop(0, inner, body, jnp.float32(0.0))

        fn = jax.jit(window_k)
        dt, cs, floor = timed_region(fn, (params, frames, ts))
        dt = dt / inner
        cs = cs / inner
        tcd = ", t_map (sequential per-instant lax.map)" if t_map else ""
        return dt, cs, (f"device ({inner}-window timed region, floor "
                        f"{floor*1000:.0f} ms amortized{tcd})")

    # instants per synthesize batch: the engine's HBM budget policy —
    # a full 7-instant batch at 720p is ~22 GB of activations; the
    # measured 720p fallback winner is the sequential lax.map
    cap = max(1, _pixel_instant_budget() // (h * w * wb))
    chunk = args.t_chunk or (None if cap >= n_t else 1)

    from demfi_tpu.ops.warp import (_on_tpu, _use_pallas_gather,
                                    _use_pallas_scatter)

    retries = []
    while True:
        try:
            dt, cs, mode = run_once(chunk)
            break
        except Exception as e:
            kind = _error_kind(e)
            if (kind == "oom" and chunk != 1
                    and "oom->t_map" not in retries):
                # an OOM is memory-shape-bound: retry with the
                # sequential per-instant map, the minimal-footprint shape
                retries.append("oom->t_map")
                chunk = 1
                jax.clear_caches()
                continue
            if (kind in ("pallas-compile", "remote-compile")
                    and (_use_pallas_gather() or _use_pallas_scatter())
                    and "no-pallas" not in retries):
                # only a *Pallas* failure with Pallas actually enabled
                # warrants this retry (retrying an OOM with
                # DEMFI_NO_PALLAS is a no-op — round-3 lesson)
                retries.append("no-pallas")
                os.environ["DEMFI_NO_PALLAS"] = "1"
                jax.clear_caches()
                continue
            rec = _failure_record(f"{type(e).__name__}: {e}", kind)
            if retries:
                rec["retries"] = retries
            return rec

    injected_nan = _inject("checksum")
    if injected_nan is not None:
        cs = injected_nan
    if not np.isfinite(cs):
        # a NaN/Inf device checksum means the timed program's outputs are
        # garbage (e.g. the f32 TPU miscompile) — timing NaN propagation
        # is not a benchmark number
        return _failure_record(
            f"non-finite device checksum ({cs}) at {h}x{w} {args.dtype}; "
            f"mode: {mode}", "nonfinite-checksum")

    if _on_tpu():
        mode += ", fused-xla-warps"
        if _use_pallas_gather() or _use_pallas_scatter():
            mode += "+pallas"
    if retries:
        mode += f", retries={'+'.join(retries)}"

    fps = wb * 7.0 / dt
    # Reference Rt = 0.61 s/frame at 640x352 (Table 2). At other
    # resolutions scale Rt by the pixel ratio (model FLOPs are linear
    # in pixels) so vs_baseline stays an apples-to-apples per-frame
    # comparison at matched geometry.
    px_scale = (h * w) / (352.0 * 640.0)
    baseline_fps = 1.0 / (0.61 * px_scale)
    if px_scale != 1.0:
        mode += ", baseline Rt pixel-scaled from 640x352"
    if args.cpu:
        mode += ", CPU-FALLBACK (not a TPU number)"
    if not args.raw_flows:
        mode += ", calibrated-motion"
    rec = {
        "metric": f"x8 MFI interp frames/sec/chip ({h}x{w}, "
                  f"N_tst={args.n_tst}, {args.dtype}, wb={wb}, {mode})",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline_fps, 2),
    }
    rec.update(flow_cal)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--res", type=str, default="720x1280",
                    help="default 720x1280: BASELINE.json's headline "
                         "metric is interp frames/sec/chip at 720p x8 "
                         "(Table-2 Rt pixel-scaled); use 352x640 for the "
                         "Table-2 Rt geometry itself")
    ap.add_argument("--dtype", type=str, default="bfloat16",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--n_tst", type=int, default=3)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--inner", type=int, default=4,
                    help="windows per jitted timed region (amortizes the "
                         "dispatch floor)")
    ap.add_argument("--wb", type=int, default=1,
                    help="window batch: independent windows whose "
                         "t-batches run as ONE [wb*7] synthesize batch. "
                         "Measured on v5e at 352x640 bf16: wb=1 8.32 fps "
                         "vs wb=2 7.37 — the one-hot fwarp's stacked "
                         "operand penalizes B=14, so 1 is the default "
                         "(matches config.eval_window_batch)")
    ap.add_argument("--t_chunk", type=int, default=0,
                    help="instants per synthesize batch (0 = auto: full "
                         "batch if the HBM budget allows, else sequential "
                         "per-instant lax.map — the measured 720p winner; "
                         "2..6 = engine-style chunks as separate device "
                         "calls; 1 = force the lax.map shape)")
    ap.add_argument("--readback", action="store_true",
                    help="include full host readback (tunnel-bound in dev)")
    ap.add_argument("--probe_timeout", type=float, default=300.0)
    ap.add_argument("--cpu", action="store_true",
                    help="force an explicitly-labeled CPU measurement")
    ap.add_argument("--no_probe", action="store_true")
    ap.add_argument("--raw_flows", action="store_true",
                    help="skip the flow-head calibration: time the "
                         "random-init flow magnitudes (~76 px), which "
                         "drive every guarded warp onto its unbounded "
                         "fallback — NOT production-representative")
    args = ap.parse_args()
    _LAST_GOOD_HINT[:] = [(args.res, args.dtype)]

    if not (args.cpu or args.no_probe):
        ok, detail = probe_backend(args.probe_timeout)
        if not ok:
            # machine-readable failure record — never crash without JSON.
            # Attach the last committed on-chip measurement (clearly
            # labeled) so a relay outage at bench time doesn't erase the
            # round's recorded number.
            print(json.dumps(_failure_record(detail, "tpu-unavailable")))
            return

    try:
        rec = run_bench(args)
    except BaseException as e:  # noqa: BLE001 — the JSON contract
        if isinstance(e, KeyboardInterrupt):
            raise
        rec = _failure_record(f"{type(e).__name__}: {e}", _error_kind(e))
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
