"""Bisect the train-step timing gap (round-5, VERDICT r4 #3 follow-up).

measure.json records trainbd_scan_fwdbwd_ms=493 but trainbd_scan_step_ms=1046
with optimizer-only below the dispatch floor — ~514 ms of the full train step
is unattributed. This probe isolates the candidate causes with one rung per
hypothesis, all timed with the same scalar-readback methodology as
scripts/measure_tpu.py:

  cost      — compile-time FLOP/memory analysis of the grad-only program vs
              the full step program (structural duplicate vs scheduling).
              Works on CPU too (DEMFI_PLATFORM=cpu).
  fwd       — forward+loss only                        (baseline ~230 ms)
  fwdbwd    — jax.grad reduced to one scalar           (baseline ~493 ms)
  vgrad     — value_and_grad(has_aux=True), grads+loss summed
  chain     — the FULL step math (lr injection, tx.update, apply_updates)
              with every output leaf reduced to ONE scalar; no donation,
              no large outputs. If this matches `step`, the gap is real
              optimizer/schedule cost; if it matches `fwdbwd`, the gap is
              output materialization / donation / threading.
  step_same — make_train_step-shaped fn with full TrainState outputs, NO
              donation, same input state every iteration, forced per-iter
              by a scalar reduction over the new state.
  step      — the exact measure_tpu loop: donation + state threading,
              forced by float(total_loss)                (baseline ~1046 ms)

Reference anchor for the step semantics: /root/reference/main.py:367-512.

Usage:
  python scripts/train_gap_probe.py [--bd_patch 256] [--bd_batch 4]
      [--iters 6] [--out tpu_reports/train_gap.json] [--sections all]
  DEMFI_PLATFORM=cpu python scripts/train_gap_probe.py --bd_patch 32 \
      --bd_batch 1 --sections cost   # local smoke
"""
from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import dataclasses as dc
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
except Exception:
    pass
if _os.environ.get("DEMFI_PLATFORM"):
    jax.config.update("jax_platforms", _os.environ["DEMFI_PLATFORM"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bd_patch", type=int, default=256)
    ap.add_argument("--bd_batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--out", type=str, default="")
    ap.add_argument("--sections", type=str, default="all",
                    help="comma list of: cost, time (or 'all')")
    args = ap.parse_args()
    sections = (("cost", "time") if args.sections == "all"
                else tuple(args.sections.split(",")))

    import optax

    from demfi_tpu.config import config_rb
    from demfi_tpu.models import make_model
    from demfi_tpu.train import (create_train_state, demfi_loss,
                                 make_train_step)
    from demfi_tpu.utils.profiling import calibrate_flow_head

    report = {"backend": jax.default_backend(),
              "bd_patch": args.bd_patch, "bd_batch": args.bd_batch,
              "iters": args.iters}

    def put(k, v):
        report[k] = v
        print(f"  {k} = {v}", flush=True)
        if args.out:  # incremental: a helper HTTP-500 must not lose rungs
            with open(args.out, "w") as f:
                json.dump(report, f, indent=1)

    def rung(key, thunk):
        try:
            put(key, thunk())
        except Exception as e:
            put(f"{key}_error", str(e)[:300])
            jax.clear_caches()

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

    bp, bb = args.bd_patch, args.bd_batch
    cfg = dc.replace(
        config_rb(5, 3, compute_dtype="bfloat16", batch_size=bb,
                  patch_size=bp, remat_backbone=False),
        scan_booster=True, remat_granularity="backbone")
    model = make_model(cfg)
    state, tx = create_train_state(cfg, model, jax.random.PRNGKey(0),
                                   sample_shape=(1, 4, bp, bp, 3))
    rng = np.random.RandomState(0)
    tb = jnp.asarray(rng.uniform(-1, 1, (bb, 9, bp, bp, 3))
                     .astype(np.float32))
    tt = jnp.full((bb, 1), 0.375, jnp.float32)
    p2, raw_max = calibrate_flow_head(state.params, model, tb[:1, :4])
    state = state.replace(params=p2)
    put("raw_init_max_flow_px", float(raw_max))

    def fwd(params, fr, t_):
        out = model.apply(params, fr[:, :4], t_, num_update=cfg.N_trn)
        loss, m = demfi_loss(cfg, out, fr[:, 5], fr[:, 6], fr[:, 4])
        return loss, m

    def _all(tree):
        return sum(jnp.sum(l.astype(jnp.float32))
                   for l in jax.tree_util.tree_leaves(tree))

    def grad_scalar(p, fr, t_):
        return _all(jax.grad(lambda *a: fwd(*a)[0])(p, fr, t_))

    def vgrad_scalar(p, fr, t_):
        (loss, m), grads = jax.value_and_grad(
            lambda q: fwd(q, fr, t_), has_aux=True)(p)
        return _all(grads) + loss + _all(m)

    # step math identical to train/loop.py make_train_step (epoch-0 lr)
    def step_math(st, fr, t_):
        (_, metrics), grads = jax.value_and_grad(
            lambda q: fwd(q, fr, t_), has_aux=True)(st.params)
        opt_state = st.opt_state
        opt_state.hyperparams["learning_rate"] = jnp.float32(cfg.init_lr)
        updates, opt_state = tx.update(grads, opt_state, st.params)
        params = optax.apply_updates(st.params, updates)
        return st.replace(params=params, opt_state=opt_state), metrics

    def chain_scalar(st, fr, t_):
        st2, m = step_math(st, fr, t_)
        return _all(st2.params) + _all(st2.opt_state) + _all(m)

    if "cost" in sections:
        # Compile-time accounting: if the step program's FLOPs are ~2x the
        # grad program's, the gap is structural (duplicated forward etc.);
        # if equal, it is runtime scheduling / memory traffic.
        for tag, fn, fargs in (
                ("fwdbwd", grad_scalar, (state.params, tb, tt)),
                ("step", step_math, (state, tb, tt))):
            try:
                comp = jax.jit(fn).lower(*fargs).compile()
                ca = comp.cost_analysis()
                if isinstance(ca, (list, tuple)):
                    ca = ca[0]
                put(f"cost_{tag}_gflops",
                    float(ca.get("flops", float("nan"))) / 1e9)
                put(f"cost_{tag}_bytes_GB",
                    float(ca.get("bytes accessed", float("nan"))) / 1e9)
                try:
                    ma = comp.memory_analysis()
                    put(f"cost_{tag}_temp_MB",
                        float(ma.temp_size_in_bytes) / 1e6)
                    put(f"cost_{tag}_out_MB",
                        float(ma.output_size_in_bytes) / 1e6)
                except Exception as e:
                    put(f"cost_{tag}_mem_error", str(e)[:200])
            except Exception as e:
                put(f"cost_{tag}_error", str(e)[:300])

    if "time" in sections:
        rung("fwd_ms", lambda: scalar_time(
            lambda p, fr, t_: fwd(p, fr, t_)[0],
            state.params, tb, tt, floor=floor) * 1000)
        rung("fwdbwd_ms", lambda: scalar_time(
            grad_scalar, state.params, tb, tt, floor=floor) * 1000)
        rung("vgrad_ms", lambda: scalar_time(
            vgrad_scalar, state.params, tb, tt, floor=floor) * 1000)
        rung("chain_ms", lambda: scalar_time(
            chain_scalar, state, tb, tt, floor=floor) * 1000)

        # full-output step, no donation, same state every iteration;
        # forced per-iter by a tiny jitted scalar reduction over the NEW
        # state (float(total_loss) alone lets the device finish the
        # update async — recorded separately to expose that underhang)
        def _step_same():
            step_nod = jax.jit(step_math)
            reduce_state = jax.jit(lambda s: _all(s.params))
            st2, m = step_nod(state, tb, tt)
            float(reduce_state(st2))
            t0 = time.time()
            for _ in range(args.iters):
                st2, m = step_nod(state, tb, tt)
                float(reduce_state(st2))
            put("step_same_forced_ms",
                ((time.time() - t0) / args.iters - floor) * 1000)
            t0 = time.time()
            for _ in range(args.iters):
                st2, m = step_nod(state, tb, tt)
                float(m["total_loss"])
            return (time.time() - t0) / args.iters * 1000

        rung("step_same_lossonly_ms", _step_same)
        jax.clear_caches()

        # the exact measure_tpu trainbd loop: donation + threading
        def _step_threaded():
            step = make_train_step(cfg, model, tx)
            stt, m = step(state, tb, tt)
            float(m["total_loss"])
            t0 = time.time()
            for _ in range(args.iters):
                stt, m = step(stt, tb, tt)
                float(m["total_loss"])
            return (time.time() - t0) / args.iters * 1000

        rung("step_threaded_ms", _step_threaded)

    print(json.dumps(report, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
