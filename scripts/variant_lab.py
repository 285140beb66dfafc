"""On-chip A/B lab for exact-math formulation variants of Stage-II ops.

Each variant computes IDENTICAL math (asserted against the shipping
form before timing, atol scaled to dtype) — only the XLA formulation
differs. Used to pick dispatch defaults; results are recorded in
tpu_reports/ and cited in the op docstrings.

Sections:
  gru    SepConvGRU formulations at the eval batch (B=7):
           split    shipping form (per-operand convs summed, fused gates)
           concat   materialized [h,x] concat, one conv per gate-group
           im2col   separable convs as shifted-channel-stack + 1x1 GEMM
  dec    the 8-conv decoder chain (Dec_first_2..Dec_last2_2 shapes):
           conv     shipping nn.Conv/lax.conv chain
           im2col   every 3x3 conv as 9-shift channel stack + 1x1 GEMM
  pad    Dec_first_2's 99-channel agg3 input conv vs the same conv with
           activations+kernel zero-padded to 128 in-channels (exact:
           zero rows contribute nothing; lane-aligned GEMM operand —
           VERDICT r3 item 5 candidate)
  bwarp  backward-warp formulations at C=64 (the ft/r_ft blend sites):
           quad     shipping quad-row gather
           onehot   vertical stack + horizontal one-hot GEMM (D-window,
                    masks at the target pixel; exact within the window)

Usage: python scripts/variant_lab.py [--res 352x640] [--sections gru,dec]
       [--dtype bfloat16] [--iters 6] [--out tpu_reports/variant_lab.json]
"""
from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(
    _os.path.abspath(__file__))))

import argparse
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
    ap.add_argument("--res", type=str, default="352x640")
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--sections", type=str, default="gru,dec")
    ap.add_argument("--dtype", type=str, default="bfloat16")
    ap.add_argument("--out", type=str, default="")
    args = ap.parse_args()
    h, w = (int(x) for x in args.res.split("x"))
    sections = set(args.sections.split(","))
    B = 7
    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    # f32 tolerance is loose-ish: TPU f32 convs reassociate across
    # formulations (measured 3.4e-4 at 64x128); bf16 looser still
    atol = 0.02 if dt == jnp.bfloat16 else 2e-3

    report = {"res": f"{h}x{w}", "B": B, "dtype": args.dtype,
              "backend": jax.default_backend()}
    rng = np.random.RandomState(0)

    def put(k, v):
        report[k] = v
        print(f"  {k} = {v}", flush=True)
        if args.out:
            with open(args.out, "w") as f:
                json.dump(report, f, indent=1)
                f.write("\n")

    def scalar_time(fn, *a, floor=0.0, raw_key=None):
        g = jax.jit(lambda *a: jnp.sum(jax.tree_util.tree_leaves(
            fn(*a))[0].astype(jnp.float32)))
        float(g(*a))
        t0 = time.time()
        for _ in range(args.iters):
            float(g(*a))
        raw = (time.time() - t0) / args.iters
        # always record the raw (unfloored) time too: the dispatch
        # floor drifts on the tunneled relay, and a stale floor larger
        # than the raw time would otherwise clamp to a bogus ~0
        if raw_key:
            put(raw_key, raw * 1000)
        return max(raw - floor, 1e-9)

    def measure_floor():
        return scalar_time(lambda x: x + 1, jnp.ones((8, 128)))

    floor = measure_floor()
    put("floor_ms", floor * 1000)

    def rnd(*shape):
        return jnp.asarray(rng.uniform(-1, 1, shape).astype(np.float32)
                           ).astype(dt)

    dn = ("NHWC", "HWIO", "NHWC")

    def conv(x, k, pad):
        return jax.lax.conv_general_dilated(
            x.astype(dt), k.astype(dt), (1, 1), pad,
            dimension_numbers=dn)

    if "gru" in sections:
        # same random parameter set for every variant
        hd = 64
        hx = rnd(B, h, w, hd)
        xx = rnd(B, h, w, hd)
        ks = {}
        for half, kshape in (("1", (1, 5)), ("2", (5, 1))):
            for gate in ("z", "r", "q"):
                ks[f"k{gate}{half}"] = rnd(*kshape, 2 * hd, hd) * 0.1
                ks[f"b{gate}{half}"] = rnd(hd) * 0.1

        def half_split(hh, x, half, pad, kshape):
            kz, kr, kq = (ks[f"k{g}{half}"] for g in "zrq")
            bz, br, bq = (ks[f"b{g}{half}"] for g in "zrq")
            kzr = jnp.concatenate([kz, kr], axis=-1)
            bzr = jnp.concatenate([bz, br])
            xzrq = conv(x, jnp.concatenate([kzr[:, :, hd:], kq[:, :, hd:]],
                                           axis=-1), pad)
            zr = conv(hh, kzr[:, :, :hd], pad) + xzrq[..., :2 * hd] + bzr
            z = jax.nn.sigmoid(zr[..., :hd])
            r = jax.nn.sigmoid(zr[..., hd:])
            q = jnp.tanh(conv(r * hh, kq[:, :, :hd], pad)
                         + xzrq[..., 2 * hd:] + bq)
            return (1.0 - z) * hh + z * q

        def half_concat(hh, x, half, pad, kshape):
            kz, kr, kq = (ks[f"k{g}{half}"] for g in "zrq")
            bz, br, bq = (ks[f"b{g}{half}"] for g in "zrq")
            hxc = jnp.concatenate([hh, x], axis=-1)
            kzr = jnp.concatenate([kz, kr], axis=-1)
            zr = conv(hxc, kzr, pad) + jnp.concatenate([bz, br])
            z = jax.nn.sigmoid(zr[..., :hd])
            r = jax.nn.sigmoid(zr[..., hd:])
            q = jnp.tanh(conv(jnp.concatenate([r * hh, x], axis=-1),
                              kq, pad) + bq)
            return (1.0 - z) * hh + z * q

        def sep_stack(x, kshape):
            """[1,5] or [5,1] conv as a shifted-channel stack; returns
            the stacked input whose 1x1 conv equals the separable conv."""
            kh, kw = kshape
            if kw == 5:
                xp = jnp.pad(x, ((0, 0), (0, 0), (2, 2), (0, 0)))
                return jnp.concatenate(
                    [xp[:, :, i:i + x.shape[2]] for i in range(5)], axis=-1)
            xp = jnp.pad(x, ((0, 0), (2, 2), (0, 0), (0, 0)))
            return jnp.concatenate(
                [xp[:, i:i + x.shape[1]] for i in range(5)], axis=-1)

        def k_flat(k):
            # [kh,kw,Cin,Cout] -> [1,1,ktaps*Cin,Cout] matching sep_stack
            kh, kw, ci, co = k.shape
            return k.reshape(1, 1, kh * kw * ci, co)

        def half_im2col(hh, x, half, pad, kshape):
            kz, kr, kq = (ks[f"k{g}{half}"] for g in "zrq")
            bz, br, bq = (ks[f"b{g}{half}"] for g in "zrq")
            hs = sep_stack(hh, kshape)
            xs = sep_stack(x, kshape)
            kzrq = jnp.concatenate([kz, kr, kq], axis=-1)
            kh_, kx_ = kzrq[:, :, :hd], kzrq[:, :, hd:]
            xg = conv(xs, k_flat(kx_), ((0, 0), (0, 0)))
            hg = conv(hs, k_flat(kh_), ((0, 0), (0, 0)))
            z = jax.nn.sigmoid(hg[..., :hd] + xg[..., :hd] + bz)
            r = jax.nn.sigmoid(hg[..., hd:2 * hd] + xg[..., hd:2 * hd] + br)
            q = jnp.tanh(conv(sep_stack(r * hh, kshape),
                              k_flat(kq[:, :, :hd]), ((0, 0), (0, 0)))
                         + xg[..., 2 * hd:] + bq)
            return (1.0 - z) * hh + z * q

        def gru(fn):
            def run(hh, x):
                hh = fn(hh, x, "1", ((0, 0), (2, 2)), (1, 5))
                return fn(hh, x, "2", ((2, 2), (0, 0)), (5, 1))
            return run

        ref = np.asarray(jax.jit(gru(half_split))(hx, xx), np.float32)
        for name, fn in (("split", half_split), ("concat", half_concat),
                         ("im2col", half_im2col)):
            out = np.asarray(jax.jit(gru(fn))(hx, xx), np.float32)
            err = float(np.abs(out - ref).max())
            assert err <= atol, (name, err)
            put(f"gru_{name}_B7_ms",
                scalar_time(gru(fn), hx, xx, floor=floor) * 1000)
            put(f"gru_{name}_maxerr", err)

    if "dec" in sections:
        cin = 103
        x = rnd(B, h, w, cin)
        dks = [("first", rnd(3, 3, cin, 64) * 0.05, rnd(64) * 0.1)]
        for i in range(5):
            dks.append((f"res{i}a", rnd(3, 3, 64, 64) * 0.05,
                        rnd(64) * 0.1))
            dks.append((f"res{i}b", rnd(3, 3, 64, 64) * 0.05,
                        rnd(64) * 0.1))
        dks.append(("last1", rnd(3, 3, 64, 64) * 0.05, rnd(64) * 0.1))
        dks.append(("last2", rnd(3, 3, 64, 9) * 0.05, rnd(9) * 0.1))

        def c3(x, k, b, mode):
            if mode == "conv":
                return conv(x, k, ((1, 1), (1, 1))) + b
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
            st = jnp.concatenate(
                [xp[:, dy:dy + x.shape[1], dx:dx + x.shape[2]]
                 for dy in range(3) for dx in range(3)], axis=-1)
            kf = k.reshape(1, 1, 9 * k.shape[2], k.shape[3])
            return conv(st, kf, ((0, 0), (0, 0))) + b

        def dec(mode):
            def run(x):
                i = 0
                out = jax.nn.relu(c3(x, *dks[0][1:], mode))
                for r in range(5):
                    res = jax.nn.relu(c3(out, *dks[1 + 2 * r][1:], mode))
                    out = out + c3(res, *dks[2 + 2 * r][1:], mode)
                out = jax.nn.relu(c3(out, *dks[11][1:], mode))
                return c3(out, *dks[12][1:], mode)
            return run

        ref = np.asarray(jax.jit(dec("conv"))(x), np.float32)
        for mode in ("conv", "im2col"):
            out = np.asarray(jax.jit(dec(mode))(x), np.float32)
            err = float(np.abs(out - ref).max())
            assert err <= max(atol, 0.05 if dt == jnp.bfloat16 else atol), \
                (mode, err)
            put(f"dec_{mode}_B7_ms",
                scalar_time(dec(mode), x, floor=floor) * 1000)
            put(f"dec_{mode}_maxerr", err)

    if "pad" in sections:
        # agg3 has 99 channels (models/demfi.py:705-710: 3+3+3+64+1+
        # 2*6+1+12); the MXU lane width is 128. Padding the activation
        # and the kernel's in-channel axis with zeros is exact math and
        # hands XLA an aligned contraction — this A/B decides whether
        # the pad is worth the extra 29% nominal FLOPs.
        floor = measure_floor()
        put("floor_pad_ms", floor * 1000)
        cin = 99
        x99 = rnd(B, h, w, cin)
        k99 = rnd(3, 3, cin, 64) * 0.05
        bb = rnd(64) * 0.1

        def first_direct(x):
            return conv(x, k99, ((1, 1), (1, 1))) + bb

        pad_c = 128 - cin
        k128 = jnp.pad(k99, ((0, 0), (0, 0), (0, pad_c), (0, 0)))

        def first_padded(x):
            xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, pad_c)))
            return conv(xp, k128, ((1, 1), (1, 1))) + bb

        ref = np.asarray(jax.jit(first_direct)(x99), np.float32)
        out = np.asarray(jax.jit(first_padded)(x99), np.float32)
        err = float(np.abs(out - ref).max())
        put("pad_first_maxerr", err)
        assert err <= atol, ("pad", err)
        put("pad_first99_B7_ms",
            scalar_time(first_direct, x99, floor=floor,
                        raw_key="pad_first99_B7_raw_ms") * 1000)
        put("pad_first128_B7_ms",
            scalar_time(first_padded, x99, floor=floor,
                        raw_key="pad_first128_B7_raw_ms") * 1000)

    if "bwarp" in sections:
        import demfi_tpu.ops.warp as W
        c = 64
        # re-measure the dispatch floor: earlier sections can take
        # minutes and the relay's floor drifts (a stale high floor
        # produced a clamped ~0 quad reading in the first r4 artifact)
        floor = measure_floor()
        put("floor_bwarp_ms", floor * 1000)
        img = rnd(B, h, w, c)
        # flows with the vertical component clipped inside the D=8
        # window (the direct one-hot call is only exact in-window; the
        # shipping dispatch guards with a quad fallback)
        f_np = (rng.randn(B, h, w, 2) * 3).astype(np.float32)
        f_np[..., 1] = np.clip(f_np[..., 1], -6.9, 6.9)
        flo = jnp.asarray(f_np)

        def quad(img, flo):
            return W._bwarp_xla_quad(img, flo)

        ref = np.asarray(jax.jit(quad)(img, flo), np.float32)
        put("bwarp64_quad_B7_ms",
            scalar_time(quad, img, flo, floor=floor,
                        raw_key="bwarp64_quad_B7_raw_ms") * 1000)
        if hasattr(W, "_bwarp_xla_onehot"):
            for D in (8,):
                def oh(img, flo, D=D):
                    return W._bwarp_xla_onehot(img, flo, D)
                out = np.asarray(jax.jit(oh)(img, flo), np.float32)
                err = float(np.abs(out - ref).max())
                put(f"bwarp64_onehot_D{D}_maxerr", err)
                assert err <= max(atol, 0.05), (D, err)
                put(f"bwarp64_onehot_D{D}_B7_ms",
                    scalar_time(oh, img, flo, floor=floor,
                                raw_key=f"bwarp64_onehot_D{D}_B7_raw_ms")
                    * 1000)

                def ohg(img, flo, D=D):
                    return W._bwarp_onehot_fast(img, flo, D,
                                                W._FWARP_ONEHOT_CHUNK)
                put(f"bwarp64_onehot_guarded_D{D}_B7_ms",
                    scalar_time(
                        ohg, img, flo, floor=floor,
                        raw_key=f"bwarp64_onehot_guarded_D{D}_B7_raw_ms")
                    * 1000)

    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
