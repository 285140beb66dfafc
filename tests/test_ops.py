"""L0 op parity tests against PyTorch oracles.

The reference's numerics live in ATen (grid_sample, put_, PixelShuffle);
torch (CPU) is available in the image, so these tests compare our NHWC
JAX ops directly against the torch functional ops the reference calls —
without importing any reference code.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as TF
import jax
import jax.numpy as jnp

from demfi_tpu.ops import (
    space_to_depth, depth_to_space, bwarp, bilinear_sample_abs, fwarp,
    cfr_flow_t_align, fgac_correlate,
)

RNG = np.random.RandomState(0)


def nchw(x_nhwc):
    return np.transpose(x_nhwc, (0, 3, 1, 2))


def nhwc(x_nchw):
    return np.transpose(x_nchw, (0, 2, 3, 1))


# ---------------------------------------------------------------- reshape
def test_space_to_depth_matches_torch_pixel_reshuffle_order():
    # torch reference ordering: view(B,C,H/r,r,W/r,r).permute(0,1,3,5,2,4)
    x = RNG.randn(2, 12, 10, 3).astype(np.float32)  # NHWC
    r = 2
    xt = torch.from_numpy(nchw(x))
    b, c, h, w = xt.shape
    v = xt.reshape(b, c, h // r, r, w // r, r)
    want = v.permute(0, 1, 3, 5, 2, 4).reshape(b, c * r * r, h // r, w // r)
    got = np.asarray(space_to_depth(jnp.asarray(x), r))
    np.testing.assert_allclose(got, nhwc(want.numpy()), rtol=0, atol=0)


def test_depth_to_space_matches_torch_pixel_shuffle():
    x = RNG.randn(2, 5, 7, 36).astype(np.float32)  # NHWC, C=36=9*4
    r = 2
    want = TF.pixel_shuffle(torch.from_numpy(nchw(x)), r).numpy()
    got = np.asarray(depth_to_space(jnp.asarray(x), r))
    np.testing.assert_allclose(got, nhwc(want), rtol=0, atol=0)


def test_space_depth_roundtrip():
    x = RNG.randn(1, 8, 8, 5).astype(np.float32)
    y = depth_to_space(space_to_depth(jnp.asarray(x), 2), 2)
    np.testing.assert_array_equal(np.asarray(y), x)


# ---------------------------------------------------------------- bwarp
def torch_bwarp(x, flo):
    """Oracle reproducing the reference bwarp semantics
    (DeMFInet.py:732-766) from torch primitives."""
    B, C, H, W = x.shape
    xx = torch.arange(0, W).view(1, 1, 1, W).expand(B, 1, H, W)
    yy = torch.arange(0, H).view(1, 1, H, 1).expand(B, 1, H, W)
    grid = torch.cat((xx, yy), 1).float() + flo
    grid[:, 0] = 2.0 * grid[:, 0] / max(W - 1, 1) - 1.0
    grid[:, 1] = 2.0 * grid[:, 1] / max(H - 1, 1) - 1.0
    grid = grid.permute(0, 2, 3, 1)
    out = TF.grid_sample(x, grid, align_corners=True)
    mask = TF.grid_sample(torch.ones_like(x), grid, align_corners=True)
    mask = (mask >= 0.999).float()
    return out * mask


@pytest.mark.parametrize("scale", [0.5, 3.0, 12.0])
def test_bwarp_matches_grid_sample(scale):
    B, H, W, C = 2, 13, 17, 4
    x = RNG.randn(B, H, W, C).astype(np.float32)
    flo = (RNG.randn(B, H, W, 2) * scale).astype(np.float32)
    want = torch_bwarp(torch.from_numpy(nchw(x)),
                       torch.from_numpy(nchw(flo))).numpy()
    got = np.asarray(bwarp(jnp.asarray(x), jnp.asarray(flo)))
    np.testing.assert_allclose(got, nhwc(want), rtol=1e-5, atol=1e-5)


def test_bilinear_sample_abs_matches_reference_sampler():
    """FGAC quirk: sample at raw flow values as absolute coordinates."""
    B, H, W, C = 1, 9, 11, 8
    img = RNG.randn(B, H, W, C).astype(np.float32)
    coords = (RNG.randn(B, H, W, 2) * 4 + 3).astype(np.float32)

    # oracle: normalize exactly like bilinear_sampler (DeMFInet.py:499-514)
    xg = torch.from_numpy(coords[..., 0:1])
    yg = torch.from_numpy(coords[..., 1:2])
    xg = 2 * xg / (W - 1) - 1
    yg = 2 * yg / (H - 1) - 1
    grid = torch.cat([xg, yg], dim=-1)
    want = TF.grid_sample(torch.from_numpy(nchw(img)), grid,
                          align_corners=True).numpy()
    got = np.asarray(bilinear_sample_abs(jnp.asarray(img), jnp.asarray(coords)))
    np.testing.assert_allclose(got, nhwc(want), rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------- fwarp
def np_fwarp(img, flo):
    """Pure-numpy oracle of the reference fwarp (DeMFInet.py:625-729):
    floor the (row, col) displacements, Gaussian corner weights,
    bounds-masked scatter-add of image*w and w."""
    B, H, W, C = img.shape
    out = np.zeros_like(img)
    norm = np.zeros((B, H, W, 1), img.dtype)
    dc, dr = flo[..., 0], flo[..., 1]
    r1, c1 = np.floor(dr), np.floor(dc)
    fr, fc = dr - r1, dc - c1
    for ddr in (0, 1):
        for ddc in (0, 1):
            wgt = np.exp(-((fr - ddr) ** 2 + (fc - ddc) ** 2))
            for b in range(B):
                for i in range(H):
                    for j in range(W):
                        ti = i + int(r1[b, i, j]) + ddr
                        tj = j + int(c1[b, i, j]) + ddc
                        if 0 <= ti < H and 0 <= tj < W:
                            out[b, ti, tj] += img[b, i, j] * wgt[b, i, j]
                            norm[b, ti, tj, 0] += wgt[b, i, j]
    return out, norm


def test_fwarp_matches_scatter_oracle():
    B, H, W, C = 2, 7, 9, 2
    img = RNG.randn(B, H, W, C).astype(np.float32)
    flo = (RNG.randn(B, H, W, 2) * 2.5).astype(np.float32)
    want_img, want_norm = np_fwarp(img, flo)
    got_img, got_norm = fwarp(jnp.asarray(img), jnp.asarray(flo))
    np.testing.assert_allclose(np.asarray(got_img), want_img, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_norm), want_norm, rtol=1e-5, atol=1e-5)


def test_cfr_matches_composed_oracle():
    B, H, W = 1, 8, 10
    f01 = (RNG.randn(B, H, W, 2) * 1.5).astype(np.float32)
    f10 = (RNG.randn(B, H, W, 2) * 1.5).astype(np.float32)
    t = np.array([0.375], np.float32)

    w01, n0 = np_fwarp(f01, t * f01)
    w10, n1 = np_fwarp(f10, (1 - t) * f10)
    tv = float(t[0])
    ft0 = -(1 - tv) * tv * w01 + tv * tv * w10
    ft1 = (1 - tv) ** 2 * w01 - tv * (1 - tv) * w10
    norm = (1 - tv) * n0 + tv * n1
    mask = (norm > 0).astype(np.float32)
    ft0 = (1 - mask) * ft0 + mask * (ft0 / (norm + (1 - mask)))
    ft1 = (1 - mask) * ft1 + mask * (ft1 / (norm + (1 - mask)))

    got0, got1 = cfr_flow_t_align(jnp.asarray(f01), jnp.asarray(f10),
                                  jnp.asarray(t))
    np.testing.assert_allclose(np.asarray(got0), ft0, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got1), ft1, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------- fgac
def test_fgac_degenerate_is_plain_abs_gather():
    B, H, W, C = 1, 6, 6, 4
    ref = RNG.randn(B, H, W, C).astype(np.float32)
    src = RNG.randn(B, H, W, C).astype(np.float32)
    flow = (RNG.randn(B, H, W, 2) * 2).astype(np.float32)
    got = fgac_correlate(jnp.asarray(ref), jnp.asarray(src), jnp.asarray(flow),
                         rr=0, sr=0)
    want = bilinear_sample_abs(jnp.asarray(ref), jnp.asarray(flow))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=0)


def test_fgac_general_window_softmax_normalized():
    B, H, W, C = 1, 5, 5, 3
    ref = RNG.randn(B, H, W, C).astype(np.float32)
    src = RNG.randn(B, H, W, C).astype(np.float32)
    flow = np.zeros((B, H, W, 2), np.float32)
    out = np.asarray(fgac_correlate(jnp.asarray(ref), jnp.asarray(src),
                                    jnp.asarray(flow), rr=1, sr=0))
    assert out.shape == (B, H, W, C)
    assert np.isfinite(out).all()


def torch_fgac_generalized(ref_k, source_k, flow_s2r, rr, sr):
    """Torch oracle replaying the reference's generalized-window FGAC
    (DeMFInet.py:404-447) with the hardcoded radii promoted to
    parameters. Reproduces the executed code exactly — including the
    transposed meshgrid offsets, the tiled (``repeat``) centroid canvas,
    and the padded strided unfold. ref_k/source_k: [B,C,H,W];
    flow_s2r: [B,H,W,2] with channel 0 = x (post-permute layout)."""
    f_bs, f_h, f_w, _ = flow_s2r.shape
    C = ref_k.shape[1]
    g = 2 * rr + 1
    dx = torch.linspace(-rr, rr, g)
    dy = torch.linspace(-rr, rr, g)
    delta = torch.stack(torch.meshgrid(dy, dx, indexing="ij"), axis=-1)
    delta_lvl = delta.contiguous().view(1, 1, g, 1, g, 2).repeat(
        1, f_h, 1, f_w, 1, 1).contiguous().view(1, f_h * g, f_w * g, 2)
    centroid_lvl = flow_s2r.repeat(1, g, g, 1)
    lvl = centroid_lvl + delta_lvl

    ref_k = TF.avg_pool2d(ref_k, (2 * sr + 1,) * 2, (1, 1), padding=sr)
    H, W = ref_k.shape[-2:]
    xg, yg = lvl.split([1, 1], dim=-1)
    grid = torch.cat([2 * xg / (W - 1) - 1, 2 * yg / (H - 1) - 1], dim=-1)
    idx = TF.grid_sample(ref_k, grid, align_corners=True)
    idx = idx.contiguous().view(f_bs, C, f_h, g, f_w, g).permute(
        0, 1, 3, 2, 5, 4).contiguous().view(f_bs, C, g * f_h, g * f_w)
    idx = TF.unfold(idx, kernel_size=(g, g), stride=(g, g), padding=rr)
    grid_sampled = idx.contiguous().view(f_bs, C, g ** 2, f_h, f_w)

    source_k = TF.avg_pool2d(source_k, (2 * sr + 1,) * 2, (1, 1), padding=sr)
    corr = torch.sum(grid_sampled * source_k.unsqueeze(2), 1)
    soft = torch.softmax(corr, dim=1).unsqueeze(1)
    return torch.sum(grid_sampled * soft, 2)


@pytest.mark.parametrize("rr,sr", [(1, 0), (1, 1), (2, 0)])
def test_fgac_general_window_matches_reference_oracle(rr, sr):
    """Parity of the generalized rr/sr window against the reference's
    executed code path (VERDICT r1 missing 7; SURVEY hard part 3)."""
    B, H, W, C = 1, 6, 7, 5
    ref = RNG.randn(B, H, W, C).astype(np.float32)
    src = RNG.randn(B, H, W, C).astype(np.float32)
    flow = (RNG.randn(B, H, W, 2) * 2 + 1).astype(np.float32)
    want = torch_fgac_generalized(
        torch.from_numpy(nchw(ref)), torch.from_numpy(nchw(src)),
        torch.from_numpy(flow), rr, sr).numpy()
    got = np.asarray(fgac_correlate(jnp.asarray(ref), jnp.asarray(src),
                                    jnp.asarray(flow), rr=rr, sr=sr))
    np.testing.assert_allclose(got, nhwc(want), rtol=1e-4, atol=1e-5)


def test_fgac_avg_pool_matches_torch():
    from demfi_tpu.ops.warp import _avg_pool_same
    x = RNG.randn(2, 9, 11, 3).astype(np.float32)
    for k in (1, 3, 5):
        want = TF.avg_pool2d(torch.from_numpy(nchw(x)), (k, k), (1, 1),
                             padding=k // 2).numpy()
        got = np.asarray(_avg_pool_same(jnp.asarray(x), k))
        np.testing.assert_allclose(got, nhwc(want), rtol=1e-5, atol=1e-6)


def test_fused_tpu_paths_match_four_tap():
    """The TPU-default fused formulations (quad-row gather, single fused
    4-corner scatter — ops/warp.py) must be bit-equal to the 4-tap XLA
    reference paths for ALL coordinate regimes, including the y0/x0 = -1
    border rows where a clipped base index would shift the neighborhood,
    and fully out-of-range coords."""
    from demfi_tpu.ops.warp import (_bilinear_zeros, _bilinear_zeros_quad,
                                    _bwarp_xla, _bwarp_xla_quad,
                                    _fwarp_xla, _fwarp_xla_quad)

    x = jnp.asarray(RNG.randn(2, 24, 40, 5).astype(np.float32))
    for scale in (0.5, 9.0, 300.0):
        flo = jnp.asarray((RNG.randn(2, 24, 40, 2) * scale
                           ).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(_bwarp_xla(x, flo)),
            np.asarray(_bwarp_xla_quad(x, flo)), atol=1e-6)
        a, an = _fwarp_xla(x, flo)
        q, qn = _fwarp_xla_quad(x, flo)
        np.testing.assert_allclose(np.asarray(a), np.asarray(q), atol=1e-5)
        np.testing.assert_allclose(np.asarray(an), np.asarray(qn), atol=1e-5)
        coords = jnp.asarray((RNG.randn(2, 24, 40, 2) * scale
                              ).astype(np.float32))
        wa, wo = _bilinear_zeros(x, coords[..., 0], coords[..., 1])
        qa, qo = _bilinear_zeros_quad(x, coords[..., 0], coords[..., 1])
        np.testing.assert_allclose(np.asarray(wa), np.asarray(qa), atol=1e-6)
        np.testing.assert_allclose(np.asarray(wo), np.asarray(qo), atol=1e-6)

    # dense-shift fwarp (TPU small-motion path): exact within its window
    from demfi_tpu.ops.warp import _fwarp_xla_shifts
    flo_w = jnp.asarray(RNG.uniform(-6.9, 6.9, (2, 24, 40, 2)
                                    ).astype(np.float32))
    a, an = _fwarp_xla(x, flo_w)
    s, sn = _fwarp_xla_shifts(x, flo_w, 8)
    np.testing.assert_allclose(np.asarray(a), np.asarray(s), atol=1e-5)
    np.testing.assert_allclose(np.asarray(an), np.asarray(sn), atol=1e-5)
    gs1 = jax.grad(lambda f: jnp.sum(_fwarp_xla(x, f)[0] ** 2))(flo_w)
    gs2 = jax.grad(lambda f: jnp.sum(_fwarp_xla_shifts(x, f, 8)[0] ** 2))(flo_w)
    np.testing.assert_allclose(np.asarray(gs1), np.asarray(gs2),
                               rtol=1e-4, atol=1e-5)

    # gradients flow identically through both fused forms
    flo = jnp.asarray((RNG.randn(2, 24, 40, 2) * 3).astype(np.float32))
    g1 = jax.grad(lambda f: jnp.sum(_bwarp_xla(x, f) ** 2))(flo)
    g2 = jax.grad(lambda f: jnp.sum(_bwarp_xla_quad(x, f) ** 2))(flo)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-5)
    g3 = jax.grad(lambda f: jnp.sum(_fwarp_xla(x, f)[0] ** 2))(flo)
    g4 = jax.grad(lambda f: jnp.sum(_fwarp_xla_quad(x, f)[0] ** 2))(flo)
    np.testing.assert_allclose(np.asarray(g3), np.asarray(g4),
                               rtol=1e-4, atol=1e-5)


def test_fwarp_onehot_matches_scatter():
    """One-hot-matmul fwarp (_fwarp_xla_onehot): exact vs the scatter
    path for ANY horizontal motion; vertical motion within its [-D, D-1]
    window; out-of-image splats dropped identically. Exercises the
    row-chunk padding path (h=24 with chunk 32 and 8)."""
    from demfi_tpu.ops.warp import (_fwarp_xla, _fwarp_xla_onehot,
                                    _fwarp_onehot_fast)

    x = jnp.asarray(RNG.randn(2, 24, 40, 3).astype(np.float32))
    D = 8
    # vertical within window, horizontal unbounded (incl. off-image)
    flo = jnp.stack(
        [jnp.asarray(RNG.uniform(-60, 60, (2, 24, 40)).astype(np.float32)),
         jnp.asarray(RNG.uniform(-6.9, 6.9, (2, 24, 40)).astype(np.float32))],
        axis=-1)
    a, an = _fwarp_xla(x, flo)
    for chunk in (32, 8):
        o, on = _fwarp_xla_onehot(x, flo, D, row_chunk=chunk)
        np.testing.assert_allclose(np.asarray(a), np.asarray(o), atol=2e-5)
        np.testing.assert_allclose(np.asarray(an), np.asarray(on), atol=2e-5)

    # guarded wrapper: big vertical motion falls back to the exact path
    flo_big = flo.at[..., 1].mul(10.0)
    a2, an2 = _fwarp_xla(x, flo_big)
    g2, gn2 = _fwarp_onehot_fast(x, flo_big, D, 32)
    np.testing.assert_allclose(np.asarray(a2), np.asarray(g2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(an2), np.asarray(gn2), atol=1e-5)
    # ... and small motion takes the one-hot branch (same numbers)
    g3, _ = _fwarp_onehot_fast(x, flo, D, 32)
    np.testing.assert_allclose(np.asarray(a), np.asarray(g3), atol=2e-5)

    # custom_vjp backward == exact-op backward on both branches
    ge = jax.grad(lambda f: jnp.sum(_fwarp_xla(x, f)[0] ** 2))(flo)
    go = jax.grad(lambda f: jnp.sum(_fwarp_onehot_fast(x, f, D, 32)[0] ** 2)
                  )(flo)
    np.testing.assert_allclose(np.asarray(ge), np.asarray(go),
                               rtol=1e-4, atol=1e-5)

    # bf16 inputs ride the bf16 MXU path within bf16 tolerance
    xb = x.astype(jnp.bfloat16)
    fb = flo.astype(jnp.bfloat16)
    ab, abn = _fwarp_xla(xb, fb)
    ob, obn = _fwarp_xla_onehot(xb, fb, D)
    np.testing.assert_allclose(np.asarray(ab, np.float32),
                               np.asarray(ob, np.float32), atol=0.15)
    np.testing.assert_allclose(np.asarray(abn, np.float32),
                               np.asarray(obn, np.float32), atol=0.15)


def test_bwarp_onehot_matches_quad():
    """One-hot-matmul bwarp (_bwarp_xla_onehot): exact vs the 4-tap /
    quad-gather paths for ANY horizontal motion; vertical taps within
    the [-D, D-1] window; out-of-image taps zero + the >=0.999 hard
    mask identical. Exercises row-chunk padding (h=24, chunks 32/8)."""
    from demfi_tpu.ops.warp import (_bwarp_xla, _bwarp_xla_onehot,
                                    _bwarp_onehot_fast, _bwarp_xla_quad)

    x = jnp.asarray(RNG.randn(2, 24, 40, 5).astype(np.float32))
    D = 8
    flo = jnp.stack(
        [jnp.asarray(RNG.uniform(-60, 60, (2, 24, 40)).astype(np.float32)),
         jnp.asarray(RNG.uniform(-6.9, 6.9, (2, 24, 40)).astype(np.float32))],
        axis=-1)
    a = _bwarp_xla(x, flo)
    for chunk in (32, 8):
        o = _bwarp_xla_onehot(x, flo, D, row_chunk=chunk)
        np.testing.assert_allclose(np.asarray(a), np.asarray(o), atol=2e-5)

    # guarded wrapper: big vertical motion falls back to the quad path
    flo_big = flo.at[..., 1].mul(10.0)
    a2 = _bwarp_xla(x, flo_big)
    g2 = _bwarp_onehot_fast(x, flo_big, D, 32)
    np.testing.assert_allclose(np.asarray(a2), np.asarray(g2), atol=1e-5)
    g3 = _bwarp_onehot_fast(x, flo, D, 32)
    np.testing.assert_allclose(np.asarray(a), np.asarray(g3), atol=2e-5)

    # custom_vjp backward == exact-op backward on both branches (linear
    # functional: the backward is vjp(_bwarp_xla) by construction, so
    # with a fixed cotangent the grads must agree to float tolerance —
    # a squared loss would amplify primal deltas through the 0.999
    # mask threshold)
    ct = jnp.asarray(RNG.randn(*np.asarray(a).shape).astype(np.float32))
    ge = jax.grad(lambda f: jnp.sum(_bwarp_xla(x, f) * ct))(flo)
    go = jax.grad(lambda f: jnp.sum(_bwarp_onehot_fast(x, f, D, 32) * ct)
                  )(flo)
    np.testing.assert_allclose(np.asarray(ge), np.asarray(go),
                               rtol=1e-4, atol=1e-5)

    # bf16 rows ride the bf16 MXU einsum within bf16 tolerance
    xb = x.astype(jnp.bfloat16)
    ab = _bwarp_xla_quad(xb, flo)
    ob = _bwarp_xla_onehot(xb, flo, D)
    np.testing.assert_allclose(np.asarray(ab, np.float32),
                               np.asarray(ob, np.float32), atol=0.15)


def test_fwarp_onehot_tiered_exact_all_tiers():
    """Tiered one-hot fwarp (_fwarp_onehot_tiered): all three runtime
    tiers — small window, big window, quad-scatter fallback — produce
    the exact-scatter numbers; backward matches the exact op."""
    from demfi_tpu.ops.warp import _fwarp_xla, _fwarp_onehot_tiered

    x = jnp.asarray(RNG.randn(2, 24, 40, 3).astype(np.float32))
    dx = jnp.asarray(RNG.uniform(-60, 60, (2, 24, 40)).astype(np.float32))
    dy = jnp.asarray(RNG.uniform(-3.9, 3.9, (2, 24, 40)).astype(np.float32))
    cases = {
        "small": jnp.stack([dx, dy], axis=-1),        # |dy| < 4  -> D=4
        "big": jnp.stack([dx, dy * 1.8], axis=-1),    # |dy| < 8  -> D=8
        "fallback": jnp.stack([dx, dy * 30.0], axis=-1),  # past both
    }
    for name, flo in cases.items():
        a, an = _fwarp_xla(x, flo)
        o, on = _fwarp_onehot_tiered(x, flo, 4, 8, 32)
        np.testing.assert_allclose(np.asarray(a), np.asarray(o), atol=2e-5,
                                   err_msg=name)
        np.testing.assert_allclose(np.asarray(an), np.asarray(on),
                                   atol=2e-5, err_msg=name)

    flo = cases["small"]
    ge = jax.grad(lambda f: jnp.sum(_fwarp_xla(x, f)[0] ** 2))(flo)
    gt = jax.grad(
        lambda f: jnp.sum(_fwarp_onehot_tiered(x, f, 4, 8, 32)[0] ** 2))(flo)
    np.testing.assert_allclose(np.asarray(ge), np.asarray(gt),
                               rtol=1e-4, atol=1e-5)


def test_fwarp_dispatch_ladder_on_tpu_path(monkeypatch):
    """fwarp() routes bf16 TPU-path calls through the window-ladder
    dispatch (default rungs 8,16,32 + quad), and the result still
    matches the exact scatter."""
    import demfi_tpu.ops.warp as W

    x = jnp.asarray(RNG.randn(1, 32, 128, 3).astype(np.float32)
                    ).astype(jnp.bfloat16)
    flo = jnp.stack(
        [jnp.asarray(RNG.uniform(-9, 9, (1, 32, 128)).astype(np.float32)),
         jnp.asarray(RNG.uniform(-5, 5, (1, 32, 128)).astype(np.float32))],
        axis=-1).astype(jnp.bfloat16)
    monkeypatch.setattr(W, "_on_tpu", lambda: True)
    monkeypatch.setattr(W, "_FWARP_ONEHOT_LADDER", (8, 16))
    o, on = W.fwarp(x, flo)
    a, an = W._fwarp_xla(x, flo)
    np.testing.assert_allclose(np.asarray(o, np.float32),
                               np.asarray(a, np.float32), atol=0.15)
    np.testing.assert_allclose(np.asarray(on, np.float32),
                               np.asarray(an, np.float32), atol=0.15)


def test_fwarp_onehot_ladder_env_parse():
    """Env resolution of the window ladder (ADVICE r4): non-positive
    rungs are filtered everywhere, an explicit legacy
    DEMFI_FWARP_ONEHOT_D=0 disables one-hot entirely (the documented
    off switch), and DEMFI_FWARP_ONEHOT_LADDER='' also disables."""
    from demfi_tpu.ops.warp import _parse_onehot_ladder as parse

    assert parse({}) == (8, 16, 32)
    assert parse({"DEMFI_FWARP_ONEHOT_LADDER": "8,16,32"}) == (8, 16, 32)
    # unsorted + dup + non-positive rungs normalize
    assert parse({"DEMFI_FWARP_ONEHOT_LADDER": "16,8,0,8,-4"}) == (8, 16)
    assert parse({"DEMFI_FWARP_ONEHOT_LADDER": ""}) == ()
    # legacy master off switch: D=0 means quad-scatter only, not the
    # D_SMALL default rung
    assert parse({"DEMFI_FWARP_ONEHOT_D": "0"}) == ()
    assert parse({"DEMFI_FWARP_ONEHOT_D": "0",
                  "DEMFI_FWARP_ONEHOT_D_SMALL": "8"}) == ()
    # D_SMALL=0 drops only the small tier (runbook's single-window A/B)
    assert parse({"DEMFI_FWARP_ONEHOT_D_SMALL": "0"}) == (32,)
    assert parse({"DEMFI_FWARP_ONEHOT_D": "16"}) == (8, 16)
    # explicit ladder wins over legacy vars
    assert parse({"DEMFI_FWARP_ONEHOT_LADDER": "4",
                  "DEMFI_FWARP_ONEHOT_D": "0"}) == (4,)


def test_fwarp_onehot_ladder_unsorted_exact():
    """_fwarp_onehot_ladder normalizes an unsorted/duplicated ladder
    internally (ADVICE r4: the switch index is only 'first fitting
    rung' for an ascending ladder) — a descending tuple must still be
    exact in a band that fits the small rung only after sorting."""
    from demfi_tpu.ops.warp import _fwarp_onehot_ladder, _fwarp_xla

    h, w = 48, 128
    x = jnp.asarray(RNG.randn(1, h, w, 2).astype(np.float32))
    flo = jnp.stack(
        [jnp.asarray(RNG.uniform(-20, 20, (1, h, w)).astype(np.float32)),
         jnp.asarray(RNG.uniform(-7.5, 6.5, (1, h, w)).astype(np.float32))],
        axis=-1)
    a, an = _fwarp_xla(x, flo)
    o, on = _fwarp_onehot_ladder(x, flo, (16, 8, 16, 0), 32)
    np.testing.assert_allclose(np.asarray(o), np.asarray(a), atol=2e-4)
    np.testing.assert_allclose(np.asarray(on), np.asarray(an), atol=2e-4)


def test_fwarp_onehot_ladder_band_exactness():
    """The ladder picks an exact formulation in EVERY motion band:
    flows that fit D4, fit only D8, fit only D16, and fit no rung
    (quad fallback) all reproduce the exact scatter, values and
    gradients."""
    from demfi_tpu.ops.warp import _fwarp_onehot_ladder, _fwarp_xla

    h, w = 48, 128
    x = jnp.asarray(RNG.randn(1, h, w, 2).astype(np.float32))
    base = jnp.asarray(RNG.uniform(-30, 30, (1, h, w, 1)
                                   ).astype(np.float32))  # any horizontal

    def flow_with_dy(mag):
        dy = jnp.asarray(
            RNG.uniform(-mag, mag - 1.0, (1, h, w, 1)).astype(np.float32))
        return jnp.concatenate([base, dy], axis=-1)

    ladder = (4, 8, 16)
    for mag, band in ((3.0, "d4"), (7.5, "d8"), (15.5, "d16"),
                      (40.0, "quad")):
        flo = flow_with_dy(mag)
        a, an = _fwarp_xla(x, flo)
        o, on = _fwarp_onehot_ladder(x, flo, ladder, 32)
        np.testing.assert_allclose(np.asarray(o), np.asarray(a),
                                   atol=2e-4, err_msg=band)
        np.testing.assert_allclose(np.asarray(on), np.asarray(an),
                                   atol=2e-4, err_msg=band)
        ge = jax.grad(lambda f: jnp.sum(_fwarp_xla(x, f)[0] ** 2))(flo)
        gl = jax.grad(lambda f: jnp.sum(
            _fwarp_onehot_ladder(x, f, ladder, 32)[0] ** 2))(flo)
        np.testing.assert_allclose(np.asarray(gl), np.asarray(ge),
                                   rtol=1e-4, atol=1e-5, err_msg=band)


def test_fwarp_onehot_force_bf16_close():
    """force_bf16 (bf16-model hint with f32 flow inputs): GEMM operands
    in bf16, f32 accumulation — close to the exact f32 op at bf16
    tolerance, output dtype preserved (f32)."""
    from demfi_tpu.ops.warp import _fwarp_xla, _fwarp_xla_onehot

    x = jnp.asarray(RNG.uniform(-20, 20, (2, 24, 40, 2)).astype(np.float32))
    flo = jnp.stack(
        [jnp.asarray(RNG.uniform(-20, 20, (2, 24, 40)).astype(np.float32)),
         jnp.asarray(RNG.uniform(-6.9, 6.9, (2, 24, 40)).astype(np.float32))],
        axis=-1)
    a, an = _fwarp_xla(x, flo)
    o, on = _fwarp_xla_onehot(x, flo, 8, force_bf16=True)
    assert o.dtype == x.dtype
    np.testing.assert_allclose(np.asarray(a), np.asarray(o),
                               atol=0.35, rtol=0.02)
    np.testing.assert_allclose(np.asarray(an), np.asarray(on), atol=0.05)


def test_bwarp_pair_batchfold_exact():
    """bwarp_pair (one batch-folded gather) == two separate bwarps,
    values AND gradients; the DEMFI_BWARP_PAIR=0 escape hatch falls back
    to two calls with identical results."""
    import demfi_tpu.ops.warp as W

    a = jnp.asarray(RNG.randn(2, 16, 20, 3).astype(np.float32))
    b = jnp.asarray(RNG.randn(2, 16, 20, 3).astype(np.float32))
    fa = jnp.asarray(RNG.uniform(-4, 4, (2, 16, 20, 2)).astype(np.float32))
    fb = jnp.asarray(RNG.uniform(-4, 4, (2, 16, 20, 2)).astype(np.float32))
    wa, wb = W.bwarp_pair(a, b, fa, fb)
    np.testing.assert_array_equal(np.asarray(wa), np.asarray(W.bwarp(a, fa)))
    np.testing.assert_array_equal(np.asarray(wb), np.asarray(W.bwarp(b, fb)))

    g_pair = jax.grad(lambda f: jnp.sum(W.bwarp_pair(a, b, f, fb)[0] ** 2))(fa)
    g_sep = jax.grad(lambda f: jnp.sum(W.bwarp(a, f) ** 2))(fa)
    np.testing.assert_allclose(np.asarray(g_pair), np.asarray(g_sep),
                               rtol=1e-6, atol=1e-6)
