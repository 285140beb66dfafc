"""TPU inference engine: t-batched whole-window forward + tiled big-frame path.

Deliberate departures from the reference inference driver
(/root/reference/utils.py:1339-1477, main.py:733-748), all pure wins on TPU:

1. **t-batching.** The reference re-runs the entire network for each of the
   M-1 interpolation instants of a 4-frame window. Here the t-independent
   Stage I context (RDB backbone + FAC-FB, the dominant FLOPs) runs once per
   window and all instants go through ``synthesize`` as one device batch
   (explicit batch replication — measured much faster than vmap on TPU).

2. **Window batching.** ``forward_windows`` additionally batches N windows
   in one compiled call (N*(M-1) synthesize batch) for dataset-eval
   throughput.

3. **Deterministic tiling under jit.** For frames too large for HBM, the
   reflect-pad-to-32-multiples + 32 px halo + trim + stitch semantics of
   ``patch_forward_DeFInet_itr`` are preserved exactly, each distinct tile
   shape compiled once.
"""
from __future__ import annotations

import dataclasses
import os
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from demfi_tpu.models.demfi import DeMFINet

# Auto t-chunk budget: the x8 synthesize batch measures ~3.5 KB of HBM
# per pixel-instant on v5e (720p x 7 instants = 22.8 GB > the 15.75 GB
# chip, measure_r02_720p.json), so cap pixel-instants per device batch
# and split the t axis beyond it. The cap is derived from the device's
# actual HBM (other chip generations under/over-batch otherwise), with
# the measured v5e value as the fallback.
_BYTES_PER_PIXEL_INSTANT = 3500
_FALLBACK_PIXEL_INSTANT_BUDGET = 3_500_000  # == 0.78 * 15.75 GB / 3.5 KB
_budget_cache: List[int] = []

# XLA:TPU f32 fusion miscompile guard — RETIRED 2026-08-19. Rounds 2-3
# saw float32 full-frame Stage-II outputs go NaN at >=352x640 (while
# <=192x320 tiles stayed clean), so f32 TPU eval above a safe pixel
# count was auto-routed through the (bit-equivalent-semantics) tiled
# path. The retirement test (scripts/f32_repro.py: distilled constructs
# c1/c2 + the full-model c3) came back ALL CLEAN on the current
# toolchain (tpu_reports/f32_repro.json, jax/jaxlib 0.9.0, TPU v5
# lite), independently confirmed by measure_tpu --sections f32check
# (f32_352x640_finite: true). The guard machinery stays, disarmed:
# DEMFI_F32_TPU_SAFE_PIXELS=<pixels> re-arms the reroute above that
# pixel count (the round-3 behavior was 61440 = 192*320) should a
# future toolchain regress — re-run scripts/f32_repro.py to decide.
_F32_TPU_SAFE_PIXELS = int(os.environ.get(
    "DEMFI_F32_TPU_SAFE_PIXELS", "0") or "0")
# verified-clean tile size of the historical reroute (used as the tile
# budget when the guard is re-armed without an explicit pixel count)
_F32_GUARD_TILE_PIXELS = 192 * 320
_f32_route_warned: List[bool] = []


def _f32_tpu_tiling(h: int, w: int, patch_boundary: int,
                    budget: int = _F32_GUARD_TILE_PIXELS
                    ) -> Tuple[int, int]:
    """Fewest-tiles (n_ph, n_pw) grid whose tiles (incl. halo) stay
    within the f32-safe pixel count.

    Two constraints the grid must satisfy (round-3 review findings):
    the budget is computed on the PADDED dims, because forward_window
    reflect-pads to patch_boundary multiples before tiling; and the
    grid must DIVIDE the padded dims — the reference-semantics stitcher
    assumes ``sh = new_h // n_ph`` exactly (utils.py:1389-1450), so a
    non-dividing grid would mis-place tiles and leave canvas rows
    uncovered. If no dividing grid satisfies the budget (degenerate
    halo), returns the finest dividing grid instead."""
    pb = patch_boundary
    hp = h + ((-h) % pb) if pb > 0 else h
    wp = w + ((-w) % pb) if pb > 0 else w
    div_h = [n for n in range(1, hp + 1) if hp % n == 0]
    div_w = [n for n in range(1, wp + 1) if wp % n == 0]
    best = None
    for nh in div_h:
        th = hp // nh + 2 * pb
        # smallest dividing nw whose tile fits the budget at this nh
        for nw in div_w:
            if th * (wp // nw + 2 * pb) <= budget:
                if best is None or nh * nw < best[0]:
                    best = (nh * nw, nh, nw)
                break
    if best is not None:
        return best[1], best[2]
    return div_h[-1], div_w[-1]


def _pixel_instant_budget() -> int:
    if not _budget_cache:
        budget = _FALLBACK_PIXEL_INSTANT_BUDGET
        try:
            stats = jax.devices()[0].memory_stats() or {}
            limit = stats.get("bytes_limit") or stats.get(
                "bytes_reservable_limit")
            if limit:
                budget = int(limit * 0.78 / _BYTES_PER_PIXEL_INSTANT)
        except Exception:
            pass
        _budget_cache.append(budget)
    return _budget_cache[0]


@dataclasses.dataclass
class WindowResult:
    """Outputs for one 4-frame window at its M-1 t-values (numpy NHWC,
    leading t axis; t-independent fields broadcast over t)."""
    s0_prime: np.ndarray   # [T,H,W,3]
    s1_prime: np.ndarray
    st_prime: np.ndarray
    s0_final: np.ndarray   # [T,H,W,3] (last boosting iteration)
    s1_final: np.ndarray
    st_final: np.ndarray
    flow_init: np.ndarray  # [T,H,W,4]
    flow_final: np.ndarray
    occ0_init: np.ndarray  # [T,H,W,1]
    occ0_final: np.ndarray
    ovlp: np.ndarray       # [T,H,W,3]
    blend_w0: np.ndarray   # [T,H,W,1] FGAC gate maps
    blend_w1: np.ndarray
    diff_10: np.ndarray    # [T,H,W,1] FGAC difference maps
    diff_01: np.ndarray
    # --visualization_flag FGAC internals (zeros unless the model was
    # built with viz_internals): normalized source key / init ref key /
    # aggregated E_s / bolstered ("FCW") per direction, plus the
    # bidirectional flows for the FCW-flow panels
    fgac_src_10: np.ndarray = None   # [T,H,W,1]
    fgac_ref_10: np.ndarray = None
    fgac_warp_10: np.ndarray = None
    fgac_fcw_10: np.ndarray = None
    fgac_src_01: np.ndarray = None
    fgac_ref_01: np.ndarray = None
    fgac_warp_01: np.ndarray = None
    fgac_fcw_01: np.ndarray = None
    flow_01: np.ndarray = None       # [T,H,W,2]
    flow_10: np.ndarray = None


def _field_channels(name: str) -> int:
    """Channel count of each WindowResult field (zero-fill + canvases)."""
    return {"flow_init": 4, "flow_final": 4, "occ0_init": 1,
            "occ0_final": 1, "blend_w0": 1, "blend_w1": 1,
            "diff_10": 1, "diff_01": 1, "flow_01": 2, "flow_10": 2,
            }.get(name, 1 if name.startswith("fgac_") else 3)


def _pad_reflect_to_multiple(frames: np.ndarray, m: int) -> Tuple[np.ndarray, int, int]:
    """Reflect-pad H, W (bottom/right) to multiples of m
    (utils.py:1352-1365). frames: [B,T,H,W,C]."""
    h, w = frames.shape[2], frames.shape[3]
    ph = (-h) % m
    pw = (-w) % m
    if ph or pw:
        frames = np.pad(frames, ((0, 0), (0, 0), (0, ph), (0, pw), (0, 0)),
                        mode="reflect")
    return frames, h, w


def _tile_bounds(pb: int, h: int, w: int, ph: int, sh: int, pw: int, sw: int):
    """Reference get_HW_boundary (utils.py:1757-1774)."""
    h_lo = max(ph * sh - pb, 0)
    h_hi = min((ph + 1) * sh + pb, h)
    w_lo = max(pw * sw - pb, 0)
    w_hi = min((pw + 1) * sw + pb, w)
    return h_lo, h_hi, w_lo, w_hi


def _trim(img: np.ndarray, pb: int, h: int, w: int, ph: int, sh: int,
          pw: int, sw: int) -> np.ndarray:
    """Reference trim_patch_boundary (utils.py:1777-1798) in [..., H, W, C]."""
    if pb == 0:
        return img
    if ph * sh >= pb:
        img = img[..., pb:, :, :]
    if (ph + 1) * sh + pb <= h:
        img = img[..., :-pb, :, :]
    if pw * sw >= pb:
        img = img[..., :, pb:, :]
    if (pw + 1) * sw + pb <= w:
        img = img[..., :, :-pb, :]
    return img


class InferenceEngine:
    """Compiled whole-window inference for a fixed model + parameters."""

    def __init__(self, model: DeMFINet, variables, num_update: int,
                 t_chunk: Optional[int] = None, mesh=None,
                 fetch: str = "full"):
        """mesh: optional jax.sharding.Mesh. The window batch is sharded
        over its 'data' axis (each device evaluates different windows /
        t-instants) and frame rows over its 'spatial' axis (XLA SPMD adds
        conv halo exchanges) — the TPU replacement for the reference's
        serial tile loop (utils.py:1389-1450).

        fetch: which WindowResult tensors cross the device->host link.
        "full" fetches every field; "images" only the six output frames
        (primes + last-iteration finals) and zero-fills the diagnostic
        fields host-side — the right mode for metric-only eval (no
        --visualization_flag), where fetching every boosting iteration's
        flow/occ stack dominated real eval wall-clock on the dev tunnel.
        Either way the jitted program reduces to the exact fields fetched
        (last boosting iteration only — never the full [N_iter,...]
        stacks the model emits)."""
        self.model = model
        self.variables = variables
        self.num_update = num_update
        # cap on t-values per device batch; None = derive from the HBM
        # pixel-instant budget (720p x8 in one batch OOMs a v5e)
        self.t_chunk = t_chunk
        self.fetch = fetch

        def forward(variables, frames, ts):
            """frames [N,4,H,W,3]; ts [N,M] -> dict of WindowResult
            tensors, batch N*M (device-side field selection)."""
            n, m = ts.shape
            ctx = model.apply(variables, frames, method=model.extract)
            ctx = jax.tree_util.tree_map(
                lambda x: jnp.repeat(x, m, axis=0), ctx)
            out = model.apply(variables, ctx, ts.reshape(n * m, 1),
                              num_update, method=model.synthesize)
            # [N_iter, B, ...] stacks reduce to the served iteration ON
            # DEVICE; shape[0] is static under trace
            sel = dict(
                s0_prime=out.s0_prime, s1_prime=out.s1_prime,
                st_prime=out.st_prime,
                s0_final=(out.s0_final[-1] if out.s0_final.shape[0]
                          else out.s0_prime),
                s1_final=(out.s1_final[-1] if out.s1_final.shape[0]
                          else out.s1_prime),
                st_final=(out.st_final[-1] if out.st_final.shape[0]
                          else out.st_prime))
            if fetch == "full":
                sel.update(
                    flow_init=out.flow_preds[0],
                    flow_final=out.flow_preds[-1],
                    occ0_init=out.occ0_preds[0],
                    occ0_final=out.occ0_preds[-1],
                    ovlp=out.ovlp_b0b1,
                    blend_w0=out.blend_weights[0],
                    blend_w1=out.blend_weights[1],
                    diff_10=out.diff_maps[0],
                    diff_01=out.diff_maps[1])
                if out.viz_stacks:
                    sel["viz_stacks"] = out.viz_stacks
            return sel

        self.mesh = mesh
        self._jit_forward = jax.jit(forward)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            self._params_sharded = jax.device_put(
                variables, NamedSharding(mesh, P()))

        def dispatch(variables, frames, ts):
            if mesh is None:
                return self._jit_forward(variables, frames, ts)
            # Per-call shardings: shard each axis only when it divides
            # (a single full-frame window can't split over 'data'; it
            # still spreads rows over 'spatial' — XLA SPMD inserts the
            # conv halo exchanges).
            from jax.sharding import NamedSharding, PartitionSpec as P
            n, _, hh, _, _ = frames.shape
            nd = mesh.shape.get("data", 1)
            ns = mesh.shape.get("spatial", 1)
            data = "data" if (nd > 1 and n % nd == 0) else None
            spatial = "spatial" if (ns > 1 and hh % ns == 0) else None
            frames = jax.device_put(
                frames, NamedSharding(mesh, P(data, None, spatial)))
            ts = jax.device_put(ts, NamedSharding(mesh, P(data)))
            # the mesh-replicated params are cached at __init__, but a
            # caller passing DIFFERENT variables (e.g. after a checkpoint
            # reload) must not silently run with the stale cache
            params = (self._params_sharded if variables is self.variables
                      else jax.device_put(variables, NamedSharding(mesh, P())))
            return self._jit_forward(params, frames, ts)

        self._forward = dispatch

    # -------------------------------------------------------------- core
    def _run(self, frames: np.ndarray, ts: np.ndarray) -> List[WindowResult]:
        """frames [N,4,H,W,3], ts [N,M] -> per-window results."""
        return self._fetch(self._dispatch(frames, ts))

    def _dispatch(self, frames: np.ndarray, ts: np.ndarray):
        """Async half of _run: enqueue the jitted forward and return
        (device outputs, n, m) WITHOUT reading back. JAX dispatch is
        asynchronous, so the caller can dispatch window chunk N+1 before
        fetching N — the device computes while the host does readback +
        metrics (round-4 VERDICT #8)."""
        n, m = ts.shape
        return (self._forward(self.variables, jnp.asarray(frames),
                              jnp.asarray(ts)), n, m)

    def _fetch(self, pending) -> List[WindowResult]:
        """Blocking half of _run: read back a _dispatch result and pack
        per-window WindowResults."""
        dev_out, n, m = pending
        out = jax.device_get(dev_out)

        def per_t(x):        # [N*M, H, W, C] -> [N, M, H, W, C]
            return x.reshape((n, m) + x.shape[1:])

        if "viz_stacks" in out:
            (s10, s01, vflows) = out.pop("viz_stacks")
            out.update(
                fgac_src_10=s10[0], fgac_ref_10=s10[1],
                fgac_warp_10=s10[2], fgac_fcw_10=s10[3],
                fgac_src_01=s01[0], fgac_ref_01=s01[1],
                fgac_warp_01=s01[2], fgac_fcw_01=s01[3],
                flow_01=vflows[0], flow_10=vflows[1])

        # fields not fetched from device (fetch="images", or a model
        # built without viz_internals) zero-fill host-side
        shp = out["st_prime"].shape[:-1]
        for f in dataclasses.fields(WindowResult):
            if f.name not in out:
                out[f.name] = np.zeros(shp + (_field_channels(f.name),),
                                       np.float32)

        return [WindowResult(
            **{f.name: per_t(np.asarray(out[f.name], np.float32))[i]
               for f in dataclasses.fields(WindowResult)})
            for i in range(n)]

    def _effective_t_chunk(self, h, w, m, test_patch=(1, 1), n_windows=1):
        """User cap if given, else the HBM-derived one (per-tile pixels
        when the tiled path will split the frame; a window batch of N
        multiplies the pixels per instant by N). Returns 0 when even a
        single instant of the full window batch exceeds the budget.

        The 3.5 KB/pixel-instant constant was measured at bfloat16
        compute; float32 activations double it, so the f32 cap halves."""
        if self.t_chunk:
            return self.t_chunk
        px = (h // test_patch[0]) * (w // test_patch[1]) * n_windows
        if self.model.dtype == jnp.float32:
            px *= 2
        cap = _pixel_instant_budget() // max(px, 1)
        if cap < 1:
            return 0 if n_windows > 1 else 1
        return cap if cap < m else None

    def _route_f32_tpu(self, h: int, w: int,
                       test_patch: Tuple[int, int],
                       patch_boundary: int) -> Tuple[int, int]:
        """Reroute f32 full-frame TPU eval through the tiled path when
        the frame exceeds the (env-armed) miscompile-safe pixel count.
        RETIRED by default — the current toolchain passes the full
        scripts/f32_repro.py suite (see _F32_TPU_SAFE_PIXELS above);
        DEMFI_F32_TPU_SAFE_PIXELS re-arms it. No-op for bf16, CPU,
        already-tiled calls, or with DEMFI_F32_TPU_UNSAFE_OK=1."""
        # int-parsed like every other DEMFI_* switch ("0" keeps the guard)
        unsafe_ok = bool(int(os.environ.get("DEMFI_F32_TPU_UNSAFE_OK",
                                            "0") or "0"))
        safe_px = _F32_TPU_SAFE_PIXELS
        if (safe_px <= 0
                or test_patch != (1, 1)
                or self.model.dtype != jnp.float32
                or h * w <= safe_px
                or unsafe_ok
                or jax.default_backend() != "tpu"):
            return test_patch
        routed = _f32_tpu_tiling(h, w, patch_boundary,
                                 min(safe_px, _F32_GUARD_TILE_PIXELS))
        if not _f32_route_warned:
            _f32_route_warned.append(True)
            print(f"WARNING: float32 full-frame eval at {h}x{w} exceeds "
                  f"DEMFI_F32_TPU_SAFE_PIXELS={safe_px}; rerouting "
                  f"through the tiled path test_patch={routed}. Use "
                  f"bfloat16 for full-frame speed, or set "
                  f"DEMFI_F32_TPU_UNSAFE_OK=1 to force the untiled "
                  f"path.", flush=True)
        return routed

    def forward_windows(self, frames: np.ndarray, ts: np.ndarray,
                        patch_boundary: int = 32) -> List[WindowResult]:
        """Batched untiled inference: frames [N,4,H,W,3], ts [N,M].

        Applies the same HBM pixel-instant budget as ``forward_window``,
        scaled by the window multiplicity: the t axis is chunked, and if
        even one instant of the N-window batch exceeds the budget the
        windows run individually (through the tiled-capable path, with
        the caller's ``patch_boundary`` halo). Non-multiple frame dims
        are reflect-padded like ``forward_window`` (and the outputs
        trimmed back) so the encoder's stride pyramid always sees
        multiple-of-``patch_boundary`` shapes."""
        ts = np.asarray(ts, np.float32)
        n, m = ts.shape
        if self._route_f32_tpu(frames.shape[2], frames.shape[3],
                               (1, 1), patch_boundary) != (1, 1):
            # f32 miscompile guard: run windows individually through the
            # tiled-capable path
            return [self.forward_window(frames[i:i + 1], ts[i],
                                        patch_boundary=patch_boundary)
                    for i in range(n)]
        frames, ori_h, ori_w = _pad_reflect_to_multiple(
            frames, max(patch_boundary, 1))

        def trim(r: WindowResult) -> WindowResult:
            return WindowResult(**{
                f.name: getattr(r, f.name)[:, :ori_h, :ori_w, :]
                for f in dataclasses.fields(WindowResult)})

        chunk = self._effective_t_chunk(frames.shape[2], frames.shape[3],
                                        m, n_windows=n)
        if chunk == 0:
            return [self.forward_window(frames[i:i + 1, :, :ori_h, :ori_w],
                                        ts[i],
                                        patch_boundary=patch_boundary)
                    for i in range(n)]
        if chunk and m > chunk:
            parts = [self._run(frames, ts[:, i:i + chunk])
                     for i in range(0, m, chunk)]
            return [trim(WindowResult(**{
                f.name: np.concatenate([getattr(p[wi], f.name)
                                        for p in parts])
                for f in dataclasses.fields(WindowResult)}))
                for wi in range(n)]
        return [trim(r) for r in self._run(frames, ts)]

    def dispatch_windows(self, frames: np.ndarray, ts: np.ndarray,
                         patch_boundary: int = 32):
        """Async half of ``forward_windows``: enqueue the device work and
        return an opaque handle for :meth:`fetch_windows`, or ``None``
        when this call can't pipeline (the tiled fallback / f32-reroute
        paths go through per-tile host logic) — the caller must then use
        ``forward_windows`` directly. Dispatching chunk N+1 before
        fetching N keeps the device busy during the tunnel readback +
        host metrics of chunk N (round-4 VERDICT #8)."""
        ts = np.asarray(ts, np.float32)
        n, m = ts.shape
        if self._route_f32_tpu(frames.shape[2], frames.shape[3],
                               (1, 1), patch_boundary) != (1, 1):
            return None
        frames, ori_h, ori_w = _pad_reflect_to_multiple(
            frames, max(patch_boundary, 1))
        chunk = self._effective_t_chunk(frames.shape[2], frames.shape[3],
                                        m, n_windows=n)
        if chunk == 0:
            return None
        if chunk and m > chunk:
            # t-chunked: every chunk enqueues now (programs run serially
            # on-device; only the small fetched image outputs stay live)
            pendings = [self._dispatch(frames, ts[:, i:i + chunk])
                        for i in range(0, m, chunk)]
        else:
            pendings = [self._dispatch(frames, ts)]
        return (pendings, n, ori_h, ori_w)

    def fetch_windows(self, handle) -> List[WindowResult]:
        """Blocking half of ``forward_windows`` for a
        :meth:`dispatch_windows` handle (same return value/trim)."""
        pendings, n, ori_h, ori_w = handle
        parts = [self._fetch(p) for p in pendings]

        def trim_cat(wi):
            return WindowResult(**{
                f.name: np.concatenate([getattr(p[wi], f.name)
                                        for p in parts])[:, :ori_h, :ori_w]
                for f in dataclasses.fields(WindowResult)})
        return [trim_cat(i) for i in range(n)]

    def forward_window(self, frames: np.ndarray, ts: Sequence[float],
                       test_patch: Tuple[int, int] = (1, 1),
                       patch_boundary: int = 32) -> WindowResult:
        """Full-resolution single-window inference with the reference's
        pad/tile/halo/trim/stitch semantics, batching all t per tile.

        frames: [1,4,H,W,3] float32 BGR in [-1,1] (order B0,B1,B-1,B2).
        """
        ts = np.asarray(ts, np.float32)
        test_patch = self._route_f32_tpu(frames.shape[2], frames.shape[3],
                                         test_patch, patch_boundary)
        chunk = self._effective_t_chunk(frames.shape[2], frames.shape[3],
                                        len(ts), test_patch)
        if chunk and len(ts) > chunk:
            parts = [self.forward_window(frames, ts[i:i + chunk],
                                         test_patch, patch_boundary)
                     for i in range(0, len(ts), chunk)]
            return WindowResult(**{
                f.name: np.concatenate([getattr(p, f.name) for p in parts])
                for f in dataclasses.fields(WindowResult)})

        frames, ori_h, ori_w = _pad_reflect_to_multiple(frames, patch_boundary)
        new_h, new_w = frames.shape[2], frames.shape[3]
        n_ph, n_pw = test_patch
        sh, sw = new_h // n_ph, new_w // n_pw
        m = len(ts)

        if test_patch == (1, 1):
            res = self._run_window(frames, ts)
            return WindowResult(**{
                f.name: getattr(res, f.name)[:, :ori_h, :ori_w, :]
                for f in dataclasses.fields(WindowResult)})

        def canvas(c):
            return np.zeros((m, new_h, new_w, c), np.float32)

        fields = {f.name: canvas(_field_channels(f.name))
                  for f in dataclasses.fields(WindowResult)}

        # group same-shape tiles (interior tiles share a shape) and run
        # each group as one batched device call
        tiles = []
        for ph in range(n_ph):
            for pw in range(n_pw):
                h_lo, h_hi, w_lo, w_hi = _tile_bounds(
                    patch_boundary, new_h, new_w, ph, sh, pw, sw)
                tiles.append(((ph, pw),
                              frames[:, :, h_lo:h_hi, w_lo:w_hi, :]))
        groups: dict = {}
        for pos, tile in tiles:
            groups.setdefault(tile.shape, []).append((pos, tile))
        for shape, group in groups.items():
            # bound the group batch by the HBM budget too: a fine grid
            # can put dozens of same-shape interior tiles in one group,
            # and tiles x instants x tile-pixels is the real footprint
            tile_px = shape[2] * shape[3]
            if self.model.dtype == jnp.float32:
                tile_px *= 2
            per_call = max(1, _pixel_instant_budget() // max(m * tile_px, 1))
            sub_results: List = []
            for i in range(0, len(group), per_call):
                sub = group[i:i + per_call]
                batch = np.concatenate([t for _, t in sub], axis=0)
                ts_b = np.tile(ts[None], (len(sub), 1))
                sub_results.extend(self._run(batch, ts_b))
            for (ph, pw), res in zip((p for p, _ in group), sub_results):
                for name, canvas_arr in fields.items():
                    t = _trim(getattr(res, name), patch_boundary,
                              new_h, new_w, ph, sh, pw, sw)
                    canvas_arr[:, ph * sh:(ph + 1) * sh,
                               pw * sw:(pw + 1) * sw, :] = t

        return WindowResult(**{k: v[:, :ori_h, :ori_w, :]
                               for k, v in fields.items()})

    def _run_window(self, frames: np.ndarray, ts: np.ndarray) -> WindowResult:
        return self._run(frames, np.asarray(ts, np.float32)[None])[0]
