"""Eval-driver accounting parity: with a stub engine producing outputs at
known PSNR offsets from GT, the meters must reproduce the reference's
accounting (main.py:632-1107): interp slots per t-index, deblur updates at
the t=0.5 sample plus the trailing S1 per scene, scene-average rollover.
"""
import math
import os

import cv2
import numpy as np
import pytest

from demfi_tpu.config import config_rb
from demfi_tpu.data.datasets import EvalDataset, _imread, _normalize
from demfi_tpu.infer.driver import evaluate, _load_window
from demfi_tpu.infer.engine import WindowResult

D_ST, D_S0, D_S1 = 4.0, 8.0, 16.0  # [0,255]-scale offsets


def psnr_of(delta):
    return 20 * math.log10(255.0 / delta)


@pytest.fixture()
def setup(tmp_path):
    rng = np.random.RandomState(0)
    for s in range(2):
        sharp = tmp_path / "test" / f"scene{s}"
        blur = tmp_path / "test_blur" / f"scene{s}"
        sharp.mkdir(parents=True)
        blur.mkdir(parents=True)
        for i in range(60):
            cv2.imwrite(str(sharp / f"{i:05d}.png"),
                        rng.randint(32, 224, (24, 32, 3), np.uint8))
        for k in range(5):  # 2 windows per scene
            cv2.imwrite(str(blur / f"{17 + 8 * k:05d}.png"),
                        rng.randint(32, 224, (24, 32, 3), np.uint8))
    cfg = config_rb(1, 1, test_data_path=str(tmp_path),
                    test_img_dir=str(tmp_path / "imgs"),
                    text_dir=str(tmp_path / "txt"),
                    checkpoint_dir=str(tmp_path / "ck"),
                    log_dir=str(tmp_path / "log"))
    return cfg, str(tmp_path)


class StubEngine:
    """Returns GT minus fixed [0,255]-scale offsets, per output kind."""

    def __init__(self, cfg, multiple):
        self.ds = EvalDataset(cfg.test_data_path, multiple,
                              cfg.t_step_size)
        self.w = 0

    def forward_window(self, frames, ts, **kw):
        blur, s0_gt, s1_gt, sts_gt, items = _load_window(self.ds, self.w)
        self.w += 1

        def off(gt, d):
            return gt - d / 127.5  # [0,255] offset in [-1,1] units

        m = len(ts)
        st = np.stack([off(sts_gt[j], D_ST) for j in range(m)])
        s0 = np.broadcast_to(off(s0_gt, D_S0), st.shape).copy()
        s1 = np.broadcast_to(off(s1_gt, D_S1), st.shape).copy()
        z1 = np.zeros(st.shape[:3] + (1,), np.float32)
        z4 = np.zeros(st.shape[:3] + (4,), np.float32)
        return WindowResult(
            s0_prime=s0, s1_prime=s1, st_prime=st,
            s0_final=s0, s1_final=s1, st_final=st,
            flow_init=z4, flow_final=z4, occ0_init=z1, occ0_final=z1,
            ovlp=st, blend_w0=z1, blend_w1=z1, diff_10=z1, diff_01=z1)


def test_x8_accounting(setup):
    cfg, root = setup
    eng = StubEngine(cfg, 8)
    loss, ip, is_, dp, ds_ = evaluate(cfg, eng, multiple=8,
                                      save_images=False)[:5]
    # every interp sample has PSNR(4): total interp average
    assert ip == pytest.approx(psnr_of(D_ST), abs=1e-4)
    # deblur "total average of total samples": S0 at j==3 for each of the
    # 4 windows + trailing S1 at each of the 2 scene ends
    want_dp = (4 * psnr_of(D_S0) + 2 * psnr_of(D_S1)) / 6
    assert dp == pytest.approx(want_dp, abs=1e-4)
    # loss = mean L1 on [-1,1]: D_ST/127.5
    assert loss == pytest.approx(D_ST / 127.5, rel=1e-5)


def test_x2_accounting(setup):
    cfg, root = setup
    eng = StubEngine(cfg, 2)
    loss, ip, is_, dp, ds_ = evaluate(cfg, eng, multiple=2,
                                      save_images=False)[:5]
    assert ip == pytest.approx(psnr_of(D_ST), abs=1e-4)
    # x2: S0 deblur update every sample (4 windows) + 2 trailing S1
    want_dp = (4 * psnr_of(D_S0) + 2 * psnr_of(D_S1)) / 6
    assert dp == pytest.approx(want_dp, abs=1e-4)
