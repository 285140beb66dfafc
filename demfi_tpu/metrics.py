"""Evaluation metrics with reference parity.

PSNR/SSIM must reproduce the reference pipeline bit-for-bit
(/root/reference/utils.py:652-705, main.py:758-838): float64 RGB in
[0, 255], PSNR = 20 log10(255/sqrt(MSE)); SSIM is the MATLAB variant
(11x11 Gaussian sigma=1.5, C1/C2 on the 255 scale, valid-cropped by 5 px)
computed over the full 3-channel array. The reference's ``crop_8x8`` is a
no-op (utils.py:639-642): metrics run on full frames.
"""
from __future__ import annotations

import math

import cv2
import numpy as np


def denorm255(x: np.ndarray) -> np.ndarray:
    """[-1,1] float -> [0,255] float (utils.py:718-721)."""
    return np.clip((x + 1.0) / 2.0, 0.0, 1.0) * 255.0


def bf16_serving_label(psnr_bf16_vs_f32_db: float,
                       operating_psnr_db: float = 34.28,
                       budget_db: float = 0.05):
    """Translate an on-chip PSNR(bf16 output vs f32 output) measurement
    into the expected PSNR-vs-GT shift at the Table-2 operating point.

    The BASELINE budget (BASELINE.json, 0.05 dB) is defined on PSNR
    against ground truth; without the released checkpoint + datasets the
    certifiable on-chip quantity is the fidelity of the bf16 serving
    output against the f32 output on the same content
    (scripts/measure_tpu.py --sections bf16db). Model the bf16 rounding
    error as additive noise independent of the model's own GT error
    (MSEs add):  shift = 10*log10(1 + 10^((operating - P)/10)), where
    ``operating`` is the Table-2 rb(5,3) average PSNR
    (/root/reference/figures/Table2.PNG, 34.28 dB Adobe240).

    Returns (expected_shift_db, certified, label): ``certified`` iff the
    expected shift is inside the budget; ``label`` is the headline
    wording PERF.md/README must use either way.
    """
    shift = 10.0 * math.log10(
        1.0 + 10.0 ** ((operating_psnr_db - psnr_bf16_vs_f32_db) / 10.0))
    if shift < budget_db:
        return shift, True, (
            f"bf16 (expected PSNR shift {shift:.3f} dB vs f32 at the "
            f"{operating_psnr_db:.2f} dB operating point — within the "
            f"{budget_db} dB budget)")
    return shift, False, (
        f"bf16, −{shift:.2f} dB expected vs f32 at the "
        f"{operating_psnr_db:.2f} dB operating point")


def bf16_measured_label(shift_db: float, budget_db: float = 0.05):
    """Label for the DIRECTLY measured PSNR shift: on content with an
    independent reference signal, shift = PSNR(f32 output, ref) −
    PSNR(bf16 output, ref). This is the quantity the BASELINE 0.05 dB
    budget actually constrains (how much switching the serving dtype
    moves a PSNR measurement); bf16_serving_label's modeled bound is the
    fallback when no reference exists. Negative shifts (bf16 measuring
    higher by luck) are inside the budget by definition.

    Returns (certified, label).
    """
    if shift_db < budget_db:
        return True, (f"bf16 (measured PSNR shift {shift_db:+.3f} dB vs "
                      f"f32 — within the {budget_db} dB budget)")
    return False, f"bf16, −{shift_db:.2f} dB measured PSNR shift vs f32"


def crop_8x8(img: np.ndarray):
    """Reference API parity (utils.py:625-642): computes 32-multiple
    center-crop offsets but returns the image *uncropped* — the reference
    comments out the crop, so all published metrics are on full frames.
    Returns (img, y_offset, x_offset)."""
    ori_h, ori_w = img.shape[0], img.shape[1]
    h = (ori_h // 32) * 32
    w = (ori_w // 32) * 32
    while h > ori_h - 16:
        h -= 32
    while w > ori_w - 16:
        w -= 32
    return img, (ori_h - h) // 2, (ori_w - w) // 2


def psnr(img1: np.ndarray, img2: np.ndarray) -> float:
    """PSNR on [0,255] images (utils.py:652-660)."""
    a = img1.astype(np.float64)
    b = img2.astype(np.float64)
    mse = float(np.mean((a - b) ** 2))
    if mse == 0:
        return float("inf")
    return 20.0 * math.log10(255.0 / math.sqrt(mse))


def _ssim_single(img1: np.ndarray, img2: np.ndarray) -> float:
    c1 = (0.01 * 255) ** 2
    c2 = (0.03 * 255) ** 2
    a = img1.astype(np.float64)
    b = img2.astype(np.float64)
    k = cv2.getGaussianKernel(11, 1.5)
    win = np.outer(k, k.T)

    mu1 = cv2.filter2D(a, -1, win)[5:-5, 5:-5]
    mu2 = cv2.filter2D(b, -1, win)[5:-5, 5:-5]
    mu1_sq, mu2_sq, mu12 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    s1 = cv2.filter2D(a ** 2, -1, win)[5:-5, 5:-5] - mu1_sq
    s2 = cv2.filter2D(b ** 2, -1, win)[5:-5, 5:-5] - mu2_sq
    s12 = cv2.filter2D(a * b, -1, win)[5:-5, 5:-5] - mu12
    num = (2 * mu12 + c1) * (2 * s12 + c2)
    den = (mu1_sq + mu2_sq + c1) * (s1 + s2 + c2)
    return float((num / den).mean())


def ssim(img1: np.ndarray, img2: np.ndarray) -> float:
    """MATLAB-style SSIM on [0,255] images, [H,W] or [H,W,C].

    For 3-channel inputs the reference computes the value over the full
    RGB array (utils.py:698-701 calls ssim_matlab_func on the 3D array
    three times and averages identical values — equivalent to once).
    """
    if img1.shape != img2.shape:
        raise ValueError("Input images must have the same dimensions.")
    if img1.ndim == 2 or (img1.ndim == 3 and img1.shape[2] in (1, 3)):
        return _ssim_single(np.squeeze(img1), np.squeeze(img2))
    raise ValueError("Wrong input image dimensions.")


def eval_pair(pred_chw_bgr: np.ndarray, gt_chw_bgr: np.ndarray):
    """Reference metric pipeline for one prediction (main.py:762-771):

    pred/gt are [C,H,W] BGR in [-1,1]. Prediction is denormalized and
    *rounded*, the target is denormalized unrounded; both flipped to RGB.
    Returns (psnr, ssim).
    """
    out = np.around(denorm255(np.transpose(pred_chw_bgr, (1, 2, 0))[:, :, ::-1]))
    tgt = denorm255(np.transpose(gt_chw_bgr, (1, 2, 0))[:, :, ::-1])
    return psnr(tgt, out), ssim(tgt, out)


def eval_pair_hwc(pred_hwc_bgr: np.ndarray, gt_hwc_bgr: np.ndarray):
    """Same pipeline for NHWC-native arrays ([H,W,C] BGR in [-1,1])."""
    out = np.around(denorm255(pred_hwc_bgr[:, :, ::-1]))
    tgt = denorm255(gt_hwc_bgr[:, :, ::-1])
    return psnr(tgt, out), ssim(tgt, out)


def to_png_uint8(img_hwc_bgr: np.ndarray) -> np.ndarray:
    """[-1,1] BGR float -> uint8 BGR for cv2.imwrite (main.py:863-866)."""
    return denorm255(img_hwc_bgr).astype(np.uint8)


def tof_pair(pred_prev: np.ndarray, pred_cur: np.ndarray,
             gt_prev: np.ndarray, gt_cur: np.ndarray) -> float:
    """EXPERIMENTAL tOF-style temporal consistency.

    Table 2 of the paper reports tOF, but the released reference code
    never computes it, so there is no oracle to match. This follows the
    TecoGAN-style definition (mean |OF(pred_prev, pred_cur) -
    OF(gt_prev, gt_cur)|_1 with Farneback flow on grayscale [0, 255]);
    it has NOT been validated against any published number — treat the
    absolute values as relative-comparison-only. Exposed via
    --experimental_tof.

    Inputs are [H,W,C] BGR in [-1,1].
    """
    def gray(x):
        return cv2.cvtColor(denorm255(x).astype(np.uint8),
                            cv2.COLOR_BGR2GRAY)

    params = dict(pyr_scale=0.5, levels=3, winsize=15, iterations=3,
                  poly_n=5, poly_sigma=1.2, flags=0)
    f_pred = cv2.calcOpticalFlowFarneback(gray(pred_prev), gray(pred_cur),
                                          None, **params)
    f_gt = cv2.calcOpticalFlowFarneback(gray(gt_prev), gray(gt_cur),
                                        None, **params)
    return float(np.mean(np.abs(f_pred - f_gt)))
