"""Data pipeline tests on a synthetic Adobe240-style fixture tree."""
import os

import cv2
import numpy as np
import pytest

from demfi_tpu.data import (
    AdobeTrainDataset, EvalDataset, CustomDataset,
    build_eval_index, build_custom_index, TrainLoader, iter_eval)

import random


@pytest.fixture(scope="module")
def dataset_root(tmp_path_factory):
    """Blur frames named by absolute sharp index with stride 8 starting at
    00017.png (reference naming, main.py:56-63); sharp frames 0..N."""
    root = tmp_path_factory.mktemp("adobe")
    rng = np.random.RandomState(0)
    for split, scenes in (("train", 2), ("test", 2)):
        for s in range(scenes):
            sharp = root / split / f"scene{s}"
            blur = root / f"{split}_blur" / f"scene{s}"
            sharp.mkdir(parents=True)
            blur.mkdir(parents=True)
            for i in range(80):
                img = rng.randint(0, 255, (64, 96, 3), np.uint8)
                cv2.imwrite(str(sharp / f"{str(i).zfill(5)}.png"), img)
            for k in range(8):
                i = 17 + 8 * k
                img = rng.randint(0, 255, (64, 96, 3), np.uint8)
                cv2.imwrite(str(blur / f"{str(i).zfill(5)}.png"), img)
    return str(root)


def test_train_sample_layout(dataset_root):
    ds = AdobeTrainDataset(dataset_root, t_sampling_num=8, patch_size=32)
    s = ds.sample(0, random.Random(0))
    assert s.frames.shape == (9, 32, 32, 3)
    assert s.frames.min() >= -1 and s.frames.max() <= 1
    assert 0 < float(s.t_value[0]) < 1
    # t on the K-grid
    grid = np.linspace(1 / 8, 7 / 8, 7)
    assert np.any(np.isclose(float(s.t_value[0]), grid))


def test_train_reversal_flips_t(dataset_root):
    ds = AdobeTrainDataset(dataset_root, t_sampling_num=8, patch_size=32)
    ts = {round(float(ds.sample(0, random.Random(i)).t_value[0]), 4)
          for i in range(40)}
    # both t and 1-t variants appear across seeds
    assert any(abs(a + b - 1.0) < 1e-6 for a in ts for b in ts if a != b)


def test_eval_index_reference_semantics(dataset_root):
    items = build_eval_index(dataset_root, multiple=8, t_step_size=8)
    # 2 scenes x 8 blur frames: windows at idx 1..5 (skip first, stop at
    # len-2), 7 t-values each
    assert len(items) == 2 * 5 * 7
    it = items[0]
    # first window: B0=00025, B1=00033, B-1=00017, B2=00041
    assert os.path.basename(it.blur_paths[0]) == "00025.png"
    assert os.path.basename(it.blur_paths[1]) == "00033.png"
    assert os.path.basename(it.blur_paths[2]) == "00017.png"
    assert os.path.basename(it.blur_paths[3]) == "00041.png"
    # sharp GT for mul=0: 25 + (8/8)*1 = 00026.png
    assert os.path.basename(it.st_path) == "00026.png"
    assert it.t_value == pytest.approx(1 / 8)
    # x2: one t=0.5 sample per window
    items2 = build_eval_index(dataset_root, multiple=2, t_step_size=8)
    assert len(items2) == 2 * 5
    assert items2[0].t_value == pytest.approx(0.5)
    assert os.path.basename(items2[0].st_path) == "00029.png"


def test_eval_dataset_load(dataset_root):
    ds = EvalDataset(dataset_root, multiple=2)
    item = ds.load(0)
    assert item["blur"].shape == (4, 64, 96, 3)
    assert item["st_gt"].shape == (64, 96, 3)
    assert item["scene"] == "scene0"
    # center crop path
    ds2 = EvalDataset(dataset_root, multiple=2, center_patch=32)
    item2 = ds2.load(0)
    assert item2["blur"].shape == (4, 32, 32, 3)


def test_custom_index(tmp_path):
    rng = np.random.RandomState(0)
    scene = tmp_path / "myscene"
    scene.mkdir()
    for i in range(6):
        cv2.imwrite(str(scene / f"{str(i).zfill(5)}.png"),
                    rng.randint(0, 255, (32, 32, 3), np.uint8))
    items = build_custom_index(str(tmp_path), multiple=4)
    # windows at idx 1..3 (skip first, stop at len-2), 3 t-values each
    assert len(items) == 3 * 3
    assert items[0].st_path == "00001_000.png"
    ds = CustomDataset(str(tmp_path), multiple=4)
    item = ds.load(0)
    assert item["blur"].shape == (4, 32, 32, 3)


def test_train_loader_batches(dataset_root):
    ds = AdobeTrainDataset(dataset_root, patch_size=32)
    loader = TrainLoader(ds, batch_size=2, num_threads=2, seed=1)
    batches = list(loader.epoch(0))
    assert len(batches) == len(loader) == 1  # 2 scenes / batch 2
    frames, ts = batches[0]
    assert frames.shape == (2, 9, 32, 32, 3)
    assert ts.shape == (2, 1)
    # determinism given (seed, epoch)
    frames2, ts2 = next(iter(TrainLoader(ds, batch_size=2, num_threads=2,
                                         seed=1).epoch(0)))
    np.testing.assert_array_equal(frames, frames2)


def test_iter_eval_order(dataset_root):
    ds = EvalDataset(dataset_root, multiple=2)
    seen = [item["st_name"] for item in iter_eval(ds)]
    want = [os.path.basename(it.st_path) for it in ds.items]
    assert seen == want


def test_device_prefetch_preserves_order_and_values():
    import jax
    from jax.sharding import Mesh
    from demfi_tpu.data.pipeline import device_prefetch
    batches = [(np.full((4, 2), i, np.float32), np.full((4, 1), i, np.float32))
               for i in range(5)]
    mesh = Mesh(np.array(jax.devices()[:2]), ("data",))
    out = list(device_prefetch(iter(batches), mesh))
    assert len(out) == 5
    for i, (f, t) in enumerate(out):
        np.testing.assert_array_equal(np.asarray(f), batches[i][0])


def test_y_channel_normalization():
    from demfi_tpu.data.datasets import _normalize
    x = np.full((1, 2, 2, 3), 128, np.uint8)
    y = _normalize(x, channels=1)
    # BT.601: Y = sum(128*coef/255) + 16, then [-1,1]
    want = (np.sum(128 * np.array([65.481, 128.553, 24.966]) / 255.0)
            + 16.0) / 255.0
    want = (want - 0.5) * 2
    np.testing.assert_allclose(y, np.full((1, 2, 2, 1), want), rtol=1e-5)


def test_get_test_data_dispatch(dataset_root, tmp_path):
    import dataclasses
    from demfi_tpu.config import config_rb
    from demfi_tpu.data import get_test_data, EvalDataset, CustomDataset
    cfg = config_rb(1, 1, test_data_path=dataset_root, phase="test")
    ds = get_test_data(cfg, multiple=2, center_flag=True)
    assert isinstance(ds, EvalDataset) and ds.center_patch == cfg.patch_size
    scene = tmp_path / "sc"
    scene.mkdir()
    for i in range(5):
        cv2.imwrite(str(scene / f"{i:05d}.png"),
                    np.zeros((16, 16, 3), np.uint8))
    cfg2 = dataclasses.replace(cfg, phase="test_custom",
                               custom_path=str(tmp_path))
    assert isinstance(get_test_data(cfg2, multiple=4), CustomDataset)
