"""Native augment library: exact parity with the numpy reference chain."""
import numpy as np
import pytest

from demfi_tpu.data import native


@pytest.fixture(scope="module")
def lib():
    l = native.get_lib()
    if l is None:
        pytest.skip("no native toolchain")
    return l


def numpy_chain(frames, cy, cx, ps, flip, rot):
    f = frames[:, cy:cy + ps, cx:cx + ps]
    if flip:
        f = f[:, :, ::-1]
    f = np.rot90(f, rot, (1, 2))
    return (np.ascontiguousarray(f).astype(np.float32) / 255.0 - 0.5) * 2.0


def test_augment_pack_matches_numpy(lib):
    rng = np.random.RandomState(0)
    frames = rng.randint(0, 255, (9, 40, 56, 3), np.uint8)
    for flip in (False, True):
        for rot in range(4):
            got = native.augment_pack(frames, 3, 5, 32, flip, rot)
            want = numpy_chain(frames, 3, 5, 32, flip, rot)
            np.testing.assert_array_equal(got, want,
                                          err_msg=f"flip={flip} rot={rot}")


def test_normalize_matches(lib):
    rng = np.random.RandomState(1)
    x = rng.randint(0, 255, (3, 8, 8, 3), np.uint8)
    np.testing.assert_allclose(native.normalize(x),
                               (x.astype(np.float32) / 255 - 0.5) * 2,
                               atol=1e-7)


def test_dataset_native_vs_numpy_same_samples(tmp_path):
    import cv2, random
    from demfi_tpu.data import AdobeTrainDataset
    rng = np.random.RandomState(0)
    for s in range(1):
        (tmp_path / "train" / f"s{s}").mkdir(parents=True)
        (tmp_path / "train_blur" / f"s{s}").mkdir(parents=True)
        for i in range(60):
            cv2.imwrite(str(tmp_path / "train" / f"s{s}" / f"{i:05d}.png"),
                        rng.randint(0, 255, (48, 64, 3), np.uint8))
        for k in range(6):
            cv2.imwrite(str(tmp_path / "train_blur" / f"s{s}" /
                            f"{17 + 8 * k:05d}.png"),
                        rng.randint(0, 255, (48, 64, 3), np.uint8))
    ds_n = AdobeTrainDataset(str(tmp_path), patch_size=32, use_native=True)
    ds_p = AdobeTrainDataset(str(tmp_path), patch_size=32, use_native=False)
    if native.get_lib() is None:
        pytest.skip("no native toolchain")
    for seed in range(5):
        a = ds_n.sample(0, random.Random(seed))
        b = ds_p.sample(0, random.Random(seed))
        np.testing.assert_array_equal(a.frames, b.frames)
        np.testing.assert_array_equal(a.t_value, b.t_value)
