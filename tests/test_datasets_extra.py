"""Tests for the extra dataset adapters + transforms + inpaint pairs."""

import numpy as np
import pytest

from ddnm_tpu.data.extra_datasets import CelebADataset, LSUNDataset, celeba_crop
from ddnm_tpu.data.inpaint_pairs import InpaintPairs
from ddnm_tpu.data.io import save_image
from ddnm_tpu.data.transforms import data_transform, inverse_data_transform


def test_celeba_crop_geometry():
    img = np.zeros((218, 178, 3), np.float32)
    out = celeba_crop(img)
    assert out.shape == (128, 128, 3)


def test_celeba_dataset_with_partition(tmp_path):
    d = tmp_path / "img_align_celeba"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        save_image(rng.uniform(size=(218, 178, 3)).astype(np.float32),
                   d / f"{i:06d}.jpg")
    (tmp_path / "list_eval_partition.txt").write_text(
        "000000.jpg 0\n000001.jpg 2\n000002.jpg 2\n000003.jpg 1\n"
    )
    ds = CelebADataset(tmp_path, image_size=64, split="test")
    assert len(ds) == 2
    img, label = ds[0]
    assert img.shape == (64, 64, 3) and 0.0 <= img.min() and img.max() <= 1.0


def test_lsun_requires_lmdb(tmp_path):
    try:
        import lmdb  # noqa: F401

        pytest.skip("lmdb present; gating test not applicable")
    except ImportError:
        pass
    with pytest.raises(ImportError):
        LSUNDataset(tmp_path, "bedroom")


def test_inpaint_pairs(tmp_path):
    rng = np.random.default_rng(1)
    (tmp_path / "gts").mkdir()
    (tmp_path / "masks").mkdir()
    for i in range(3):
        save_image(rng.uniform(size=(300, 400, 3)).astype(np.float32),
                   tmp_path / "gts" / f"im{i}.png")
        m = (rng.uniform(size=(300, 400, 3)) > 0.5).astype(np.float32)
        save_image(m, tmp_path / "masks" / f"im{i}.png")
    ds = InpaintPairs(tmp_path / "gts", tmp_path / "masks", image_size=128)
    assert len(ds) == 3
    b = ds[0]
    assert b["GT"].shape == (128, 128, 3)
    assert b["GT"].min() >= -1.0 and b["GT"].max() <= 1.0
    assert set(np.unique(b["gt_keep_mask"])) <= {0.0, 1.0}
    assert b["GT_name"] == "im0.png"


def test_dequantization_transforms():
    x = np.full((2, 8, 8, 3), 0.5, np.float32)
    rng = np.random.default_rng(0)
    u = data_transform(x, rescaled=True, uniform_dequantization=True, rng=rng)
    assert abs(float(np.asarray(u).mean())) < 0.02  # still centred near 0
    g = data_transform(x, rescaled=True, gaussian_dequantization=True, rng=rng)
    assert np.asarray(g).std() > 0
    back = inverse_data_transform(data_transform(x))
    np.testing.assert_allclose(np.asarray(back), x, atol=1e-6)


def test_iterate_batches_prefetch_order(tmp_path):
    """Prefetching iterator yields identical batches in identical order."""
    from ddnm_tpu.data.datasets import FolderDataset, iterate_batches

    rng = np.random.default_rng(5)
    for i in range(7):
        save_image(rng.uniform(size=(16, 16, 3)).astype(np.float32),
                   tmp_path / f"{i}.png")
    ds = FolderDataset(tmp_path, image_size=16)
    sync = list(iterate_batches(ds, 3, prefetch=0))
    pre = list(iterate_batches(ds, 3, prefetch=2))
    assert len(sync) == len(pre) == 3
    for (a, la, va), (b, lb, vb) in zip(sync, pre):
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(la, lb)
        assert va == vb
    assert [v for _, _, v in sync] == [3, 3, 1]
