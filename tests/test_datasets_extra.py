"""Tests for the extra dataset adapters + transforms + inpaint pairs."""

from pathlib import Path

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


def test_lsun_requires_lmdb(tmp_path, monkeypatch):
    import importlib.util
    import sys

    # tests/_reference may have installed a spec-less stub module: remove
    # it FIRST (find_spec raises on spec-less sys.modules entries), so both
    # the probe and the gating path under test see reality
    monkeypatch.delitem(sys.modules, "lmdb", raising=False)
    if importlib.util.find_spec("lmdb") is not None:
        pytest.skip("real lmdb present; gating test not applicable")
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


def test_data_transform_rescaled_precedence():
    """rescaled wins over logit_transform (reference if/elif,
    datasets/__init__.py:207-210)."""
    import jax.numpy as jnp

    from ddnm_tpu.data.transforms import data_transform

    x = jnp.asarray(np.linspace(0.1, 0.9, 5, dtype=np.float32))
    both = data_transform(x, rescaled=True, logit_transform=True)
    np.testing.assert_allclose(np.asarray(both), 2 * np.asarray(x) - 1, atol=1e-6)


def test_center_crop_arr_matches_reference():
    """Our center_crop_arr reproduces the reference's exactly (transcription
    oracle of datasets/__init__.py:29-44 — the real module can't import in
    this environment because its top-level torchvision import is stubbed)."""
    from PIL import Image

    from ddnm_tpu.data.datasets import center_crop_arr

    def ref_center_crop_arr(pil_image, image_size):  # datasets/__init__.py:29-44
        while min(*pil_image.size) >= 2 * image_size:
            pil_image = pil_image.resize(
                tuple(x // 2 for x in pil_image.size), resample=Image.BOX
            )
        scale = image_size / min(*pil_image.size)
        pil_image = pil_image.resize(
            tuple(round(x * scale) for x in pil_image.size),
            resample=Image.BICUBIC,
        )
        arr = np.array(pil_image)
        crop_y = (arr.shape[0] - image_size) // 2
        crop_x = (arr.shape[1] - image_size) // 2
        return arr[crop_y: crop_y + image_size, crop_x: crop_x + image_size]

    rng = np.random.default_rng(1)
    for shape in [(600, 430), (260, 300), (128, 500)]:
        img = Image.fromarray(
            rng.integers(0, 255, shape + (3,), dtype=np.uint8), "RGB")
        ours = np.asarray(center_crop_arr(img, 128))
        theirs = ref_center_crop_arr(img, 128)
        np.testing.assert_array_equal(ours, theirs)


def test_get_dataset_ood_unshuffled(tmp_path):
    """out_of_dist folders keep sorted order (no seed-2019 shuffle)."""
    from ddnm_tpu.data.datasets import get_dataset
    from ddnm_tpu.data.io import save_image

    rng = np.random.default_rng(0)
    for i in range(6):
        save_image(rng.uniform(size=(32, 32, 3)).astype(np.float32),
                   tmp_path / f"{i}.png")
    ood = get_dataset("CelebA_HQ", root=tmp_path, image_size=32,
                      out_of_dist=True)
    assert [p.name for p in ood.paths] == [f"{i}.png" for i in range(6)]
    shuffled = get_dataset("CelebA_HQ", root=tmp_path, image_size=32)
    assert [p.name for p in shuffled.paths] != [f"{i}.png" for i in range(6)]


def test_natural_fixture_family_deterministic():
    """The committed naturalistic fixtures (exp/datasets/natural64 —
    VERDICT r2 item #7 stand-ins for the reference's real photos) must
    regenerate bit-identically from their seeds, and carry naturalistic
    statistics: a steep power-law spectrum (natural images ~1/f^2) rather
    than the flat-background blob family's."""
    import sys

    import numpy as np
    from PIL import Image

    repo = Path(__file__).resolve().parents[1]
    sys.path.insert(0, str(repo / "tools/experiments"))
    import jax

    from natural_family import make_naturals

    fix_dir = repo / "exp/datasets/natural64"
    gt = np.asarray(make_naturals(jax.random.PRNGKey(1234), 8, 64))
    for i in range(8):
        committed = np.asarray(Image.open(fix_dir / f"{i:05d}.png"))
        regen = np.clip((gt[i] + 1) / 2, 0, 1)
        regen = (regen * 255).round().astype(np.uint8)
        # identical quantisation path as data/io.save_image
        assert np.abs(committed.astype(int) - regen.astype(int)).max() <= 1, i

    # spectral slope: radially-averaged power must fall >= ~2 decades from
    # the lowest to the highest frequency octave (1/f^alpha, alpha ~ 2)
    luma = gt.mean(-1)
    spec = np.abs(np.fft.rfft2(luma, axes=(1, 2))) ** 2
    f = np.sqrt(np.fft.fftfreq(64)[:, None] ** 2
                + np.fft.rfftfreq(64)[None, :] ** 2)
    low = spec[:, (f > 0.01) & (f < 0.06)].mean()
    high = spec[:, f > 0.35].mean()
    assert low / high > 100.0, (low, high)

    # the scratch mask regenerates too
    from natural_family import make_oldphoto_inputs

    _, keep = make_oldphoto_inputs(jax.random.PRNGKey(77), 1, 64)
    committed_mask = np.load(fix_dir / "scratch_keep_mask.npy")
    assert np.array_equal(np.asarray(keep[0]), committed_mask)
    frac = committed_mask.mean()
    assert 0.75 < frac < 0.95, frac  # mostly-kept, scratch-like damage
