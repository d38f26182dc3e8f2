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


def test_celeba_targets_and_attr_mapping(tmp_path):
    """attr/identity/bbox/landmark parsing replicates reference
    celeba.py:85-110: count+header lines skipped on the header files,
    attr {-1,1} -> {0,1}, all tables masked by the partition split so row
    order stays aligned with the filename order."""
    d = tmp_path / "img_align_celeba"
    d.mkdir()
    rng = np.random.default_rng(0)
    names = [f"{i:06d}.jpg" for i in range(4)]
    for n in names:
        save_image(rng.uniform(size=(218, 178, 3)).astype(np.float32), d / n)
    (tmp_path / "list_eval_partition.txt").write_text(
        "000000.jpg 0\n000001.jpg 2\n000002.jpg 2\n000003.jpg 1\n")
    (tmp_path / "list_attr_celeba.txt").write_text(
        "4\nSmiling Young\n"
        "000000.jpg -1 1\n000001.jpg 1 -1\n000002.jpg -1 -1\n000003.jpg 1 1\n")
    (tmp_path / "identity_CelebA.txt").write_text(
        "000000.jpg 11\n000001.jpg 22\n000002.jpg 33\n000003.jpg 44\n")
    (tmp_path / "list_bbox_celeba.txt").write_text(
        "4\nimage_id x_1 y_1 width height\n"
        + "".join(f"{n} {i} {i+1} 10 20\n" for i, n in enumerate(names)))
    (tmp_path / "list_landmarks_align_celeba.txt").write_text(
        "4\nlefteye_x lefteye_y righteye_x righteye_y nose_x nose_y "
        "leftmouth_x leftmouth_y rightmouth_x rightmouth_y\n"
        + "".join(f"{n} " + " ".join(str(i * 10 + j) for j in range(10))
                  + "\n" for i, n in enumerate(names)))

    ds = CelebADataset(tmp_path, image_size=32, split="test",
                       target_type=["attr", "identity", "bbox", "landmarks"])
    assert len(ds) == 2  # 000001 + 000002
    assert ds.attr_names == ["Smiling", "Young"]
    img, (attr, ident, bbox, lm) = ds[0]
    assert img.shape == (32, 32, 3)
    np.testing.assert_array_equal(attr, [1, 0])  # {-1,1} -> {0,1}
    assert int(ident[0]) == 22
    np.testing.assert_array_equal(bbox, [1, 2, 10, 20])
    assert lm.shape == (10,) and int(lm[0]) == 10
    _, (attr2, ident2, *_rest) = ds[1]
    np.testing.assert_array_equal(attr2, [0, 0])
    assert int(ident2[0]) == 33

    # single str target_type returns the bare target, not a tuple
    ds_one = CelebADataset(tmp_path, image_size=32, split="test",
                           target_type="identity")
    _, t = ds_one[0]
    assert int(t[0]) == 22

    with pytest.raises(ValueError, match="target_type"):
        CelebADataset(tmp_path, target_type="bogus")
    with pytest.raises(ValueError, match="split"):
        CelebADataset(tmp_path, split="bogus")


def _png_bytes(color):
    import io as _io

    from PIL import Image

    buf = _io.BytesIO()
    Image.new("RGB", (8, 8), color).save(buf, format="PNG")
    return buf.getvalue()


def _install_fake_lmdb(monkeypatch, dbs):
    """Install an in-memory stand-in for the lmdb package (absent in this
    image) exposing exactly the API surface LSUNDataset uses: open ->
    env.begin() -> txn.{stat, cursor, get}. `dbs` maps lmdb dirNAME ->
    ordered {key_bytes: png_bytes}."""
    import sys
    import types

    class _Txn:
        def __init__(self, store):
            self._s = store

        def stat(self):
            return {"entries": len(self._s)}

        def cursor(self):
            return iter(self._s.items())

        def get(self, k):
            return self._s[k]

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    class _Env:
        def __init__(self, store):
            self._s = store

        def begin(self, write=False):
            return _Txn(self._s)

    mod = types.ModuleType("lmdb")

    def _open(path, **kw):
        name = Path(path).name
        if name not in dbs:
            raise FileNotFoundError(path)
        return _Env(dbs[name])

    mod.open = _open
    monkeypatch.setitem(sys.modules, "lmdb", mod)


def test_lsun_key_cache(tmp_path, monkeypatch):
    """Keys are enumerated once and pickled to _cache_<dirname> next to the
    lmdb dir (reference lsun.py:29-36); a later open trusts the cache."""
    import pickle

    from ddnm_tpu.data.extra_datasets import LSUNDataset

    store = {f"k{i}".encode(): _png_bytes((i * 40, 0, 0)) for i in range(3)}
    _install_fake_lmdb(monkeypatch, {"bedroom_val_lmdb": store})

    ds = LSUNDataset(tmp_path, "bedroom", "val", image_size=8)
    assert len(ds) == 3
    cache = tmp_path / "_cache_bedroom_val_lmdb"
    assert cache.is_file()
    assert pickle.loads(cache.read_bytes()) == list(store)
    img, label = ds[1]
    assert img.shape == (8, 8, 3) and label == 0
    assert abs(img[0, 0, 0] * 255 - 40) < 2

    # a pre-existing cache wins over re-enumeration (order proof)
    cache.write_bytes(pickle.dumps(list(reversed(list(store)))))
    ds2 = LSUNDataset(tmp_path, "bedroom", "val", image_size=8)
    assert ds2.keys == list(reversed(list(store)))
    img2, _ = ds2[0]
    assert abs(img2[0, 0, 0] * 255 - 80) < 2  # k2's color now first

    # use_key_cache=False ignores and does not rewrite the cache
    ds3 = LSUNDataset(tmp_path, "bedroom", "val", image_size=8,
                      use_key_cache=False)
    assert ds3.keys == list(store)


def test_lsun_multi_concat(tmp_path, monkeypatch):
    """Multi-category concat + index routing (reference lsun.py:60-176):
    item index maps to (owning db, local index); target = category index."""
    from ddnm_tpu.data.extra_datasets import LSUNMulti

    dbs = {
        "bedroom_train_lmdb": {f"a{i}".encode(): _png_bytes((10, 0, 0))
                               for i in range(2)},
        "church_outdoor_train_lmdb": {f"b{i}".encode(): _png_bytes((0, 10, 0))
                                      for i in range(3)},
    }
    _install_fake_lmdb(monkeypatch, dbs)

    ds = LSUNMulti(tmp_path, ["bedroom_train", "church_outdoor_train"],
                   image_size=8)
    assert len(ds) == 5
    assert ds.indices == [2, 5]
    img0, t0 = ds[0]
    img4, t4 = ds[4]
    assert (t0, t4) == (0, 1)
    assert img0[0, 0, 0] > img0[0, 0, 1]  # red from bedroom db
    assert img4[0, 0, 1] > img4[0, 0, 0]  # green from church db
    img2, t2 = ds[2]  # first church item (boundary routing)
    assert t2 == 1 and img2[0, 0, 1] > img2[0, 0, 0]


def test_lsun_classes_validation():
    """String splits expand per reference lsun.py:96-146; bad categories
    and splits raise."""
    from ddnm_tpu.data.extra_datasets import (
        LSUN_CATEGORIES,
        _verify_lsun_classes,
    )

    assert _verify_lsun_classes("test") == ["test"]
    train = _verify_lsun_classes("train")
    assert len(train) == len(LSUN_CATEGORIES) == 11
    assert train[0] == "bedroom_train"
    assert _verify_lsun_classes(["cat_val"]) == ["cat_val"]
    assert _verify_lsun_classes(["church_outdoor_val"]) == ["church_outdoor_val"]
    with pytest.raises(ValueError, match="LSUN class"):
        _verify_lsun_classes(["office_train"])
    with pytest.raises(ValueError, match="postfix"):
        _verify_lsun_classes(["bedroom_dev"])
    with pytest.raises(ValueError, match="Unknown value"):
        _verify_lsun_classes("dev")
    with pytest.raises(ValueError, match="type"):
        _verify_lsun_classes([3])


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
