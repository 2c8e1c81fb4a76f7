"""Data pipeline tests on synthetic fixtures (SURVEY.md §4)."""

import numpy as np
import pytest

from simt_tpu.config import IMG_MEAN_BGR
from simt_tpu.data import Loader, SegDataset, synthetic
from simt_tpu.data.pipeline import load_image_bgr, normalize_image, remap_gta5_ids


@pytest.fixture(scope="module")
def fixture_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("cityscapes")
    paths = synthetic.make_cityscapes_fixture(str(root), n_train=5, n_val=2,
                                              image_wh=(64, 32))
    return paths


def test_pseudo_dataset_shapes(fixture_root):
    ds = SegDataset.cityscapes_pseudo(
        fixture_root["root"], fixture_root["pseudo_lst"], crop_wh=(32, 16),
        mean_bgr=IMG_MEAN_BGR,
    )
    assert len(ds) == 5
    item = ds.get(0)
    assert item["image"].shape == (16, 32, 3)  # NHWC (h, w)
    assert item["image"].dtype == np.uint8  # wire format; mean-sub is on-device
    assert item["label"].shape == (16, 32)
    assert item["label"].dtype == np.uint8  # wire format; int32 cast is on-device


def test_preprocessing_matches_reference_semantics(fixture_root, tmp_path):
    """Host uint8 wire format + device-side normalize compose to the reference's
    math exactly (resize -> uint8 -> float32 -> BGR -> mean-sub,
    cityscapes_dataset.py:100,105,117-118)."""
    from PIL import Image

    ds = SegDataset.cityscapes_pseudo(
        fixture_root["root"], fixture_root["pseudo_lst"], crop_wh=(32, 16),
        mean_bgr=IMG_MEAN_BGR,
    )
    s = ds.samples[0]
    img = Image.open(s.image_path).convert("RGB").resize((32, 16), Image.BICUBIC)
    arr = np.asarray(img, np.float32)[:, :, ::-1] - np.asarray(IMG_MEAN_BGR, np.float32)
    wire = ds.get(0)["image"]
    assert wire.dtype == np.uint8
    got = np.asarray(normalize_image(wire, IMG_MEAN_BGR))
    np.testing.assert_allclose(got, arr, atol=1e-5)

    # The f32 host-side helper (used by offline tools) matches the same math.
    full = load_image_bgr(s.image_path, (32, 16), IMG_MEAN_BGR)
    np.testing.assert_allclose(full, arr, atol=1e-5)


def test_mirror_only_flips_width(fixture_root):
    ds = SegDataset.cityscapes_pseudo(
        fixture_root["root"], fixture_root["pseudo_lst"], crop_wh=(32, 16),
        mean_bgr=IMG_MEAN_BGR, mirror=True,
    )
    base = ds.get(0, rng=None)
    # Find a seed that flips (rng.integers(2)==1).
    rng = np.random.default_rng(1)
    flipped = ds.get(0, rng=rng)
    same = np.allclose(flipped["image"], base["image"])
    mirrored = np.allclose(flipped["image"], base["image"][:, ::-1])
    assert same or mirrored
    if mirrored:
        np.testing.assert_array_equal(flipped["label"], base["label"][:, ::-1])


def test_gta5_remap():
    lab = np.array([[7, 8, 0], [33, 34, 255]], dtype=np.int32)
    out = remap_gta5_ids(lab)
    np.testing.assert_array_equal(out, [[0, 1, 255], [18, 255, 255]])


def test_loader_batches_and_reshuffles(fixture_root):
    ds = SegDataset.cityscapes_pseudo(
        fixture_root["root"], fixture_root["pseudo_lst"], crop_wh=(32, 16),
        mean_bgr=IMG_MEAN_BGR,
    )
    loader = Loader(ds, batch_size=2, seed=0, num_workers=2, loop=True)
    it = iter(loader)
    batches = [next(it) for _ in range(6)]
    assert batches[0]["image"].shape == (2, 16, 32, 3)
    assert batches[0]["label"].shape == (2, 16, 32)
    names = [n for b in batches for n in b["name"]]
    # 12 draws over 5 samples -> every sample seen at least once (epoch-free repeat).
    assert len(set(names)) == 5


def test_loader_deterministic_given_seed(fixture_root):
    ds = SegDataset.cityscapes_pseudo(
        fixture_root["root"], fixture_root["pseudo_lst"], crop_wh=(32, 16),
        mean_bgr=IMG_MEAN_BGR, mirror=True,
    )

    def first_names(seed):
        loader = Loader(ds, batch_size=2, seed=seed, num_workers=2)
        it = iter(loader)
        out = [tuple(next(it)["name"]) for _ in range(3)]
        return out

    assert first_names(7) == first_names(7)
    assert first_names(7) != first_names(8)


def test_eval_dataset_image_only(fixture_root):
    ds = SegDataset.cityscapes_eval(
        fixture_root["root"], fixture_root["val_txt"], crop_wh=(64, 32),
        mean_bgr=IMG_MEAN_BGR, split="val",
    )
    item = ds.get(0)
    assert "label" not in item
    assert item["image"].shape == (32, 64, 3)


def test_process_workers_match_threads(fixture_root):
    """Spawned-process decode (the production path) yields byte-identical batches
    and the same deterministic order as the thread pool."""
    def batches(process_workers):
        ds = SegDataset.cityscapes_pseudo(
            fixture_root["root"], fixture_root["pseudo_lst"], crop_wh=(32, 16),
            mean_bgr=IMG_MEAN_BGR, mirror=True,
        )
        loader = Loader(ds, batch_size=2, seed=3, num_workers=2,
                        process_workers=process_workers)
        it = iter(loader)
        out = [next(it) for _ in range(2)]
        it.close()
        return out

    bt = batches(False)
    bp = batches(True)
    for a, b in zip(bt, bp):
        assert a["name"] == b["name"]
        np.testing.assert_array_equal(a["image"], b["image"])
        np.testing.assert_array_equal(a["label"], b["label"])


def test_crop_cache_bit_identical(fixture_root, tmp_path):
    """CropCache path (cold + warm) must be bit-identical to direct decode, incl.
    the mirror (a post-resize width flip, so flipping the cached crop is exact)."""
    kw = dict(crop_wh=(32, 16), mean_bgr=IMG_MEAN_BGR, mirror=True)
    plain = SegDataset.cityscapes_pseudo(
        fixture_root["root"], fixture_root["pseudo_lst"], **kw)
    cached = SegDataset.cityscapes_pseudo(
        fixture_root["root"], fixture_root["pseudo_lst"],
        cache_dir=str(tmp_path / "crop_cache"), **kw)

    for pass_no in range(2):  # pass 0 populates, pass 1 reads the cache
        for i in range(len(plain)):
            for seed in (0, 1, 7):  # cover both mirror outcomes
                rng_a = np.random.default_rng(seed)
                rng_b = np.random.default_rng(seed)
                a = plain.get(i, rng_a)
                b = cached.get(i, rng_b)
                assert a["mirror"] == b["mirror"]
                np.testing.assert_array_equal(a["image"], b["image"])
                np.testing.assert_array_equal(a["label"], b["label"])
    # The cache actually has entries (both kinds).
    import glob
    files = glob.glob(str(tmp_path / "crop_cache" / "*.npy"))
    assert len(files) == 2 * len(plain), files


def test_crop_cache_gta5_remap_applied(tmp_path):
    """GTA5 id remap happens pre-cache; cached labels are trainids."""
    from PIL import Image

    root = tmp_path / "gta"
    (root / "images").mkdir(parents=True)
    (root / "labels").mkdir()
    img = np.random.default_rng(0).integers(0, 256, (16, 32, 3), np.uint8)
    lab = np.full((16, 32), 7, np.uint8)  # GTA5 id 7 -> trainid 0 (road)
    Image.fromarray(img).save(root / "images" / "a.png")
    Image.fromarray(lab, mode="L").save(root / "labels" / "a.png")
    lst = root / "train.txt"
    lst.write_text("a.png\n")
    ds = SegDataset.gta5(str(root), str(lst), crop_wh=(32, 16),
                         mean_bgr=IMG_MEAN_BGR, cache_dir=str(tmp_path / "cc"))
    for _ in range(2):  # decode pass + cache pass
        item = ds.get(0)
        assert (item["label"] == 0).all()
