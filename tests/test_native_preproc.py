"""Native C++ preprocessing parity vs Pillow (the reference's decode path,
dataset/cityscapes_dataset.py:100-118). Skipped if the toolchain can't build it."""

import numpy as np
import pytest

native = pytest.importorskip("simt_tpu.data._native_preproc")
try:
    native.load()
except Exception as e:  # pragma: no cover
    pytest.skip(f"native build unavailable: {e}", allow_module_level=True)

from PIL import Image


@pytest.mark.parametrize(
    "src_hw,dst_hw",
    [
        ((1024, 2048), (512, 1024)),  # pseudo-label production geometry
        ((37, 53), (16, 24)),
        ((16, 24), (37, 53)),
        ((50, 50), (50, 50)),
    ],
)
def test_bicubic_bit_exact(src_hw, dst_hw):
    rng = np.random.RandomState(0)
    src = rng.randint(0, 256, (*src_hw, 3), dtype=np.uint8)
    pil = np.asarray(Image.fromarray(src).resize((dst_hw[1], dst_hw[0]), Image.BICUBIC))
    got = native.resize_bicubic(src, *dst_hw)
    np.testing.assert_array_equal(got, pil)


@pytest.mark.parametrize(
    "src_hw,dst_hw",
    [
        ((1024, 2048), (512, 1024)),  # the only label resizes that occur in training
        ((1052, 1914), (512, 1024)),  # GTA5 label geometry
        ((64, 128), (16, 32)),
    ],
)
def test_nearest_bit_exact_at_production_sizes(src_hw, dst_hw):
    rng = np.random.RandomState(1)
    src = rng.randint(0, 34, src_hw).astype(np.uint8)
    pil = np.asarray(Image.fromarray(src).resize((dst_hw[1], dst_hw[0]), Image.NEAREST))
    got = native.resize_nearest(src, *dst_hw)
    np.testing.assert_array_equal(got, pil)


def test_fused_preprocess_matches_pil_path():
    rng = np.random.RandomState(2)
    src = rng.randint(0, 256, (64, 96, 3), dtype=np.uint8)
    mean = (104.00698793, 116.66876762, 122.67891434)
    for mirror in [False, True]:
        got = native.preprocess_image(src, 32, 48, mean, mirror=mirror)
        ref = np.asarray(
            Image.fromarray(src).resize((48, 32), Image.BICUBIC), np.float32
        )
        if mirror:
            ref = ref[:, ::-1]
        ref = ref[:, :, ::-1] - np.asarray(mean, np.float32)
        np.testing.assert_allclose(got, ref, atol=1e-5)


def test_pipeline_native_vs_pil_identical(tmp_path):
    """SegDataset output must be identical with the native path on and off."""
    from simt_tpu.data import pipeline
    from simt_tpu.data import synthetic
    from simt_tpu.data.pipeline import SegDataset
    from simt_tpu.config import IMG_MEAN_BGR

    paths = synthetic.make_cityscapes_fixture(str(tmp_path), n_train=2, image_wh=(64, 32))
    ds = SegDataset.cityscapes_pseudo(paths["root"], paths["pseudo_lst"],
                                      crop_wh=(32, 16), mean_bgr=IMG_MEAN_BGR)
    old = pipeline.USE_NATIVE
    try:
        pipeline.USE_NATIVE = True
        a = ds.get(0)
        pipeline.USE_NATIVE = False
        b = ds.get(0)
    finally:
        pipeline.USE_NATIVE = old
    np.testing.assert_allclose(a["image"], b["image"], atol=1e-5)
    np.testing.assert_array_equal(a["label"], b["label"])
