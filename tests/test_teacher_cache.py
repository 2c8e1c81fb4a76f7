"""Teacher-posterior cache: equivalence with the per-step teacher forward."""

import jax
import jax.numpy as jnp
import numpy as np

from tests.test_train import C, HW, batch, tiny_cfg, tiny_model

from simt_tpu.train import create_simt_state, make_simt_step
from simt_tpu.train.teacher_cache import TeacherCache


def _setup(tmp_path):
    cfg = tiny_cfg(tmp_path, "simt")
    student = tiny_model(True)
    teacher = tiny_model(False)
    sv = student.init(jax.random.PRNGKey(0), jnp.zeros((1, *HW, 3)), False)
    tv = teacher.init(jax.random.PRNGKey(1), jnp.zeros((1, *HW, 3)), False)
    state = create_simt_state(sv, tv, cfg, jax.random.PRNGKey(2))
    step = make_simt_step(student, teacher, cfg)
    return cfg, teacher, tv, state, step


def test_cached_step_matches_uncached(tmp_path):
    cfg, teacher, tv, state, step = _setup(tmp_path)
    cache = TeacherCache(teacher, tv["params"], tv["batch_stats"],
                         store_dtype=np.float32)  # exact storage for the test
    b = batch(0)
    named = {**b, "name": ["img0"], "mirror": [False]}

    _, m_plain = step(state, b)
    _, m_cached = step(state, cache.attach(named))
    assert cache.misses == 1
    for k in ["loss", "loss_seg_p", "loss_seg_y", "anchor", "place"]:
        assert abs(float(m_plain[k]) - float(m_cached[k])) < 1e-5, k

    # Second epoch: cache hit, no teacher forward, identical metrics.
    _, m_hit = step(state, cache.attach(named))
    assert cache.hits == 1
    assert float(m_hit["loss"]) == float(m_cached["loss"])


def test_cache_distinguishes_mirror(tmp_path):
    cfg, teacher, tv, state, step = _setup(tmp_path)
    cache = TeacherCache(teacher, tv["params"], tv["batch_stats"])
    b = batch(1)
    cache.attach({**b, "name": ["x"], "mirror": [False]})
    cache.attach({**b, "name": ["x"], "mirror": [True]})
    assert cache.misses == 2  # separate entries per mirror flag


def test_loader_emits_mirror_flag(tmp_path):
    from simt_tpu.config import IMG_MEAN_BGR
    from simt_tpu.data import Loader, SegDataset, synthetic

    paths = synthetic.make_cityscapes_fixture(str(tmp_path), n_train=2, image_wh=(32, 16))
    ds = SegDataset.cityscapes_pseudo(paths["root"], paths["pseudo_lst"],
                                      crop_wh=(16, 8), mean_bgr=IMG_MEAN_BGR, mirror=True)
    b = next(iter(Loader(ds, batch_size=2, seed=0, num_workers=1)))
    assert "mirror" in b and len(b["mirror"]) == 2
