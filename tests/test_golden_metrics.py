"""Golden-trace regression test.

The reference's only regression artifacts are its run logs (SURVEY.md §4); this is our
equivalent with fixed seeds: a 5-step SimT trace on CPU float32 whose loss components
must stay bit-stable (to float tolerance) across refactors. Regenerate the constants
only for *intentional* semantic changes (see git history of this file).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simt_tpu.config import TrainConfig, ModelConfig, OptimConfig, SimTConfig
from simt_tpu.data import synthetic
from simt_tpu.models.resnet_multi import ResNetMulti
from simt_tpu.train import create_simt_state, make_simt_step

GOLDEN = [
    dict(anchor=3.588634, convex=-4.672327, loss=2.146873, loss_seg_y=3.240833,
         volume=-2.757841),
    dict(anchor=3.584829, convex=-4.658358, loss=2.138519, loss_seg_y=3.238977,
         volume=-2.762063),
    dict(anchor=3.581013, convex=-4.644467, loss=2.128992, loss_seg_y=3.235854,
         volume=-2.766279),
    dict(anchor=3.577207, convex=-4.630659, loss=2.118952, loss_seg_y=3.232123,
         volume=-2.77049),
    dict(anchor=3.573059, convex=-4.616932, loss=2.108563, loss_seg_y=3.228317,
         volume=-2.774695),
]


def test_simt_five_step_golden_trace(tmp_path):
    np.random.seed(0)
    c, o, hw = 5, 3, (32, 64)
    cd = str(tmp_path / "cd.npy")
    np.save(cd, (np.ones(c) / c).astype(np.float32))
    cfg = TrainConfig(
        model=ModelConfig(num_classes=c, open_classes=o, openset=True,
                          compute_dtype="float32"),
        optim=OptimConfig(num_steps=1000),
        simt=dataclasses.replace(SimTConfig(), class_dist=cd, inner_w_steps=3),
    )
    student = ResNetMulti(num_classes=c, open_classes=o, openset=True,
                          layers=(1, 1, 1, 1), dtype=jnp.float32)
    teacher = ResNetMulti(num_classes=c, layers=(1, 1, 1, 1), dtype=jnp.float32)
    sv = student.init(jax.random.PRNGKey(0), jnp.zeros((1, *hw, 3)), False)
    tv = teacher.init(jax.random.PRNGKey(1), jnp.zeros((1, *hw, 3)), False)
    state = create_simt_state(sv, tv, cfg, jax.random.PRNGKey(2))
    step = make_simt_step(student, teacher, cfg)
    b = synthetic.synthetic_batch(1, hw, c, seed=0)
    batch = {"image": jnp.asarray(b["image"]), "label": jnp.asarray(b["label"])}

    for want in GOLDEN:
        state, m = step(state, batch)
        for k, v in want.items():
            got = float(m[k])
            assert got == pytest.approx(v, rel=2e-3, abs=2e-4), (k, got, v)
