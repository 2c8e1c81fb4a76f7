"""Train-step tests: warmup (trainV1_warmup.py:204-232) and SimT (trainV2_simt.py:307-436)
on a tiny model with synthetic batches — structure, finiteness, frozen-param invariants."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simt_tpu.config import TrainConfig, ModelConfig, OptimConfig, SimTConfig
from simt_tpu.data import synthetic
from simt_tpu.models.resnet_multi import ResNetMulti
from simt_tpu.train import (
    create_simt_state,
    create_warmup_state,
    make_simt_step,
    make_warmup_step,
)

C, O = 5, 3
HW = (32, 64)


def tiny_model(openset):
    return ResNetMulti(
        num_classes=C,
        open_classes=O if openset else 0,
        openset=openset,
        layers=(1, 1, 1, 1),
        dtype=jnp.float32,
    )


def tiny_cfg(tmp_path, stage):
    cd_path = str(tmp_path / "cd.npy")
    np.save(cd_path, (np.ones(C) / C).astype(np.float32))
    return TrainConfig(
        stage=stage,
        model=ModelConfig(num_classes=C, open_classes=O, openset=stage == "simt",
                          compute_dtype="float32"),
        optim=OptimConfig(num_steps=1000),
        simt=SimTConfig(class_dist=cd_path, inner_w_steps=3),
    )


def batch(seed=0):
    b = synthetic.synthetic_batch(batch_size=1, hw=HW, num_classes=C, seed=seed)
    return {"image": jnp.asarray(b["image"]), "label": jnp.asarray(b["label"])}


@pytest.fixture(scope="module")
def warmup_setup(tmp_path_factory):
    cfg = tiny_cfg(tmp_path_factory.mktemp("w"), "warmup")
    model = tiny_model(False)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, *HW, 3)), False)
    state = create_warmup_state(model, variables, cfg)
    step = make_warmup_step(model, cfg)
    return cfg, model, state, step


def test_warmup_step_runs_and_updates(warmup_setup):
    cfg, model, state, step = warmup_setup
    new_state, metrics = step(state, batch())
    assert int(new_state.step) == 1
    for k in ["loss_seg1", "loss_seg2", "lr"]:
        assert np.isfinite(float(metrics[k])), k
    # Heads (10x) and backbone (1x incl. stem in warmup) move; BN affine frozen.
    p0, p1 = state.model.params, new_state.model.params
    assert not np.allclose(p0["layer6"]["branch0_kernel"], p1["layer6"]["branch0_kernel"])
    assert not np.allclose(p0["conv1"]["kernel"], p1["conv1"]["kernel"])
    assert np.array_equal(p0["bn1"]["scale"], p1["bn1"]["scale"])
    assert np.array_equal(p0["layer5"]["branch2_kernel"], p1["layer5"]["branch2_kernel"])
    # BN batch stats updated (train mode).
    assert not np.allclose(
        state.model.batch_stats["bn1"]["mean"], new_state.model.batch_stats["bn1"]["mean"]
    )


def test_warmup_loss_decreases_on_repeated_batch(warmup_setup):
    cfg, model, state, step = warmup_setup
    b = batch(1)
    losses = []
    for _ in range(5):
        state, metrics = step(state, b)
        losses.append(float(metrics["loss_seg2"]))
    assert losses[-1] < losses[0], losses


@pytest.fixture(scope="module")
def simt_setup(tmp_path_factory):
    cfg = tiny_cfg(tmp_path_factory.mktemp("s"), "simt")
    student = tiny_model(True)
    teacher = tiny_model(False)
    sv = student.init(jax.random.PRNGKey(0), jnp.zeros((1, *HW, 3)), False)
    tv = teacher.init(jax.random.PRNGKey(1), jnp.zeros((1, *HW, 3)), False)
    state = create_simt_state(sv, tv, cfg, jax.random.PRNGKey(2))
    step = make_simt_step(student, teacher, cfg)
    return cfg, state, step


def test_simt_step_structure(simt_setup):
    cfg, state, step = simt_setup
    new_state, metrics = step(state, batch())
    for k in ["loss", "loss_seg_p", "loss_seg_y", "convex", "volume", "anchor", "place"]:
        assert np.isfinite(float(metrics[k])), (k, float(metrics[k]))
    assert int(new_state.step) == 1

    # Teacher untouched; student heads/backbone updated; stem frozen in SimT stage.
    assert jax.tree.all(
        jax.tree.map(np.array_equal, state.teacher_params, new_state.teacher_params)
    )
    p0, p1 = state.model.params, new_state.model.params
    assert np.array_equal(p0["conv1"]["kernel"], p1["conv1"]["kernel"])  # frozen (no warmup flag)
    assert not np.allclose(p0["layer3_0"]["conv2"]["kernel"], p1["layer3_0"]["conv2"]["kernel"])
    assert not np.allclose(p0["layer6_1"]["branch0_kernel"], p1["layer6_1"]["branch0_kernel"])

    # NTMs and W matrices updated (T via main loss, W via the inner loop).
    assert not np.allclose(state.t1.param, new_state.t1.param)
    assert not np.allclose(state.w1.param, new_state.w1.param)


def test_simt_inner_loop_reduces_w_objective(simt_setup):
    """The 10-step inner loop must actually optimise MSE(W @ T, 0) (trainV2_simt.py:327-339)."""
    cfg, state, step = simt_setup
    from simt_tpu.models import ntm as ntm_lib
    from simt_tpu.ops import mse_sum

    cd = jnp.asarray(ntm_lib.load_class_dist(cfg.simt.class_dist))

    def w_obj(st):
        t1 = ntm_lib.ntm_forward(st.t1.param, cd, C, O)
        w1 = ntm_lib.w_forward(st.w1.param)
        return float(mse_sum(w1 @ t1, jnp.zeros_like(w1 @ t1)))

    before = w_obj(state)
    new_state, _ = step(state, batch())
    # Evaluate the *new* W against the *old* T (what the inner loop optimised).
    hybrid = state.replace(w1=new_state.w1)
    after = w_obj(hybrid)
    assert after < before, (before, after)


def test_simt_step_deterministic(simt_setup):
    cfg, state, step = simt_setup
    b = batch(3)
    s1, m1 = step(state, b)
    s2, m2 = step(state, b)
    assert float(m1["loss"]) == float(m2["loss"])
    assert np.array_equal(np.asarray(s1.t1.param), np.asarray(s2.t1.param))


def test_warmup_iter_size_two_identical_batches_matches_single(tmp_path):
    """iter_size accumulation (trainV1_warmup.py:212,:226-232): with two IDENTICAL
    sub-batches, grads are (g+g)/2 = g, so the post-step params must equal the
    iter_size=1 step exactly; BN stats chain through both forwards."""
    cfg1 = tiny_cfg(tmp_path, "warmup")
    cfg2 = dataclasses.replace(
        cfg1, optim=dataclasses.replace(cfg1.optim, iter_size=2)
    )
    model = tiny_model(False)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, *HW, 3)), False)
    b = batch(5)

    s1 = create_warmup_state(model, variables, cfg1)
    s1, m1 = make_warmup_step(model, cfg1)(s1, b)

    stacked = {k: jnp.stack([v, v]) for k, v in b.items()}
    s2 = create_warmup_state(model, variables, cfg2)
    s2, m2 = make_warmup_step(model, cfg2)(s2, stacked)

    jax.tree.map(
        lambda a, c: np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-6),
        s1.model.params, s2.model.params,
    )
    assert float(m1["loss_seg2"]) == pytest.approx(float(m2["loss_seg2"]), rel=1e-6)


def test_warmup_iter_size_equals_manual_grad_mean(tmp_path):
    """iter_size=2 on distinct batches (A, B) applies SGD to (g_A + g_B)/2. First-step
    SGD is linear in the gradient: p' = p - lr*(g + wd*p), so g is recoverable from the
    two single-batch steps and the accumulated step must land on the reconstruction."""
    cfg1 = tiny_cfg(tmp_path, "warmup")
    cfg2 = dataclasses.replace(
        cfg1, optim=dataclasses.replace(cfg1.optim, iter_size=2)
    )
    model = tiny_model(False)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, *HW, 3)), False)
    ba, bb = batch(6), batch(7)
    step1 = make_warmup_step(model, cfg1)

    sa, _ = step1(create_warmup_state(model, variables, cfg1), ba)
    sb, _ = step1(create_warmup_state(model, variables, cfg1), bb)
    stacked = {k: jnp.stack([ba[k], bb[k]]) for k in ba}
    s2, _ = make_warmup_step(model, cfg2)(
        create_warmup_state(model, variables, cfg2), stacked
    )

    # p_acc = p - lr*((gA+gB)/2 + wd*p) = (pA + pB)/2 for first-step SGD+momentum.
    def check(p0, pa, pb, pacc):
        np.testing.assert_allclose(
            np.asarray(pacc), (np.asarray(pa) + np.asarray(pb)) / 2.0, atol=1e-6
        )

    jax.tree.map(check, variables["params"], sa.model.params, sb.model.params,
                 s2.model.params)


def test_simt_iter_size_two_identical_batches_matches_single(tmp_path):
    """SimT iter_size accumulation (trainV2_simt.py:345,:426-436) with identical
    sub-batches: model params, T params (inner-loop quirk included) and W params all
    land exactly on the iter_size=1 result."""
    cfg1 = tiny_cfg(tmp_path, "simt")
    cfg2 = dataclasses.replace(
        cfg1, optim=dataclasses.replace(cfg1.optim, iter_size=2)
    )
    student, teacher = tiny_model(True), tiny_model(False)
    sv = student.init(jax.random.PRNGKey(0), jnp.zeros((1, *HW, 3)), False)
    tv = teacher.init(jax.random.PRNGKey(1), jnp.zeros((1, *HW, 3)), False)
    b = batch(8)

    st1 = create_simt_state(sv, tv, cfg1, jax.random.PRNGKey(2))
    st1, m1 = make_simt_step(student, teacher, cfg1)(st1, b)

    stacked = {k: jnp.stack([v, v]) for k, v in b.items()}
    st2 = create_simt_state(sv, tv, cfg2, jax.random.PRNGKey(2))
    st2, m2 = make_simt_step(student, teacher, cfg2)(st2, stacked)

    np.testing.assert_allclose(np.asarray(st1.t1.param), np.asarray(st2.t1.param),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(st1.w1.param), np.asarray(st2.w1.param),
                               atol=1e-6)
    jax.tree.map(
        lambda a, c: np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-6),
        st1.model.params, st2.model.params,
    )
    for k in ("loss", "anchor", "volume"):
        assert float(m1[k]) == pytest.approx(float(m2[k]), rel=1e-5), k
