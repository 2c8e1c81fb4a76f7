"""Multi-device sharding tests on the 8-device CPU mesh (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simt_tpu.parallel import batch_sharding, make_mesh, replicate_state, shard_batch


def test_mesh_shapes():
    mesh = make_mesh(spatial=2)
    assert mesh.devices.shape == (4, 2)
    mesh = make_mesh(data=2, spatial=4)
    assert mesh.devices.shape == (2, 4)


def test_sharded_forward_matches_single_device(tiny_setup=None):
    """DP+spatial sharded forward must equal the unsharded result (GSPMD halo check)."""
    from simt_tpu.models.resnet_multi import ResNetMulti

    model = ResNetMulti(num_classes=7, layers=(1, 1, 1, 1), dtype=jnp.float32)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 64, 64, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, False)

    fwd = jax.jit(lambda v, x: model.apply(v, x, False)[1])
    want = np.asarray(fwd(variables, x))

    mesh = make_mesh(data=2, spatial=4)
    xs = jax.device_put(x, batch_sharding(mesh))
    vs = replicate_state(variables, mesh)
    got = np.asarray(fwd(vs, xs))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_sharded_simt_train_step(tmp_path):
    """The FULL SimT train step under a (2,4) mesh — compiles, runs, stays finite,
    and matches the single-device step numerically."""
    import tests.test_train as tt

    cfg = tt.tiny_cfg(tmp_path, "simt")
    student = tt.tiny_model(True)
    teacher = tt.tiny_model(False)
    from simt_tpu.train import create_simt_state, make_simt_step

    sv = student.init(jax.random.PRNGKey(0), jnp.zeros((1, *tt.HW, 3)), False)
    tv = teacher.init(jax.random.PRNGKey(1), jnp.zeros((1, *tt.HW, 3)), False)
    state = create_simt_state(sv, tv, cfg, jax.random.PRNGKey(2))
    step = make_simt_step(student, teacher, cfg)

    from simt_tpu.data import synthetic

    raw = synthetic.synthetic_batch(batch_size=2, hw=tt.HW, num_classes=tt.C, seed=0)
    batch = {"image": jnp.asarray(raw["image"]), "label": jnp.asarray(raw["label"])}

    _, m_single = step(state, batch)

    mesh = make_mesh(data=2, spatial=4)
    st_sharded = replicate_state(state, mesh)
    batch_sharded = shard_batch(batch, mesh)
    new_state, m_sharded = step(st_sharded, batch_sharded)

    for k in ["loss", "loss_seg_p", "volume", "anchor"]:
        a, b = float(m_single[k]), float(m_sharded[k])
        assert np.isfinite(b), k
        assert abs(a - b) < 1e-3 * max(1.0, abs(a)), (k, a, b)
    assert int(new_state.step) == 1

    # Pure spatial sharding (1x8): batch-1 training sharded over image height only —
    # the configuration a single-image-per-step reference run would scale with.
    mesh_sp = make_mesh(data=1, spatial=8)
    raw1 = synthetic.synthetic_batch(batch_size=1, hw=tt.HW, num_classes=tt.C, seed=1)
    batch1 = shard_batch(
        {"image": jnp.asarray(raw1["image"]), "label": jnp.asarray(raw1["label"])},
        mesh_sp,
    )
    _, m1s = step(state, batch1)
    _, m1 = step(state, {"image": jnp.asarray(raw1["image"]),
                         "label": jnp.asarray(raw1["label"])})
    assert abs(float(m1s["loss"]) - float(m1["loss"])) < 1e-3 * max(
        1.0, abs(float(m1["loss"]))
    )


def test_loop_level_mesh_training_matches_single_device(tmp_path):
    """MeshConfig is consumed by the PRODUCT path: train/loop.py builds the mesh,
    replicates the state and shards every batch. Loss trace over 3 steps must match
    the single-device run (BN batch stats are global across shards, so a (2,2) mesh
    on batch 2 is numerically the same computation)."""
    import dataclasses

    import tests.test_train as tt
    from simt_tpu.config import MeshConfig
    from simt_tpu.data import synthetic
    from simt_tpu.train.loop import train

    def batches():
        while True:
            raw = synthetic.synthetic_batch(batch_size=2, hw=tt.HW,
                                            num_classes=tt.C, seed=11)
            yield {"image": jnp.asarray(raw["image"]),
                   "label": jnp.asarray(raw["label"])}

    base = tt.tiny_cfg(tmp_path, "simt").replace(
        snapshot_dir="", num_steps_stop=3, log_every=1
    )
    base = base.replace(
        data=dataclasses.replace(base.data, batch_size=2)
    )

    def parse(line):
        """'iter = ...' -> {metric: float} (the exact reference print format)."""
        import re

        pat = (r"loss_seg_p = (\S+) loss_seg_y = (\S+) Convex = (\S+) "
               r"Volume = (\S+) Anchor = (\S+) Place_loss = (\S+)")
        m = re.search(pat, line)
        assert m, line
        keys = ("loss_seg_p", "loss_seg_y", "convex", "volume", "anchor", "place")
        return dict(zip(keys, map(float, m.groups())))

    lines_single = []
    train(base, batch_iter=batches(), eval_fn=None,
          print_fn=lines_single.append, max_steps=3)
    steps_single = [parse(l) for l in lines_single if l.startswith("iter =")]
    assert len(steps_single) == 3

    for mesh_cfg in (MeshConfig(data_axis=2, spatial_axis=2),
                     MeshConfig(data_axis=1, spatial_axis=8)):
        lines_mesh = []
        train(base.replace(mesh=mesh_cfg), batch_iter=batches(), eval_fn=None,
              print_fn=lines_mesh.append, max_steps=3)
        tag = f"mesh: data={mesh_cfg.data_axis} spatial={mesh_cfg.spatial_axis}"
        assert any(tag in l for l in lines_mesh), tag
        steps_mesh = [parse(l) for l in lines_mesh if l.startswith("iter =")]
        assert len(steps_mesh) == 3
        # First-step line must match exactly-to-print (same state, same batch).
        assert [l for l in lines_single if l.startswith("iter =")][0] == \
               [l for l in lines_mesh if l.startswith("iter =")][0]
        # Every step: ALL continuous metrics track tightly. The anchor loss is
        # argmax-discontinuous — a last-ulp conv difference between sharded and
        # unsharded reduction orders can select a different anchor pixel (inherent
        # to cross-device reductions, not a wiring bug; see docs/PARITY.md
        # "sharded-anchor tie-break") — so anchor gets a loose sanity bound only.
        for i, (a, b) in enumerate(zip(steps_single, steps_mesh)):
            for k in ("loss_seg_p", "loss_seg_y", "convex", "volume", "place"):
                assert abs(a[k] - b[k]) < 5e-3 * max(1.0, abs(a[k])), \
                    (mesh_cfg, i, k, a[k], b[k])
            assert abs(a["anchor"] - b["anchor"]) < 0.5 * max(1.0, abs(a["anchor"])), \
                (mesh_cfg, i, a["anchor"], b["anchor"])


def test_sharded_deeplabv3_warmup_step(tmp_path):
    """The v3 warmup step (single full-res output, trainable BN) under a (2,4) mesh
    matches single-device: global batch statistics and the in-model half-pixel
    upsample must shard cleanly alongside the conv halos."""
    import dataclasses

    import tests.test_train as tt
    from simt_tpu.data import synthetic
    from simt_tpu.models import DeepLabv3
    from simt_tpu.train import create_warmup_state, make_warmup_step

    cfg = tt.tiny_cfg(tmp_path, "warmup")
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, arch="deeplabv3", open_classes=0,
                                       openset=False)
    )
    model = DeepLabv3(num_classes=tt.C, dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, *tt.HW, 3)), False)
    state = create_warmup_state(model, variables, cfg)
    step = make_warmup_step(model, cfg)

    raw = synthetic.synthetic_batch(batch_size=2, hw=tt.HW, num_classes=tt.C, seed=3)
    batch = {"image": jnp.asarray(raw["image"]), "label": jnp.asarray(raw["label"])}
    _, m_single = step(state, batch)

    mesh = make_mesh(data=2, spatial=4)
    new_state, m_sharded = step(replicate_state(state, mesh), shard_batch(batch, mesh))
    for k in ["loss_seg1", "loss_seg2"]:
        a, b = float(m_single[k]), float(m_sharded[k])
        assert np.isfinite(b), k
        assert abs(a - b) < 1e-3 * max(1.0, abs(a)), (k, a, b)
    assert int(new_state.step) == 1
