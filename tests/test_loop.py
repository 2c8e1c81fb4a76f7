"""Training-loop driver tests: config presets, stage wiring, resume."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from simt_tpu import config as config_lib
from simt_tpu.data import synthetic
from simt_tpu.train import loop as loop_lib


def test_presets():
    for name in ["warmup_bapa", "simt_bapa_lr25", "simt_bapa_lr6", "simt_sfda"]:
        cfg = config_lib.preset(name)
        assert cfg.stage in ("warmup", "simt")
    lr6 = config_lib.preset("simt_bapa_lr6")
    assert lr6.optim.learning_rate == 6e-4 and lr6.optim.learning_rate_t == 6e-3
    sfda = config_lib.preset("simt_sfda")
    # sig_NTM hardcodes the bapa prior for every run incl. SFDA (deeplab_multi.py:255).
    assert sfda.simt.class_dist == "bapa"
    assert "sfdaseg" in sfda.data.list_path
    with pytest.raises(ValueError):
        config_lib.preset("nope")


def _tiny_cfg(tmp_path, stage, snapshot=""):
    cd = str(tmp_path / "cd.npy")
    np.save(cd, (np.ones(5) / 5).astype(np.float32))
    return config_lib.TrainConfig(
        stage=stage,
        model=config_lib.ModelConfig(num_classes=5, open_classes=3,
                                     openset=stage == "simt", compute_dtype="float32"),
        optim=config_lib.OptimConfig(num_steps=100),
        simt=dataclasses.replace(config_lib.SimTConfig(), class_dist=cd, inner_w_steps=2),
        data=dataclasses.replace(config_lib.TrainConfig().data, crop_size=(64, 32),
                                 batch_size=1),
        num_steps_stop=3,
        save_pred_every=100,
        snapshot_dir=snapshot,
        log_every=1,
    )


def _batch_iter():
    b = synthetic.synthetic_batch(1, (32, 64), 5, seed=0)
    batch = {"image": jnp.asarray(b["image"]), "label": jnp.asarray(b["label"])}
    while True:
        yield batch


def test_train_simt_stage_runs(tmp_path):
    cfg = _tiny_cfg(tmp_path, "simt")
    lines = []
    out = loop_lib.train(cfg, batch_iter=_batch_iter(), print_fn=lines.append,
                         csv_path=str(tmp_path / "m.csv"))
    assert int(out["state"].step) == 3
    assert np.isfinite(out["final_metrics"]["loss"])
    assert any(l.startswith("iter =") for l in lines)
    assert (tmp_path / "m.csv").exists()


def test_train_resume_roundtrip(tmp_path):
    snap = str(tmp_path / "snaps")
    cfg = _tiny_cfg(tmp_path, "warmup", snapshot=snap)
    out1 = loop_lib.train(cfg, batch_iter=_batch_iter(), print_fn=lambda s: None)
    assert int(out1["state"].step) == 3
    # Resume continues from the saved step counter.
    cfg2 = cfg.replace(num_steps_stop=5)
    lines = []
    out2 = loop_lib.train(cfg2, batch_iter=_batch_iter(), print_fn=lines.append,
                          resume=True)
    assert any("resumed from step 3" in l for l in lines)
    assert int(out2["state"].step) == 5
