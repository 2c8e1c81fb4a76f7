"""device_prefetch + GTA5 loader-source tests."""

import numpy as np

from simt_tpu.data import device_prefetch


def test_device_prefetch_preserves_order_and_content():
    batches = [
        {"image": np.full((1, 2, 2, 3), i, np.float32), "name": [f"n{i}"]}
        for i in range(5)
    ]
    out = list(device_prefetch(iter(batches), size=2))
    assert len(out) == 5
    for i, b in enumerate(out):
        assert float(np.asarray(b["image"])[0, 0, 0, 0]) == i
        assert b["name"] == [f"n{i}"]


def test_build_loader_gta5_source(tmp_path):
    from PIL import Image

    from simt_tpu.config import TrainConfig
    import dataclasses

    rng = np.random.RandomState(0)
    (tmp_path / "images").mkdir()
    (tmp_path / "labels").mkdir()
    names = []
    for i in range(2):
        name = f"{i:05d}.png"
        Image.fromarray(rng.randint(0, 255, (16, 32, 3), dtype=np.uint8)).save(
            tmp_path / "images" / name)
        Image.fromarray(rng.randint(0, 34, (16, 32), dtype=np.uint8)).save(
            tmp_path / "labels" / name)
        names.append(name)
    lst = tmp_path / "train.txt"
    lst.write_text("\n".join(names) + "\n")

    cfg = TrainConfig()
    cfg = cfg.replace(data=dataclasses.replace(
        cfg.data, root=str(tmp_path), list_path=str(lst), crop_size=(16, 8),
        batch_size=1, num_workers=1))

    from simt_tpu.train.loop import build_loader

    it = build_loader(cfg, source="gta5")
    batch = next(it)
    assert np.asarray(batch["image"]).shape == (1, 8, 16, 3)
    lab = np.asarray(batch["label"])
    # GTA5 remap: everything maps to a trainid or 255.
    assert set(np.unique(lab)).issubset(set(range(19)) | {255})

    # Same via config (the CLI's --source-domain path: train() passes no explicit
    # source, so DataConfig.source must select the GTA5 factory).
    cfg2 = cfg.replace(data=dataclasses.replace(cfg.data, source="gta5"))
    batch2 = next(build_loader(cfg2))
    assert set(np.unique(np.asarray(batch2["label"]))).issubset(
        set(range(19)) | {255}
    )
