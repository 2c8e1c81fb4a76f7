"""Multi-host bring-up test: two REAL processes over jax.distributed (CPU backend).

Covers ``parallel.initialize_multihost`` + the cross-process collective path that the
single-process mesh tests cannot reach (SURVEY.md §2.5 comm-backend row; the reference
has no distribution layer at all). Each process gets 2 virtual CPU devices, composes
the global (data=4,) mesh, runs a psum over a process-dependent value, and checks the
globally-reduced result — i.e. the DCN path of the eval-histogram reduction
(eval/evaluate.py) and DP gradient sync.
"""

import os
import subprocess
import sys

import pytest


def _free_port() -> str:
    import socket

    with socket.socket() as sk:
        sk.bind(("127.0.0.1", 0))
        return str(sk.getsockname()[1])


_WORKER = r"""
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]

sys.path.insert(0, {repo!r})
from simt_tpu.parallel import initialize_multihost

initialize_multihost(f"127.0.0.1:{{port}}", nproc, pid)
assert jax.process_count() == nproc, jax.process_count()
assert jax.process_index() == pid

import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec
from jax.experimental import multihost_utils

devices = np.asarray(jax.devices()).reshape(nproc * 2)
mesh = Mesh(devices, ("data",))

# Each process contributes its own histogram shard; the global psum must see both.
local = jnp.full((2, 4), float(pid + 1), jnp.float32)  # 2 local shards
arr = multihost_utils.host_local_array_to_global_array(local, mesh, PartitionSpec("data"))

@jax.jit
def reduce_sum(a):
    return jnp.sum(a)

total = float(reduce_sum(arr))
# process 0 contributes 2*4*1, process 1 contributes 2*4*2 -> 24
expected = sum((p + 1) * 2 * 4 for p in range(nproc))
assert total == expected, (total, expected)
print(f"proc {{pid}} ok total={{total}}")
"""


_EVAL_WORKER = r"""
import sys

import jax

jax.config.update("jax_platforms", "cpu")

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]
fixture_root = sys.argv[4]
val_txt = sys.argv[5]
gt_dir = sys.argv[6]

sys.path.insert(0, {repo!r})
from simt_tpu.parallel import initialize_multihost

initialize_multihost(f"127.0.0.1:{{port}}", nproc, pid)

import jax.numpy as jnp
from simt_tpu.eval import evaluate
from simt_tpu.models.resnet_multi import ResNetMulti

model = ResNetMulti(num_classes=19, layers=(1, 1, 1, 1), dtype=jnp.float32)
variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 32, 3)), False)
# shard defaults to (process_index, process_count); the final histogram is
# process_allgather-summed, so every process must print the same GLOBAL mIoU.
miou = evaluate(
    model, variables, data_root=fixture_root, val_list=val_txt, gt_dir=gt_dir,
    mode="simt", scales=((32, 16), (40, 20)), out_hw=(32, 64),
    print_fn=lambda s: None,
)
print(f"proc {{pid}} miou={{miou}}")
"""


@pytest.mark.skipif(os.environ.get("SIMT_SKIP_MULTIHOST") == "1",
                    reason="explicitly disabled")
def test_two_process_sharded_eval_agrees_with_single(tmp_path):
    """The DCN path of the eval reduction: two processes each evaluate their shard,
    process_allgather-sum the 19x19 histograms, and must both report exactly the
    single-process full-set mIoU."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from simt_tpu.data import synthetic
    from simt_tpu.eval import evaluate
    from simt_tpu.models.resnet_multi import ResNetMulti

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    root = tmp_path / "cs"
    paths = synthetic.make_cityscapes_fixture(str(root), n_train=2, n_val=4,
                                              image_wh=(64, 32))
    model = ResNetMulti(num_classes=19, layers=(1, 1, 1, 1), dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 32, 3)), False)
    full = evaluate(
        model, variables, data_root=paths["root"], val_list=paths["val_txt"],
        gt_dir=paths["gt_dir"], mode="simt", scales=((32, 16), (40, 20)),
        out_hw=(32, 64), print_fn=lambda s: None,
    )

    script = tmp_path / "eval_worker.py"
    script.write_text(_EVAL_WORKER.format(repo=repo))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    port = _free_port()  # one shared coordinator port
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), "2", port,
             paths["root"], paths["val_txt"], paths["gt_dir"]],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append((p.returncode, out))
    for rc, out in outs:
        assert rc == 0, out[-2000:]
    mious = []
    for pid in range(2):
        line = [ln for ln in outs[pid][1].splitlines()
                if ln.startswith(f"proc {pid} miou=")]
        assert line, outs[pid][1][-500:]
        mious.append(float(line[0].split("=")[1]))
    # Both processes must report the SAME global mIoU (they sum the same
    # allgathered histograms) — this is the distributed-reduction property.
    assert mious[0] == mious[1], mious
    # The parent's single-process run is a separately-jitted program; float-ulp
    # forward differences can flip argmax ties of this random-init (near-flat-
    # logit) model on a handful of pixels, so compare with a small tolerance
    # rather than exact equality (see STATUS.md eval-kernel bit-exactness note).
    assert abs(mious[0] - full) <= 1.0, (mious[0], full)


_TRAIN_WORKER = r"""
import json
import sys

import jax

jax.config.update("jax_platforms", "cpu")

pid = int(sys.argv[1])
nproc = int(sys.argv[2])
port = sys.argv[3]
fixture_root = sys.argv[4]
pseudo_lst = sys.argv[5]
cd_path = sys.argv[6]
iter_size = int(sys.argv[7]) if len(sys.argv) > 7 else 1

sys.path.insert(0, {repo!r})
sys.path.insert(0, {repo_tests!r})
from simt_tpu.parallel import initialize_multihost

initialize_multihost(f"127.0.0.1:{{port}}", nproc, pid)
assert jax.process_count() == nproc

from test_multihost_cfg import build_cfg_and_patch

cfg = build_cfg_and_patch(fixture_root, pseudo_lst, cd_path, iter_size)
from simt_tpu.train.loop import train

lines = []
out = train(cfg, eval_fn=None, print_fn=lines.append, max_steps=3)
for ln in lines:
    print("LINE:" + ln)
print("METRICS:" + json.dumps({{k: float(v) for k, v in out["final_metrics"].items()}}))
"""

# Shared between the in-process (single-process reference) run and the worker
# processes so both build the IDENTICAL config + tiny-model patch.
_CFG_MODULE = '''
"""Config + tiny-model patch shared by the two-process train test's worker and
the in-process single-process reference run (written to disk by the test)."""
import dataclasses

import jax.numpy as jnp
import numpy as np


def build_cfg_and_patch(fixture_root, pseudo_lst, cd_path, iter_size=1):
    from simt_tpu import config as config_lib
    from simt_tpu.models.resnet_multi import ResNetMulti
    from simt_tpu.train import loop as loop_lib

    def tiny_models(cfg):
        student = ResNetMulti(num_classes=5, open_classes=3, openset=True,
                              layers=(1, 1, 1, 1), dtype=jnp.float32)
        teacher = ResNetMulti(num_classes=5, layers=(1, 1, 1, 1), dtype=jnp.float32)
        return student, teacher

    loop_lib.build_models = tiny_models

    return config_lib.TrainConfig(
        stage="simt",
        model=config_lib.ModelConfig(num_classes=5, open_classes=3, openset=True,
                                     compute_dtype="float32"),
        optim=config_lib.OptimConfig(num_steps=100, iter_size=iter_size),
        simt=dataclasses.replace(config_lib.SimTConfig(), class_dist=cd_path,
                                 inner_w_steps=2),
        data=dataclasses.replace(
            config_lib.TrainConfig().data, root=fixture_root,
            list_path=pseudo_lst, crop_size=(64, 32), batch_size=1,
            num_workers=2, process_workers=False,
        ),
        mesh=config_lib.MeshConfig(data_axis=4, spatial_axis=1),
        num_steps_stop=3,
        save_pred_every=100,
        snapshot_dir="",
        log_every=1,
    )
'''


@pytest.mark.skipif(os.environ.get("SIMT_SKIP_MULTIHOST") == "1",
                    reason="explicitly disabled")
@pytest.mark.parametrize("iter_size", [1, 2])
def test_two_process_train_matches_single_process(tmp_path, iter_size):
    """Multi-host data-parallel TRAINING end to end (VERDICT r2 #1): two processes
    (2 virtual CPU devices each) compose a global data=4 mesh, each decodes only its
    half of every global batch through the PRODUCT build_loader path
    (Loader.process_shard + make_array_from_process_local_data), and the 3-step loss
    trace must match a single-process run over the same global batches.

    iter_size=2 additionally pins the gradient-accumulation stacking of
    already-global sub-batches under multiple controllers (train/loop.py)."""
    import json

    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from simt_tpu.data import synthetic

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    root = tmp_path / "cs"
    paths = synthetic.make_cityscapes_fixture(str(root), n_train=12, n_val=2,
                                              image_wh=(64, 32), num_classes=5)
    cd_path = str(tmp_path / "cd.npy")
    np.save(cd_path, (np.ones(5) / 5).astype(np.float32))
    cfg_mod = tmp_path / "test_multihost_cfg.py"
    cfg_mod.write_text(_CFG_MODULE)

    # --- single-process reference: same cfg, data=4 mesh over 4 local devices ---
    import sys as _sys

    _sys.path.insert(0, str(tmp_path))
    try:
        from test_multihost_cfg import build_cfg_and_patch

        from simt_tpu.train import loop as loop_lib

        orig_build_models = loop_lib.build_models
        try:
            cfg = build_cfg_and_patch(paths["root"], paths["pseudo_lst"], cd_path,
                                      iter_size)
            lines_single = []
            out_single = loop_lib.train(cfg, eval_fn=None,
                                        print_fn=lines_single.append, max_steps=3)
        finally:
            loop_lib.build_models = orig_build_models
    finally:
        _sys.path.remove(str(tmp_path))

    # --- two real processes over jax.distributed ---
    script = tmp_path / "train_worker.py"
    script.write_text(_TRAIN_WORKER.format(repo=repo, repo_tests=str(tmp_path)))
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), "2", port,
             paths["root"], paths["pseudo_lst"], cd_path, str(iter_size)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append((p.returncode, out))
    for rc, out in outs:
        assert rc == 0, out[-3000:]

    metrics = []
    for pid in range(2):
        train_lines = [ln[5:] for ln in outs[pid][1].splitlines()
                       if ln.startswith("LINE:")]
        mline = [ln for ln in outs[pid][1].splitlines() if ln.startswith("METRICS:")]
        assert mline, outs[pid][1][-500:]
        metrics.append(json.loads(mline[0][8:]))
        assert any("mesh: data=4 spatial=1" in l for l in train_lines)
        # First-step print line equal to the single-process run (same init state,
        # same global batch — the strongest per-line claim reduction order allows).
        want = [l for l in lines_single if l.startswith("iter =")][0]
        got = [l for l in train_lines if l.startswith("iter =")][0]
        assert got == want, (got, want)

    # Both processes report identical (replicated) final metrics...
    for k in metrics[0]:
        assert metrics[0][k] == metrics[1][k], (k, metrics[0][k], metrics[1][k])
    # ...and the continuous components track the single-process 3-step trace
    # (argmax-discontinuous anchor/total excluded, as in test_parallel.py).
    for k in ("loss_seg_y", "loss_seg_p", "convex", "volume"):
        a = out_single["final_metrics"][k]
        b = metrics[0][k]
        assert abs(a - b) < 5e-3 * max(1.0, abs(a)), (k, a, b)


@pytest.mark.skipif(os.environ.get("SIMT_SKIP_MULTIHOST") == "1",
                    reason="explicitly disabled")
def test_two_process_distributed_reduce(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.format(repo=repo))
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), "2", port],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append((p.returncode, out))
    for rc, out in outs:
        assert rc == 0, out[-2000:]
    assert "proc 0 ok" in outs[0][1] and "proc 1 ok" in outs[1][1]
