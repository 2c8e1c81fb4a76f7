"""Benchmark: SimT train-step throughput on one TPU chip vs the reference baseline.

Baseline (BASELINE.md): the reference sustains ~1.29 steps/s (bs 1, 1024x512,
DeepLabv2-ResNet101 + NTM losses) on its unspecified single GPU
(logs/BAPA_SimT_lr25.out timestamps).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Modes:
  python bench.py              device train-step throughput (one resident batch)
  python bench.py --pipeline   end-to-end: on-disk PNG fixture at Cityscapes native
                               resolution -> threaded Loader + native preproc +
                               device_prefetch -> train step (proves the host input
                               pipeline sustains the device rate)
  python bench.py --pipeline --crop-cache
                               same, with the decoded-crop cache enabled
                               (DataConfig.crop_cache_dir): epoch 1 populates it,
                               the timed window runs decode-free
  python bench.py --pipeline --cache-teacher
                               same, with the teacher-posterior cache enabled
                               (SimTConfig.cache_teacher; composable with
                               --crop-cache): epoch 1 populates it, the timed
                               window skips the teacher forward
  python bench.py --eval       two-scale eval throughput (tools/bench_eval.py)
  python bench.py --warmup     warmup-stage train-step throughput
                               (tools/bench_warmup.py; baseline is the SimT-stage
                               proxy — no reference warmup log exists)

Every mode prints exactly one JSON line with {"metric", "value", "unit",
"vs_baseline"}; the default mode (no flags) is the driver's headline metric and is
unchanged by the secondary modes.
"""

import json
import sys
import time

BASELINE_STEPS_PER_SEC = 1.29



def _enable_compilation_cache():
    """Persistent XLA compilation cache — first compile of the big step costs minutes
    over the TPU tunnel; subsequent processes reuse it."""
    import os

    import jax

    d = os.environ.get("JAX_COMPILATION_CACHE_DIR") or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), ".jax_cache", jax.default_backend()
    )
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _setup(batch_size: int = 1, donate: bool = True):
    """Config, models, state, jitted step — shared by both modes."""
    import jax
    import jax.numpy as jnp

    from simt_tpu.config import TrainConfig, ModelConfig, OptimConfig, SimTConfig
    from simt_tpu.models import deeplab_multi
    from simt_tpu.train import create_simt_state, make_simt_step

    cfg = TrainConfig(
        model=ModelConfig(num_classes=19, open_classes=15, openset=True,
                          compute_dtype="bfloat16"),
        optim=OptimConfig(),
        simt=SimTConfig(),
    )
    student = deeplab_multi(19, 15, openset=True, dtype=jnp.bfloat16)
    teacher = deeplab_multi(19, dtype=jnp.bfloat16)

    hw = (512, 1024)  # reference training geometry (INPUT_SIZE_TARGET '1024,512')

    # Initialise on the host CPU backend (the TPU-tunnel init costs ~2 minutes),
    # then transfer once.
    init_x = jnp.zeros((batch_size, *hw, 3), jnp.float32)
    with jax.default_device(jax.devices("cpu")[0]):
        sv = student.init(jax.random.PRNGKey(0), init_x, False)
        tv = teacher.init(jax.random.PRNGKey(1), init_x, False)
    device = jax.devices()[0]
    sv = jax.device_put(sv, device)
    tv = jax.device_put(tv, device)
    state = create_simt_state(sv, tv, cfg, jax.random.PRNGKey(2))
    step = make_simt_step(student, teacher, cfg, donate=donate)
    return cfg, state, step, hw, batch_size


def _cli_batch_size() -> int:
    """Optional --batch-size N (default 1; bs>=4 crashes this env's tunnel worker)."""
    if "--batch-size" in sys.argv:
        return int(sys.argv[sys.argv.index("--batch-size") + 1])
    return 1


def main():
    _enable_compilation_cache()
    import jax  # noqa: F401
    import jax.numpy as jnp

    from simt_tpu.data import synthetic

    batch_size = _cli_batch_size()
    cfg, state, step, hw, _ = _setup(batch_size)
    raw = synthetic.synthetic_batch(batch_size=batch_size, hw=hw, num_classes=19, seed=0)
    batch = {"image": jnp.asarray(raw["image"]), "label": jnp.asarray(raw["label"])}

    # Warmup (compile) + a few steady steps. NOTE: on the axon tunnel platform
    # block_until_ready is not a true device sync — a host readback of a scalar is the
    # only honest barrier (verified against XLA cost analysis), so we time with one.
    for _ in range(3):
        state, metrics = step(state, batch)
    float(metrics["loss"])

    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        state, metrics = step(state, batch)
    _ = float(metrics["loss"])  # forces completion of the whole chained sequence
    dt = time.perf_counter() - t0
    steps_per_sec = n / dt

    print(
        json.dumps(
            {
                "metric": f"simt_train_steps_per_sec_bs{batch_size}_512x1024",
                "value": round(steps_per_sec, 3),
                "unit": "steps/s",
                "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC, 2),
            }
        )
    )


def main_pipeline():
    """End-to-end mode: the host input pipeline feeds the device step.

    Writes a synthetic Cityscapes-layout fixture at native 2048x1024 resolution (so
    PNG decode + bicubic 2x downscale cost what a real run costs), then drives the
    jitted SimT step from Loader + native preproc + device_prefetch for 50 steps.
    The reference's equivalent path is its torch DataLoader with 4 PIL workers
    (trainV2_simt.py:287-292)."""
    _enable_compilation_cache()
    import dataclasses
    import os
    import shutil
    import tempfile

    from simt_tpu.data.synthetic import make_cityscapes_fixture
    from simt_tpu.train.loop import build_loader

    cache_teacher = "--cache-teacher" in sys.argv
    # Teacher cache => no donation: the cache's jitted forward closes over the
    # INITIAL state's teacher arrays (train/loop.py does the same).
    cfg, state, step, hw, batch_size = _setup(donate=not cache_teacher)

    root = tempfile.mkdtemp(prefix="simt_bench_fixture_")
    try:
        paths = make_cityscapes_fixture(root, n_train=12, n_val=0,
                                        image_wh=(2048, 1024), seed=0)
        crop_cache = os.path.join(root, "crop_cache") if "--crop-cache" in sys.argv \
            else ""
        cfg = cfg.replace(data=dataclasses.replace(
            cfg.data, root=root, list_path=paths["pseudo_lst"],
            crop_size=(hw[1], hw[0]),  # (w, h)
            crop_cache_dir=crop_cache,
        ))
        raw_it = build_loader(cfg)
        if cache_teacher:
            import jax.numpy as jnp

            from simt_tpu.models import deeplab_multi
            from simt_tpu.train.teacher_cache import TeacherCache

            cache = TeacherCache(deeplab_multi(19, dtype=jnp.bfloat16),
                                 state.teacher_params, state.teacher_batch_stats)
            raw_it = cache.wrap(iter(raw_it))
        step_keys = ("image", "label", "teacher_prob8")

        def it_():
            b = next(raw_it)
            return {k: v for k, v in b.items() if k in step_keys}

        # Cover epoch 1 (12 imgs) when a cache needs populating.
        warm = 14 if ("--crop-cache" in sys.argv or cache_teacher) else 3
        for _ in range(warm):
            state, metrics = step(state, it_())
        float(metrics["loss"])

        n = 50
        t0 = time.perf_counter()
        for _ in range(n):
            state, metrics = step(state, it_())
        _ = float(metrics["loss"])
        dt = time.perf_counter() - t0
        steps_per_sec = n / dt
    finally:
        shutil.rmtree(root, ignore_errors=True)

    print(
        json.dumps(
            {
                "metric": "simt_train_steps_per_sec_bs1_512x1024_with_input_pipeline"
                          + ("_crop_cache" if "--crop-cache" in sys.argv else "")
                          + ("_teacher_cache" if cache_teacher else ""),
                "value": round(steps_per_sec, 3),
                "unit": "steps/s",
                "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC, 2),
            }
        )
    )


def _run_tool(name: str):
    """Dispatch a secondary mode to its tools/ implementation (same JSON contract)."""
    import os

    tools = os.path.join(os.path.dirname(os.path.abspath(__file__)), "tools")
    sys.path.insert(0, os.path.dirname(tools))
    sys.path.insert(0, tools)
    import importlib

    importlib.import_module(name).main()


if __name__ == "__main__":
    if "--eval" in sys.argv:
        _run_tool("bench_eval")
    elif "--warmup" in sys.argv:
        _run_tool("bench_warmup")
    elif "--pipeline" in sys.argv:
        main_pipeline()
    else:
        main()
