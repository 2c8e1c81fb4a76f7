"""Benchmark: SimT train-step throughput on one TPU chip vs the reference baseline.

Baseline (BASELINE.md): the reference sustains ~1.29 steps/s (bs 1, 1024x512,
DeepLabv2-ResNet101 + NTM losses) on its unspecified single GPU
(logs/BAPA_SimT_lr25.out timestamps).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
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


def main():
    _enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from simt_tpu.config import TrainConfig, ModelConfig, OptimConfig, SimTConfig
    from simt_tpu.data import synthetic
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
    batch_size = 1

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
    step = make_simt_step(student, teacher, cfg)

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
                "metric": "simt_train_steps_per_sec_bs1_512x1024",
                "value": round(steps_per_sec, 3),
                "unit": "steps/s",
                "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
