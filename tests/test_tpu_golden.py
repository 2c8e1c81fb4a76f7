"""TPU-side golden trace (VERDICT r1 item 8).

The CPU float32 golden trace (test_golden_metrics.py) pins a tiny (1,1,1,1)-layer
model; it cannot catch bf16-only or full-depth-only regressions on the TPU path.
This test pins 3 steps of the BENCH configuration — full-depth ResNet-101, bf16,
512x1024 synthetic batch, fixed seeds (bench._setup) — captured on a real v5e via
tools/capture_tpu_golden.py. Tolerances are loose (bf16 + compiler drift); the
point is catching structural regressions, not bit drift.

Skipped on CPU. Run with:  SIMT_TEST_PLATFORM=axon,cpu python -m pytest tests/test_tpu_golden.py
("axon" is this environment's TPU-tunnel platform name; on a directly-attached
TPU host use SIMT_TEST_PLATFORM=tpu,cpu)
(first run compiles the full step over the tunnel, ~minutes; cached afterwards).
Regenerate constants with tools/capture_tpu_golden.py after intentional semantic
changes.
"""

import os
import sys

import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

requires_tpu = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="TPU-only golden trace (SIMT_TEST_PLATFORM=axon,cpu to enable)",
)

# Captured 2026-08-17 on TPU v5 lite. Regenerated for the round-3 W-folded stem +
# 4-D loss-tile restructure: the stem's bf16 tap-accumulation order changes, which
# shifts image-path components by ulps that later steps amplify (step-0
# loss_seg_p drifted 0.23%; the NTM-only convex/volume components matched the
# previous capture EXACTLY, and the CPU f32 tests pin both changes bit-exactly —
# semantics are unchanged).
TPU_GOLDEN = [
    dict(loss=14.1934, loss_seg_p=15.5484, loss_seg_y=9.4854, convex=-18.4848,
         volume=-13.0308, anchor=21.4518, place=0.34976),
    dict(loss=1.99784, loss_seg_p=0.519538, loss_seg_y=9.28402, convex=-18.3809,
         volume=-13.0444, anchor=11.5538, place=0.131267),
    dict(loss=-6.31835, loss_seg_p=0.495532, loss_seg_y=9.31114, convex=-18.2866,
         volume=-13.0473, anchor=3.36253, place=0.0),
]


@requires_tpu
def test_tpu_three_step_golden_trace():
    import bench

    from simt_tpu.data import synthetic

    cfg, state, step, hw, batch_size = bench._setup()
    raw = synthetic.synthetic_batch(batch_size=batch_size, hw=hw, num_classes=19,
                                    seed=0)
    batch = {"image": jnp.asarray(raw["image"]), "label": jnp.asarray(raw["label"])}

    for i, want in enumerate(TPU_GOLDEN):
        state, m = step(state, batch)
        for k, v in want.items():
            got = float(m[k])
            assert got == pytest.approx(v, rel=2e-2, abs=1e-2), (i, k, got, v)
