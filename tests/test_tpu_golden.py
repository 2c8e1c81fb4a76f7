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

# Captured 2026-08-17 on TPU v5 lite (all-GEMM convs + merged-N wide ASPP heads +
# post-scan anchor rows; regenerated for the round-3 loss-scan restructure — merged
# two-head chunk upsample + separate no-grad teacher-conf pass. Step 0 matched the
# previous capture to 6 significant digits (the restructure is exact); steps 1-2
# drift through the usual bf16-ulp amplification when the compiled program changes).
TPU_GOLDEN = [
    dict(loss=14.4211, loss_seg_p=15.5847, loss_seg_y=9.48589, convex=-18.4848,
         volume=-13.0308, anchor=21.6747, place=0.352181),
    dict(loss=2.03573, loss_seg_p=0.441454, loss_seg_y=9.28103, convex=-18.3809,
         volume=-13.0444, anchor=11.5846, place=0.152309),
    dict(loss=-7.97514, loss_seg_p=0.00728233, loss_seg_y=9.30955, convex=-18.2866,
         volume=-13.0473, anchor=1.78456, place=0.0),
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
