"""Checkpointing: orbax-native save/restore with full resume state.

The reference saves bare ``state_dict`` files and can never resume (no optimizer/step
state on disk — SURVEY.md §5). Here the whole train state (params, batch stats, all
optimizer states, NTM/W params, step counter) round-trips through orbax, and warm-starts
from reference ``.pth`` checkpoints go through models/import_torch.py.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax


_CKPT = None


def _checkpointer():
    # One long-lived checkpointer: StandardCheckpointer is async under the hood,
    # and in-flight async saves must outlive the save() call (wait=False below).
    global _CKPT
    if _CKPT is None:
        import orbax.checkpoint as ocp

        _CKPT = ocp.StandardCheckpointer()
    return _CKPT


def save(state: Any, directory: str, step: int, *, wait: bool = True) -> str:
    """Write a full-state snapshot. ``wait=False`` returns as soon as the device
    arrays are copied to host (orbax async): the serialisation/write overlaps the
    following train steps instead of stalling the loop (SURVEY.md §5 rebuild plan —
    the reference's torch.save blocks ~seconds per best-checkpoint). Call
    ``wait_until_finished()`` (or a later ``save(wait=True)``) before reading or
    deleting the snapshot."""
    path = os.path.abspath(os.path.join(directory, f"step_{step:08d}"))
    ckpt = _checkpointer()
    ckpt.save(path, state)
    if wait:
        ckpt.wait_until_finished()
    return path


def wait_until_finished() -> None:
    """Block until every in-flight async save has committed."""
    if _CKPT is not None:
        _CKPT.wait_until_finished()


def latest_step(directory: str) -> Optional[int]:
    if not os.path.isdir(directory):
        return None
    steps = [
        int(m.group(1))
        for name in os.listdir(directory)
        if (m := re.fullmatch(r"step_(\d+)", name))
    ]
    return max(steps) if steps else None


def restore(template: Any, directory: str, step: Optional[int] = None) -> Any:
    """Restore into the structure of ``template`` (an abstract or concrete state)."""
    if step is None:
        step = latest_step(directory)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {directory}")
    path = os.path.abspath(os.path.join(directory, f"step_{step:08d}"))
    ckpt = _checkpointer()
    abstract = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype) if hasattr(a, "shape") else a,
        template,
    )
    try:
        return ckpt.restore(path, abstract)
    except (ValueError, KeyError) as e:
        # Orbax structure/dtype mismatches are cryptic; the common cause is a
        # snapshot written before a train-state layout change (e.g. the round-3
        # trainable-only optimizer partition / bf16 teacher kernels).
        raise ValueError(
            f"checkpoint at {path} does not match the current train-state layout "
            "(was it written by an older simt_tpu version? resume requires a "
            f"same-layout snapshot): {e}"
        ) from e


def delete(directory: str, step: int) -> None:
    import shutil

    path = os.path.join(directory, f"step_{step:08d}")
    if os.path.isdir(path):
        shutil.rmtree(path)


def load_warmstart_variables(model, restore_from: str, input_hw, *, strip_prefix=0,
                             shape_filter=True, rng=None):
    """Init model variables then overlay a reference ``.pth`` (or .npz) state_dict,
    reproducing the reference's partial-load flavours (trainV2_simt.py:252-255 /
    trainV1_warmup.py:176-179)."""
    import jax.numpy as jnp
    import numpy as np

    from ..models import import_torch

    rng = rng if rng is not None else jax.random.PRNGKey(0)
    variables = model.init(rng, jnp.zeros((1, *input_hw, 3), jnp.float32), False)
    if not restore_from:
        return variables, {"loaded": [], "missing": [], "skipped": [], "unused": []}
    if restore_from.endswith(".npz"):
        sd = dict(np.load(restore_from))
    else:
        sd = import_torch.load_pth(restore_from)
    return import_torch.import_state_dict(
        dict(variables), sd, strip_prefix=strip_prefix, shape_filter=shape_filter
    )
