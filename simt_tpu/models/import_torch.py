"""PyTorch ``.pth`` checkpoint import/export shim.

The reference ships/loads torch ``state_dict`` checkpoints with three partial-load
flavours (SURVEY.md §5 checkpoint row):
  - key-intersection load (tools/trainV2_simt.py:252-255);
  - 6-char prefix strip + shape filter (tools/trainV1_warmup.py:177);
  - head-exclusion caffe load (model/deeplab.py:230-235).

This module maps between torch state_dict keys and the simt_tpu flax variable tree
(params + batch_stats) so users can warm-start from published reference checkpoints.
Weights are transposed OIHW -> HWIO. Works on plain dict[str, np.ndarray]; use
:func:`load_pth` to read an actual torch file (torch CPU is an optional dependency).
"""

from __future__ import annotations

from typing import Any, Dict, Iterable, Mapping, Optional, Tuple

import jax
import numpy as np

FlatTree = Dict[Tuple[str, ...], np.ndarray]


def _flatten(tree: Mapping, prefix: Tuple[str, ...] = ()) -> FlatTree:
    out: FlatTree = {}
    for k, v in tree.items():
        if isinstance(v, Mapping):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _unflatten(flat: FlatTree) -> Dict:
    out: Dict = {}
    for path, v in flat.items():
        node = out
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v
    return out


def flax_path_to_torch_key(path: Tuple[str, ...]) -> Optional[Tuple[str, bool]]:
    """Map a flax variable path to (torch state_dict key, needs_conv_transpose).

    Returns None for paths with no torch counterpart. ``path`` starts with the collection
    name ('params' or 'batch_stats').
    """
    collection, *rest = path
    leaf = rest[-1]
    # nn.Sequential child modules: layer1_0 -> layer1.0, features_29 -> features.29.
    # NOTE: layer5_1/layer6_1 are real torch module names (open-set ASPP heads,
    # deeplab_multi.py:141-142) and must NOT be split.
    _SEQ_BASES = ("layer1", "layer2", "layer3", "layer4", "features")
    mods = []
    for name in rest[:-1]:
        if (
            "_" in name
            and name.split("_")[-1].isdigit()
            and name.rsplit("_", 1)[0] in _SEQ_BASES
        ):
            base, idx = name.rsplit("_", 1)
            mods.extend([base, idx])
        elif name == "downsample_conv":
            mods.extend(["downsample", "0"])
        elif name == "downsample_bn":
            mods.extend(["downsample", "1"])
        else:
            mods.append(name)

    if collection == "batch_stats":
        if leaf == "mean":
            return ".".join(mods + ["running_mean"]), False
        if leaf == "var":
            return ".".join(mods + ["running_var"]), False
        return None

    # ASPP heads: branch{j}_kernel -> conv2d_list.{j}.weight (deeplab_multi.py:107-110).
    if leaf.startswith("branch") and leaf.endswith("_kernel"):
        j = leaf[len("branch"):-len("_kernel")]
        return ".".join(mods + ["conv2d_list", j, "weight"]), True
    if leaf.startswith("branch") and leaf.endswith("_bias"):
        j = leaf[len("branch"):-len("_bias")]
        return ".".join(mods + ["conv2d_list", j, "bias"]), False
    if leaf == "kernel":
        return ".".join(mods + ["weight"]), True
    if leaf == "scale":  # BatchNorm affine weight
        return ".".join(mods + ["weight"]), False
    if leaf == "bias":
        return ".".join(mods + ["bias"]), False
    return None


def import_state_dict(
    variables: Mapping,
    state_dict: Mapping[str, Any],
    *,
    strip_prefix: int = 0,
    shape_filter: bool = False,
    exclude: Iterable[str] = (),
    strict: bool = False,
) -> Tuple[Dict, Dict[str, list]]:
    """Update a flax variable tree from a torch ``state_dict``.

    - ``strip_prefix``: drop the first N characters of every torch key
      (trainV1_warmup.py:177 uses ``k[6:]``).
    - ``shape_filter``: silently skip shape mismatches instead of raising.
    - ``exclude``: torch key prefixes to skip (deeplab.py:230-235 head exclusion).
    Returns (new_variables, report) where report lists loaded / skipped / missing keys.
    """
    sd = {}
    for k, v in state_dict.items():
        k = k[strip_prefix:]
        if any(k.startswith(e) for e in exclude):
            continue
        sd[k] = np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)

    flat = _flatten(variables)
    report = {"loaded": [], "skipped": [], "missing": []}
    new_flat: FlatTree = {}
    used = set()
    for path, cur in flat.items():
        mapped = flax_path_to_torch_key(path)
        if mapped is None:
            new_flat[path] = cur
            continue
        key, transpose = mapped
        if key not in sd:
            report["missing"].append(key)
            new_flat[path] = cur
            continue
        val = sd[key]
        if transpose and val.ndim == 4:
            val = np.transpose(val, (2, 3, 1, 0))  # OIHW -> HWIO
        if val.shape != np.shape(cur):
            if shape_filter:
                report["skipped"].append(key)
                new_flat[path] = cur
                continue
            raise ValueError(f"shape mismatch for {key}: {val.shape} vs {np.shape(cur)}")
        new_flat[path] = jax.numpy.asarray(val, dtype=cur.dtype)
        report["loaded"].append(key)
        used.add(key)
    unused = [k for k in sd if k not in used and not k.endswith("num_batches_tracked")]
    report["unused"] = unused
    if strict and (report["missing"] or unused):
        raise ValueError(f"strict load failed: missing={report['missing']} unused={unused}")
    return _unflatten(new_flat), report


def export_state_dict(variables: Mapping) -> Dict[str, np.ndarray]:
    """Export flax variables to a torch-layout state_dict (numpy values)."""
    out: Dict[str, np.ndarray] = {}
    for path, val in _flatten(variables).items():
        mapped = flax_path_to_torch_key(path)
        if mapped is None:
            continue
        key, transpose = mapped
        arr = np.asarray(val)
        if transpose and arr.ndim == 4:
            arr = np.transpose(arr, (3, 2, 0, 1))  # HWIO -> OIHW
        out[key] = arr
    return out


def load_pth(path: str) -> Dict[str, np.ndarray]:
    """Read a torch ``.pth`` state_dict into numpy (requires torch, CPU-only is fine)."""
    import torch  # local import: torch is only needed for warm-start import

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.numpy() for k, v in sd.items()}
