"""torch state_dict -> Flax variables conversion.

The reference ships/loads a PyTorch checkpoint ``best_model.pt``
(models.py:222, predict.py:57) whose keys follow torchvision naming
(``backbone.layer1.0.conv1.weight``, ``classifier.0.weight``, ...). This
module converts such a state_dict (torch tensors or numpy arrays) into the
{params, batch_stats} variable tree of models/segmentation.py so reference
checkpoints run unchanged on TPU.

Layout rules:
- conv kernels: torch [O, I, kh, kw] -> flax [kh, kw, I, O]
- BatchNorm: weight->scale, bias->bias, running_mean/var->batch_stats
- ``num_batches_tracked`` is dropped.
"""
from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t)


def _set(tree: dict, path: list[str], leaf: np.ndarray) -> None:
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = leaf


def _backbone_path(rest: str) -> list[str] | None:
    """'layer1.0.conv2.weight'-style name -> flax path inside backbone."""
    parts = rest.split(".")
    if parts[0] in ("conv1",):
        return ["conv1", "weight"]
    if parts[0] == "bn1":
        return ["bn1", parts[1]]
    if parts[0].startswith("layer"):
        block = f"{parts[0]}_{parts[1]}"
        mod = parts[2]
        if mod == "downsample":
            sub = "downsample_conv" if parts[3] == "0" else "downsample_bn"
            return [block, sub, parts[4]]
        return [block, mod, parts[3]]
    return None


def _fcn_head_path(rest: str) -> list[str] | None:
    """FCNHead Sequential indices (reference models.py:113-124):
    0=conv(no bias), 1=bn, 4=conv."""
    parts = rest.split(".")
    table = {"0": "conv1", "1": "bn1", "4": "conv2"}
    if parts[0] not in table:
        return None
    return [table[parts[0]], parts[1]]


def _deeplab_head_path(rest: str) -> list[str] | None:
    """torchvision DeepLabHead Sequential: 0=ASPP, 1=conv, 2=bn, 4=conv."""
    parts = rest.split(".")
    if parts[0] == "0":  # ASPP
        if parts[1] == "convs":
            branch = parts[2]
            if branch == "0":  # Sequential(conv, bn, relu)
                sub = {"0": "b0_conv", "1": "b0_bn"}[parts[3]]
                return ["aspp", sub, parts[4]]
            if branch in ("1", "2", "3"):  # ASPPConv(conv, bn, relu)
                sub = {"0": "conv", "1": "bn"}[parts[3]]
                return ["aspp", f"b{branch}", sub, parts[4]]
            if branch == "4":  # ASPPPooling(pool, conv, bn, relu)
                sub = {"1": "pool_conv", "2": "pool_bn"}[parts[3]]
                return ["aspp", sub, parts[4]]
        if parts[1] == "project":
            sub = {"0": "project_conv", "1": "project_bn"}[parts[2]]
            return ["aspp", sub, parts[3]]
        return None
    table = {"1": "conv", "2": "bn", "4": "classifier"}
    if parts[0] not in table:
        return None
    return [table[parts[0]], parts[1]]


_BN_PARAM = {"weight": "scale", "bias": "bias"}
_BN_STATS = {"running_mean": "mean", "running_var": "var"}


def torch_state_dict_to_variables(
        state_dict: Mapping[str, Any],
        head: str = "fcn") -> dict:
    """Convert a reference SimpleSegmentationModel state_dict.

    head: 'fcn' or 'deeplab'. Returns {'params': ..., 'batch_stats': ...}.
    """
    head_path = _fcn_head_path if head == "fcn" else _deeplab_head_path
    params: dict = {}
    batch_stats: dict = {}
    for name, tensor in state_dict.items():
        if name.endswith("num_batches_tracked"):
            continue
        if name.startswith("backbone."):
            root = "backbone"
            path = _backbone_path(name[len("backbone."):])
        elif name.startswith("classifier."):
            root = "classifier"
            path = head_path(name[len("classifier."):])
        else:
            raise KeyError(f"unrecognized checkpoint key: {name}")
        if path is None:
            raise KeyError(f"unmapped checkpoint key: {name}")

        arr = _np(tensor)
        leaf_name = path[-1]
        if leaf_name == "weight" and arr.ndim == 4:  # conv kernel
            _set(params, [root, *path[:-1], "kernel"],
                 arr.transpose(2, 3, 1, 0))
        elif leaf_name in _BN_PARAM and arr.ndim == 1 and _is_bn(path):
            _set(params, [root, *path[:-1], _BN_PARAM[leaf_name]], arr)
        elif leaf_name in _BN_STATS:
            _set(batch_stats, [root, *path[:-1], _BN_STATS[leaf_name]], arr)
        elif leaf_name == "bias":
            _set(params, [root, *path[:-1], "bias"], arr)
        elif leaf_name == "weight" and arr.ndim == 1:  # bn scale
            _set(params, [root, *path[:-1], "scale"], arr)
        else:
            raise ValueError(f"cannot place key {name} with shape "
                             f"{arr.shape}")
    return {"params": params, "batch_stats": batch_stats}


def _is_bn(path: list[str]) -> bool:
    mod = path[-2] if len(path) >= 2 else ""
    return "bn" in mod


def load_torch_checkpoint(path: str, head: str = "fcn") -> dict:
    """Load a reference ``best_model.pt`` via torch-cpu and convert."""
    import torch

    state = torch.load(path, map_location="cpu")
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    return torch_state_dict_to_variables(state, head=head)


# ------------------------------------------------------- reverse direction

def _flatten(tree: Mapping, prefix: str = "") -> dict[str, np.ndarray]:
    out = {}
    for key, value in tree.items():
        path = f"{prefix}.{key}" if prefix else key
        if isinstance(value, Mapping):
            out.update(_flatten(value, path))
        else:
            out[path] = np.asarray(value)
    return out


def _torch_backbone_name(path: str) -> str:
    """flax 'layer1_0.conv2' -> torchvision 'layer1.0.conv2' etc."""
    parts = path.split(".")
    if parts[0].startswith("layer"):
        stage, block = parts[0].split("_")
        mod = parts[1]
        if mod == "downsample_conv":
            return f"{stage}.{block}.downsample.0.{parts[2]}"
        if mod == "downsample_bn":
            return f"{stage}.{block}.downsample.1.{parts[2]}"
        return f"{stage}.{block}.{mod}.{parts[2]}"
    return path


def variables_to_torch_state_dict(variables: Mapping,
                                  head: str = "fcn") -> dict:
    """{params, batch_stats} -> torchvision-named numpy state_dict (the
    inverse of torch_state_dict_to_variables, for exporting TPU-trained
    weights back to the reference's ``best_model.pt`` format; wrap values
    with torch.tensor to torch.save them)."""
    if head != "fcn":
        raise NotImplementedError("reverse conversion supports the "
                                  "production fcn head")
    fcn_rev = {"conv1": "0", "bn1": "1", "conv2": "4"}
    out: dict[str, np.ndarray] = {}

    def emit(root: str, flat: dict[str, np.ndarray], is_stats: bool):
        for path, arr in flat.items():
            parts = path.split(".")
            leaf = parts[-1]
            inner = ".".join(parts[:-1])
            if root == "backbone":
                name = _torch_backbone_name(f"{inner}.x")[:-2]
            else:
                name = fcn_rev[parts[0]]
            if is_stats:
                torch_leaf = {"mean": "running_mean",
                              "var": "running_var"}[leaf]
            else:
                torch_leaf = {"kernel": "weight", "scale": "weight",
                              "bias": "bias"}[leaf]
            if leaf == "kernel":  # flax [kh,kw,I,O] -> torch [O,I,kh,kw]
                arr = arr.transpose(3, 2, 0, 1)
            out[f"{root}.{name}.{torch_leaf}"] = np.ascontiguousarray(arr)

    emit("backbone", _flatten(variables["params"]["backbone"]), False)
    emit("classifier", _flatten(variables["params"]["classifier"]), False)
    emit("backbone", _flatten(variables["batch_stats"]["backbone"]), True)
    emit("classifier", _flatten(variables["batch_stats"]["classifier"]),
         True)
    return out
