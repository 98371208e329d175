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


def _efficientnet_block_table(variant: int) -> list[str]:
    """Flat efficientnet_pytorch ``_blocks.{j}`` index -> our
    ``block{stage}_{i}`` module name (models/efficientnet.py stage loop)."""
    from .efficientnet import BASE_BLOCKS, SCALING, round_repeats

    _, depth_mult = SCALING[variant]
    table = []
    for stage, (_, _, repeats, _, _) in enumerate(BASE_BLOCKS):
        for i in range(round_repeats(repeats, depth_mult)):
            table.append(f"block{stage}_{i}")
    return table


_EFF_BLOCK_MODS = {
    "_expand_conv": "expand_conv", "_depthwise_conv": "depthwise_conv",
    "_project_conv": "project_conv", "_bn0": "bn0", "_bn1": "bn1",
    "_bn2": "bn2",
}


def _efficientnet_path(rest: str,
                       block_table: list[str]) -> list[str] | None:
    """efficientnet_pytorch name ('_conv_stem.weight',
    '_blocks.3._se_reduce.bias', ...) -> flax path inside
    EfficientNetFeatures. Returns None for unmapped keys."""
    parts = rest.split(".")
    if parts[0] == "_conv_stem":
        return ["stem_conv", "weight"]
    if parts[0] == "_bn0":
        return ["stem_bn", parts[1]]
    if parts[0] == "_conv_head":
        return ["head_conv", "weight"]
    if parts[0] == "_bn1":  # top-level: the head BN
        return ["head_bn", parts[1]]
    if parts[0] == "_blocks":
        block = block_table[int(parts[1])]
        sub = parts[2]
        if sub in _EFF_BLOCK_MODS:
            return [block, _EFF_BLOCK_MODS[sub], parts[3]]
        if sub == "_se_reduce":
            return [block, "se", "reduce", parts[3]]
        if sub == "_se_expand":
            return [block, "se", "expand", parts[3]]
    return None


_BN_PARAM = {"weight": "scale", "bias": "bias"}
_BN_STATS = {"running_mean": "mean", "running_var": "var"}


def torch_state_dict_to_variables(
        state_dict: Mapping[str, Any],
        head: str = "fcn",
        efficientnet_variant: int | None = None) -> dict:
    """Convert a reference SimpleSegmentationModel state_dict.

    head: 'fcn' or 'deeplab'. Returns {'params': ..., 'batch_stats': ...}.

    ResNet backbones are detected from ``backbone.layer*`` keys;
    EfficientNet backbones (reference EfficientNetFeatureExtractor wraps
    the net as ``self.model``, models.py:95-101, so keys read
    ``backbone.model._blocks...``) require ``efficientnet_variant`` (the
    ``n`` of ``fcn_efficientnet(n)``) to lay out the block table.
    """
    head_path = _fcn_head_path if head == "fcn" else _deeplab_head_path
    eff_table: list[str] | None = None
    if any(k.startswith("backbone.model._") for k in state_dict):
        if efficientnet_variant is None:
            raise ValueError(
                "EfficientNet backbone checkpoint (backbone.model._* keys)"
                " needs efficientnet_variant=n to map its block table")
        eff_table = _efficientnet_block_table(efficientnet_variant)
    params: dict = {}
    batch_stats: dict = {}
    for name, tensor in state_dict.items():
        if name.endswith("num_batches_tracked"):
            continue
        if eff_table is not None and name.startswith("backbone.model."):
            rest = name[len("backbone.model."):]
            if rest.startswith("_fc."):  # ImageNet head: unused by
                continue  # extract_features (reference models.py:100)
            root = "backbone"
            path = _efficientnet_path(rest, eff_table)
        elif name.startswith("backbone."):
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


def load_torch_checkpoint(path: str, head: str = "fcn",
                          efficientnet_variant: int | None = None) -> dict:
    """Load a reference ``best_model.pt`` via torch-cpu and convert."""
    import torch

    state = torch.load(path, map_location="cpu")
    if isinstance(state, dict) and "state_dict" in state:
        state = state["state_dict"]
    return torch_state_dict_to_variables(
        state, head=head, efficientnet_variant=efficientnet_variant)


def efficientnet_state_dict_to_backbone(state_dict: Mapping[str, Any],
                                        variant: int) -> dict:
    """Convert a *bare* efficientnet_pytorch ImageNet state_dict
    (``EfficientNet.from_pretrained('efficientnet-b{n}')``.state_dict():
    keys ``_conv_stem.weight``, ``_blocks.{j}._*``, ``_conv_head.weight``,
    ``_bn1.*``, ``_fc.*``) into ``{'params': {'backbone': ...},
    'batch_stats': {'backbone': ...}}`` for EfficientNetFeatures — the
    reference's from_pretrained path (models.py:98). ``_fc`` (ImageNet
    classifier) is dropped; feed the result to ``merge_backbone`` or
    ``TrainConfig.backbone_ckpt``.
    """
    prefixed = {f"backbone.model.{k}": v for k, v in state_dict.items()}
    return torch_state_dict_to_variables(
        prefixed, efficientnet_variant=variant)


# --------------------------------------------- ImageNet backbone checkpoints

def torchvision_resnet_to_backbone(state_dict: Mapping[str, Any]) -> dict:
    """Convert a *bare* torchvision ResNet ImageNet state_dict.

    The reference's training entry builds ``fcn_resnet50`` with the
    torchvision default ``pretrained=True`` (reference models.py:127-130,
    called at __main__.py:231) — i.e. it fine-tunes an ImageNet-pretrained
    ResNet-50. A downloaded ``resnet50-*.pth`` has keys without the
    ``backbone.`` prefix (``conv1.weight``, ``layer1.0.conv1.weight``, ...)
    plus the ImageNet classification head ``fc.weight``/``fc.bias``.

    This drops ``fc.*`` and maps everything else into the backbone subtree:
    returns ``{'params': {'backbone': ...}, 'batch_stats': {'backbone':
    ...}}`` ready to merge over a freshly initialized model (dilation
    reuses the same kernels — ``replace_stride_with_dilation`` changes
    stride/dilation attributes only, never weight shapes).
    """
    filtered = {f"backbone.{k}": v for k, v in state_dict.items()
                if not k.startswith("fc.")}
    return torch_state_dict_to_variables(filtered, head="fcn")


def infer_efficientnet_variant(state_dict: Mapping[str, Any]) -> int:
    """Identify b{n} from a bare efficientnet_pytorch state_dict: the head
    conv width narrows it down; the flat block count breaks the b0/b1 tie
    (both have 1280 head channels)."""
    from .efficientnet import EFFICIENTNET_INPLANES

    head_ch = np.asarray(state_dict["_conv_head.weight"]).shape[0]
    n_blocks = 1 + max(int(k.split(".")[1]) for k in state_dict
                       if k.startswith("_blocks."))
    for variant, ch in enumerate(EFFICIENTNET_INPLANES):
        if ch == head_ch and \
                len(_efficientnet_block_table(variant)) == n_blocks:
            return variant
    raise ValueError(f"cannot identify EfficientNet variant: head width "
                     f"{head_ch}, {n_blocks} blocks")


def load_backbone_checkpoint(path: str) -> dict:
    """Load an ImageNet backbone checkpoint — a torchvision ``resnet50``/
    ``resnet101`` or efficientnet_pytorch ``efficientnet-b{n}``
    ``.pth``/``.pt`` state_dict (auto-detected), or an ``.npz`` of the
    same names — and convert for ``TrainConfig.backbone_ckpt``."""
    if path.endswith(".npz"):
        state: Mapping[str, Any] = dict(np.load(path))
    else:
        import torch

        state = torch.load(path, map_location="cpu")
        if isinstance(state, dict) and "state_dict" in state:
            state = state["state_dict"]
        if any(k.startswith("backbone.") for k in state):
            # full SimpleSegmentationModel checkpoint: keep backbone only
            # (EfficientNet wraps the net as .model, models.py:98)
            for prefix in ("backbone.model.", "backbone."):
                if any(k.startswith(prefix) for k in state):
                    state = {k[len(prefix):]: v for k, v in state.items()
                             if k.startswith(prefix)}
                    break
    if any(k.startswith("_conv_stem") for k in state):
        return efficientnet_state_dict_to_backbone(
            state, infer_efficientnet_variant(state))
    return torchvision_resnet_to_backbone(state)


def merge_backbone(variables: Mapping, backbone: Mapping) -> dict:
    """Replace ``variables``' backbone subtree with a converted ImageNet
    backbone, validating that every leaf shape matches the initialized
    model (catches resnet50-vs-101 mixups before any training happens)."""
    import jax

    def check(path, init_leaf, ckpt_leaf):
        if tuple(init_leaf.shape) != tuple(np.asarray(ckpt_leaf).shape):
            name = "/".join(str(getattr(p, "key", p)) for p in path)
            raise ValueError(
                f"backbone checkpoint shape mismatch at {name}: model "
                f"{tuple(init_leaf.shape)} vs checkpoint "
                f"{tuple(np.asarray(ckpt_leaf).shape)}")
        return ckpt_leaf

    out = {}
    for col in ("params", "batch_stats"):
        sub = dict(variables[col])
        sub["backbone"] = jax.tree_util.tree_map_with_path(
            check, variables[col]["backbone"], backbone[col]["backbone"])
        out[col] = sub
    return out


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
