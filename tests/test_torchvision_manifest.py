"""Independent torchvision state_dict manifest (VERDICT r2 #4).

The e2e logit-parity tests compare our flax model against
tools/torch_ref.py — a replica written by the same author, so a shared
misunderstanding of torchvision's architecture could pass silently. This
module pins an INDEPENDENT manifest of the reference model's state dict
(reference models.py:127-139: torchvision resnet50 with
replace_stride_with_dilation=[False, True, True] inside
IntermediateLayerGetter({'layer4': 'out'}), plus the Sequential FCNHead),
derived here from torchvision's published architecture rules, not from
torch_ref.py:

- ResNet-50 stages [3, 4, 6, 3], Bottleneck expansion 4, stem 7x7/64;
- IntermediateLayerGetter drops every module after layer4 (no avgpool/fc);
- torchvision _make_layer: a downsample on a stage's first block iff
  stride != 1 or inplanes != planes*expansion; with dilate=True the
  stage's first block keeps the PREVIOUS dilation and stride becomes 1,
  remaining blocks use the doubled dilation;
- FCNHead = Sequential(conv3x3 no-bias, BN, ReLU, Dropout, conv1x1+bias)
  -> parameter indices 0, 1, 4 (reference models.py:113-124).

Asserted: (a) torch_ref.py's state_dict matches the manifest exactly
(keys AND shapes), (b) torch_ref's conv2 dilation/stride layout matches
_make_layer's rule, (c) models/convert.py maps every manifest key with
nothing unmapped and fully populates the flax variable tree.
"""
import numpy as np
import pytest

STAGES = (3, 4, 6, 3)
EXPANSION = 4
DILATE = (False, True, True)  # replace_stride_with_dilation


def _bn_entries(prefix, c):
    return {
        f"{prefix}.weight": (c,),
        f"{prefix}.bias": (c,),
        f"{prefix}.running_mean": (c,),
        f"{prefix}.running_var": (c,),
        f"{prefix}.num_batches_tracked": (),
    }


def expected_manifest() -> dict[str, tuple]:
    """Every state_dict key -> shape of the reference fcn_resnet50."""
    m = {"backbone.conv1.weight": (64, 3, 7, 7)}
    m.update(_bn_entries("backbone.bn1", 64))
    inplanes = 64
    for stage, blocks in enumerate(STAGES, start=1):
        planes = 64 * 2 ** (stage - 1)
        stride = 1 if stage == 1 else 2
        for b in range(blocks):
            p = f"backbone.layer{stage}.{b}"
            m[f"{p}.conv1.weight"] = (planes, inplanes, 1, 1)
            m.update(_bn_entries(f"{p}.bn1", planes))
            m[f"{p}.conv2.weight"] = (planes, planes, 3, 3)
            m.update(_bn_entries(f"{p}.bn2", planes))
            m[f"{p}.conv3.weight"] = (planes * EXPANSION, planes, 1, 1)
            m.update(_bn_entries(f"{p}.bn3", planes * EXPANSION))
            if b == 0 and (stride != 1 or inplanes != planes * EXPANSION):
                m[f"{p}.downsample.0.weight"] = (
                    planes * EXPANSION, inplanes, 1, 1)
                m.update(_bn_entries(f"{p}.downsample.1",
                                     planes * EXPANSION))
            inplanes = planes * EXPANSION
    # FCNHead(2048, 3): Sequential indices 0 (3x3), 1 (BN), 4 (1x1)
    m["classifier.0.weight"] = (512, 2048, 3, 3)
    m.update(_bn_entries("classifier.1", 512))
    m["classifier.4.weight"] = (3, 512, 1, 1)
    m["classifier.4.bias"] = (3,)
    return m


def expected_dilation_layout():
    """Per-stage (first_block_stride, [conv2 dilation per block]) under
    _make_layer with replace_stride_with_dilation=[False, True, True]."""
    layout = {}
    dilation = 1
    for stage, blocks in enumerate(STAGES, start=1):
        stride = 1 if stage == 1 else 2
        prev = dilation
        if stage > 1 and DILATE[stage - 2]:
            dilation *= stride
            stride = 1
        layout[stage] = (stride, [prev] + [dilation] * (blocks - 1))
    return layout


def test_torch_ref_state_dict_matches_manifest():
    torch = pytest.importorskip("torch")
    del torch
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from torch_ref import fcn_resnet50_torch as build_reference_fcn_resnet50

    model = build_reference_fcn_resnet50()
    sd = model.state_dict()
    manifest = expected_manifest()
    missing = sorted(set(manifest) - set(sd))
    extra = sorted(set(sd) - set(manifest))
    assert not missing, f"torch_ref lacks manifest keys: {missing[:8]}"
    assert not extra, f"torch_ref has non-torchvision keys: {extra[:8]}"
    for key, shape in manifest.items():
        assert tuple(sd[key].shape) == shape, (
            f"{key}: torch_ref {tuple(sd[key].shape)} != manifest {shape}")


def test_torch_ref_dilation_layout():
    pytest.importorskip("torch")
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from torch_ref import fcn_resnet50_torch as build_reference_fcn_resnet50

    model = build_reference_fcn_resnet50()
    layout = expected_dilation_layout()
    for stage, (first_stride, dils) in layout.items():
        blocks = getattr(model.backbone, f"layer{stage}")
        assert len(blocks) == len(dils)
        for b, block in enumerate(blocks):
            want_stride = first_stride if b == 0 else 1
            assert block.conv2.stride == (want_stride, want_stride), (
                f"layer{stage}.{b} stride")
            assert block.conv2.dilation == (dils[b], dils[b]), (
                f"layer{stage}.{b} dilation: {block.conv2.dilation} "
                f"!= {dils[b]}")
            assert block.conv2.padding == (dils[b], dils[b])


def test_convert_maps_full_manifest():
    """convert.py must consume every manifest key (it raises on unmapped
    input keys) and fully populate the flax variable tree (same paths and
    shapes as a fresh init)."""
    torch = pytest.importorskip("torch")
    import jax
    import jax.numpy as jnp
    from flax.traverse_util import flatten_dict
    from neuralbarkcalculator_tpu.models.convert import (
        torch_state_dict_to_variables)
    from neuralbarkcalculator_tpu.models.segmentation import fcn_resnet50

    manifest = expected_manifest()
    sd = {k: torch.zeros(s) for k, s in manifest.items()}
    variables = torch_state_dict_to_variables(sd, head="fcn")

    model = fcn_resnet50(dropout=0.0)
    template = model.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 64, 64, 3)), train=False)
    got = {col: flatten_dict(variables[col]) for col in template}
    want = {col: flatten_dict(template[col]) for col in template}
    for col in want:
        missing = sorted(set(want[col]) - set(got[col]))
        extra = sorted(set(got[col]) - set(want[col]))
        assert not missing, (col, missing[:8])
        assert not extra, (col, extra[:8])
        for path in want[col]:
            assert np.shape(got[col][path]) == np.shape(want[col][path]), (
                col, path)
