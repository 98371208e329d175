"""Model parity tests: Flax NHWC model vs the torch reference architecture.

The strongest correctness test in the suite: a randomly initialized torch
replica of the reference fcn_resnet50 (exact torchvision naming) is
converted with models/convert.py and must produce the same logits as our
Flax model — validating conv arithmetic, dilation layout, BN, the FCN head,
and the bicubic upsample end to end.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from torch_ref import fcn_resnet50_torch  # noqa: E402

from neuralbarkcalculator_tpu.models.convert import (  # noqa: E402
    torch_state_dict_to_variables,
)
from neuralbarkcalculator_tpu.models.segmentation import (  # noqa: E402
    fcn_resnet50,
)


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(0)
    model = fcn_resnet50_torch()
    # Perturb BN running stats away from init so mapping bugs can't hide.
    model.train()
    with torch.no_grad():
        for _ in range(2):
            model(torch.randn(2, 3, 64, 64))
    model.eval()
    return model


def test_forward_parity_with_torch(torch_model):
    x = np.random.default_rng(1).normal(
        size=(1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = torch_model(torch.from_numpy(x)).numpy()

    variables = torch_state_dict_to_variables(torch_model.state_dict())
    model = fcn_resnet50()
    got = model.apply(variables, x.transpose(0, 2, 3, 1), train=False)
    got = np.asarray(got).transpose(0, 3, 1, 2)

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)
    # argmax masks must agree everywhere (what actually matters downstream)
    np.testing.assert_array_equal(got.argmax(1), want.argmax(1))


def test_output_stride_8(torch_model):
    variables = torch_state_dict_to_variables(torch_model.state_dict())
    model = fcn_resnet50()
    import jax.numpy as jnp
    feat = model.backbone.bind(
        {"params": variables["params"]["backbone"],
         "batch_stats": variables["batch_stats"]["backbone"]},
    )(jnp.zeros((1, 64, 64, 3)), train=False)
    assert feat.shape == (1, 8, 8, 2048)  # 64/8, channels 2048


def test_init_and_param_count():
    import jax

    model = fcn_resnet50()
    variables = model.init(jax.random.PRNGKey(0),
                           np.zeros((1, 32, 32, 3), np.float32))
    n_params = sum(x.size for x in jax.tree.leaves(variables["params"]))
    # torchvision fcn_resnet50 (no aux) with 3 classes: ~33M weights + BN
    assert 32_000_000 < n_params < 36_000_000


def test_train_mode_updates_batch_stats():
    import jax

    model = fcn_resnet50(dropout=0.5)
    x = np.random.default_rng(0).normal(size=(2, 32, 32, 3)).astype(
        np.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    out, mutated = model.apply(
        variables, x, train=True,
        mutable=["batch_stats"],
        rngs={"dropout": jax.random.PRNGKey(1)})
    assert out.shape == (2, 32, 32, 3)
    before = variables["batch_stats"]["backbone"]["bn1"]["mean"]
    after = mutated["batch_stats"]["backbone"]["bn1"]["mean"]
    assert not np.allclose(np.asarray(before), np.asarray(after))


def test_roundtrip_conversion(torch_model):
    """torch -> flax -> torch must be the identity on every tensor."""
    from neuralbarkcalculator_tpu.models.convert import (
        variables_to_torch_state_dict)

    sd = {k: v for k, v in torch_model.state_dict().items()
          if not k.endswith("num_batches_tracked")}
    variables = torch_state_dict_to_variables(sd)
    back = variables_to_torch_state_dict(variables)
    assert set(back) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k].numpy())


def test_imagenet_backbone_conversion(torch_model, tmp_path):
    """ImageNet fine-tuning path (reference pretrained=True,
    models.py:127-130): a *bare* torchvision-style resnet50 state_dict
    (no 'backbone.' prefix, with the ImageNet fc head) converts and the
    resulting backbone features match torch to f32 rounding."""
    import jax
    import jax.numpy as jnp

    from neuralbarkcalculator_tpu.models.convert import (
        load_backbone_checkpoint, merge_backbone,
        torchvision_resnet_to_backbone)

    bare = dict(torch_model.backbone.state_dict())
    bare["fc.weight"] = torch.randn(1000, 2048)  # dropped by conversion
    bare["fc.bias"] = torch.randn(1000)
    path = str(tmp_path / "resnet50_imagenet.pth")
    torch.save(bare, path)

    model = fcn_resnet50()
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    merged = merge_backbone(variables, load_backbone_checkpoint(path))

    x = np.random.default_rng(5).normal(
        size=(1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = torch_model.backbone(torch.from_numpy(x))["out"].numpy()
    got = model.backbone.apply(
        {"params": merged["params"]["backbone"],
         "batch_stats": merged["batch_stats"]["backbone"]},
        x.transpose(0, 2, 3, 1), train=False)
    got = np.asarray(got).transpose(0, 3, 1, 2)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)

    # head params untouched (still the fresh init)
    np.testing.assert_array_equal(
        np.asarray(variables["params"]["classifier"]["conv1"]["kernel"]),
        np.asarray(merged["params"]["classifier"]["conv1"]["kernel"]))

    # .npz round (no-torch environments) must convert identically
    npz = str(tmp_path / "resnet50_imagenet.npz")
    np.savez(npz, **{k: v.numpy() for k, v in bare.items()})
    from_npz = load_backbone_checkpoint(npz)
    direct = torchvision_resnet_to_backbone(
        {k: v.numpy() for k, v in bare.items()})
    for col in ("params", "batch_stats"):
        a = jax.tree_util.tree_leaves(from_npz[col])
        b = jax.tree_util.tree_leaves(direct[col])
        assert all(np.array_equal(x, y) for x, y in zip(a, b))


def test_backbone_shape_mismatch_raises(torch_model, tmp_path):
    """A wrong-architecture backbone checkpoint must fail loudly at merge
    time, not at train time."""
    import jax
    import jax.numpy as jnp

    from neuralbarkcalculator_tpu.models.convert import (
        merge_backbone, torchvision_resnet_to_backbone)

    bare = {k: v.numpy() for k, v in
            torch_model.backbone.state_dict().items()}
    bare["conv1.weight"] = bare["conv1.weight"][:, :1]  # corrupt shape
    converted = torchvision_resnet_to_backbone(bare)

    model = fcn_resnet50()
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    with pytest.raises(ValueError, match="shape mismatch"):
        merge_backbone(variables, converted)
