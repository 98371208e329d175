"""Training-math parity vs torch autograd.

The strongest training-path test: the gradient of the Lovász-Softmax loss
— both w.r.t. logits directly and end-to-end through the converted
fcn_resnet50 — must match a torch implementation written from the Berman
2018 algorithm (the same one the reference vendors). Catches sort/stop-
gradient mistakes in the loss, conv/BN backward layout bugs, and
train-mode BN semantics in one shot.
"""
import sys
from pathlib import Path

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))


def torch_lovasz_softmax(logits, labels, num_classes=3):
    """Lovász-Softmax in torch (per_image=False, classes='present'),
    written from Berman 2018 Alg. 1 — used as the autograd oracle."""
    probas = torch.softmax(logits, dim=-1).reshape(-1, num_classes)
    flat = labels.reshape(-1)
    losses = []
    for c in range(num_classes):
        fg = (flat == c).float()
        if fg.sum() == 0:
            continue
        errors = (fg - probas[:, c]).abs()
        errors_sorted, perm = torch.sort(errors, descending=True)
        fg_sorted = fg[perm]
        gts = fg_sorted.sum()
        intersection = gts - fg_sorted.cumsum(0)
        union = gts + (1 - fg_sorted).cumsum(0)
        jaccard = 1.0 - intersection / union
        jaccard[1:] = jaccard[1:] - jaccard[:-1]
        losses.append(torch.dot(errors_sorted, jaccard.detach()))
    return torch.stack(losses).mean()


def test_lovasz_value_and_grad_wrt_logits():
    import jax
    import jax.numpy as jnp
    from neuralbarkcalculator_tpu.ops.losses import lovasz_softmax_loss

    rng = np.random.default_rng(0)
    logits = rng.normal(size=(2, 12, 12, 3)).astype(np.float32)
    labels = rng.integers(0, 3, size=(2, 12, 12))

    t_logits = torch.tensor(logits, requires_grad=True)
    t_loss = torch_lovasz_softmax(t_logits, torch.tensor(labels))
    t_loss.backward()

    j_loss, j_grad = jax.value_and_grad(lovasz_softmax_loss)(
        jnp.asarray(logits), jnp.asarray(labels))

    assert abs(float(j_loss) - float(t_loss)) < 1e-6
    np.testing.assert_allclose(np.asarray(j_grad),
                               t_logits.grad.numpy(),
                               rtol=1e-4, atol=1e-6)


@pytest.mark.slow
def test_end_to_end_training_grad_parity():
    """d(loss)/d(params) through the whole converted fcn_resnet50 in train
    mode (BN batch stats, dropout off) matches torch autograd.

    Uses the (everywhere-smooth) Jaccard loss: Lovász contains a sort and
    CWE an argmax — forward logits that differ by float noise (~1e-6)
    flip those discrete choices and legitimately reroute per-pixel
    gradients; their own d/dlogits parity is covered above / in
    test_losses.py on tie-free inputs.
    """
    import jax
    import jax.numpy as jnp
    from torch_ref import fcn_resnet50_torch

    from neuralbarkcalculator_tpu.models.convert import (
        torch_state_dict_to_variables)
    from neuralbarkcalculator_tpu.models.segmentation import fcn_resnet50
    from neuralbarkcalculator_tpu.ops.losses import jaccard_loss

    torch.manual_seed(0)
    tm = fcn_resnet50_torch(dropout=0.0)
    tm.train()
    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 3, 64, 64)).astype(np.float32)
    y = rng.integers(0, 3, size=(2, 64, 64))

    def torch_jaccard(logits_nhwc, labels, eps=1e-7):
        """JaccardLoss oracle (reference utils.py:168-182)."""
        probas = torch.softmax(logits_nhwc, dim=-1)
        one_hot = torch.nn.functional.one_hot(labels, 3).float()
        dims = (0, 1, 2)
        intersection = (probas * one_hot).sum(dims)
        cardinality = (probas + one_hot).sum(dims)
        union = cardinality - intersection
        return 1.0 - (intersection / (union + eps)).mean()

    t_logits = tm(torch.tensor(x))
    t_loss = torch_jaccard(t_logits.permute(0, 2, 3, 1), torch.tensor(y))
    t_loss.backward()

    variables = torch_state_dict_to_variables(
        {k: v for k, v in tm.state_dict().items()
         if not k.endswith("num_batches_tracked")})
    model = fcn_resnet50(dropout=0.0)

    def loss_fn(params):
        logits, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            jnp.asarray(x.transpose(0, 2, 3, 1)), train=True,
            mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(0)})
        return jaccard_loss(logits, jnp.asarray(y))

    j_loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert abs(float(j_loss) - float(t_loss.detach())) < 1e-5

    # Gradient agreement degrades with backward depth because train-mode
    # BN batch statistics amplify f32 noise (measured: torch's own
    # f32-vs-f64 train logits differ by 1e-4 on this input — the same
    # noise class as ours-vs-torch). The head (no BN between it and the
    # loss) must match near-exactly; deeper tensors by direction/norm.
    checks = [
        # (flax path, torch name, max relative-L2, min cosine)
        (("classifier", "conv2", "bias"), "classifier.4.bias",
         1e-3, 1.0 - 1e-6),
        (("classifier", "conv1", "kernel"), "classifier.0.weight",
         0.1, 0.999),
        (("backbone", "layer4_2", "conv3", "kernel"),
         "backbone.layer4.2.conv3.weight", 0.1, 0.999),
        (("backbone", "layer2_1", "conv2", "kernel"),
         "backbone.layer2.1.conv2.weight", 0.15, 0.998),
        (("backbone", "conv1", "kernel"), "backbone.conv1.weight",
         0.15, 0.998),
        (("backbone", "bn1", "scale"), "backbone.bn1.weight",
         0.15, 0.998),
    ]
    t_params = dict(tm.named_parameters())
    for flax_path, torch_name, max_rel, min_cos in checks:
        g = grads
        for key in flax_path:
            g = g[key]
        g = np.asarray(g, np.float64)
        tg = t_params[torch_name].grad.numpy().astype(np.float64)
        if g.ndim == 4:  # conv kernel layout
            tg = tg.transpose(2, 3, 1, 0)
        rel = np.linalg.norm(g - tg) / (np.linalg.norm(tg) + 1e-30)
        cos = float((g * tg).sum()
                    / (np.linalg.norm(g) * np.linalg.norm(tg) + 1e-30))
        assert rel < max_rel, f"{torch_name}: relL2 {rel}"
        assert cos > min_cos, f"{torch_name}: cos {cos}"
