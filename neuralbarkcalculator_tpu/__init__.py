"""neuralbarkcalculator_tpu: a TPU-native (JAX/XLA/Pallas/pjit) rebuild of
TortillasAlfred/NeuralBarkCalculator.

Layer map (bottom-up):
- ``ops``       resize / trim / connected-components / losses / metrics,
                all jittable with static shapes
- ``models``    Flax model zoo (dilated ResNet-50/101 FCN + DeepLabV3,
                EfficientNet variants) with torch checkpoint conversion
- ``data``      folder manifest dataset, device-side paired augmentation,
                stratified splits and samplers
- ``parallel``  device mesh + sharding vocabulary (dp over 'data', spatial
                width partitioning over 'model')
- ``io``        native C++ runtime bindings (codecs, union-find
                postprocess) with PIL fallbacks
- ``pipeline``  preprocess -> batched folder inference -> artifacts
- ``train``     Experiment harness (torch-parity Adam, plateau/early-stop,
                orbax checkpoints, evaluation report)
- ``cli``       reference-flag-compatible predict/train entry points

Heavy imports (jax, flax, matplotlib) stay inside submodules; importing
the package root is cheap.
"""
__version__ = "0.1.0"

from .config import PredictConfig, TrainConfig  # noqa: F401

__all__ = ["PredictConfig", "TrainConfig", "__version__"]
