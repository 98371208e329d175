"""Central configuration for the TPU-native bark calculator.

Every constant here is pinned to the reference implementation so behaviour is
reproducible (citations are file:line into /root/reference/):

- normalization (inference): models.py:208-209
- normalization (training, cached): utils.py:45-46
- mm^2 per pixel calibration: models.py:210
- class weights (nothing/bark/node): utils.py:73
- small-zone removal threshold + connectivity: utils.py:140-143
- preprocess target size: models.py:170
- trim_black thresholds: models.py:157-166
- wood types: dataset.py:50, predict.py:15
- training recipe: __main__.py:234-269
- splits: utils.py:76-115
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

WOOD_TYPES = ("epinette_gelee", "epinette_non_gelee", "sapin")
CLASS_NAMES = ("Nothing", "Bark", "Node")
NUM_CLASSES = 3

# Inference-time normalization constants (reference models.py:208-209).
DEFAULT_MEAN = (0.7399, 0.6139, 0.4401)
DEFAULT_STD = (0.1068, 0.1272, 0.1271)

# Training-time cached dataset statistics (reference utils.py:45-46).
TRAIN_MEAN = (0.7358871102333069, 0.6107082366943359, 0.4379482865333557)
TRAIN_STD = (0.11245555430650711, 0.12965525686740875, 0.12750858068466187)

# Area of one pixel in mm^2 at the calibrated capture scale (models.py:210).
DEFAULT_MM_PER_PIXEL = 3.6 * 3.6

# Inverse-frequency class weights for the weighted CE loss (utils.py:73).
CLASS_WEIGHTS = (0.4004, 2.0334, 93.1921)

# Connected-component postprocess (utils.py:140-143). NB: README says 100 but
# the code uses 150; the code wins (SURVEY.md section 6).
SMALL_ZONE_THRESHOLD = 150
SMALL_ZONE_CONNECTIVITY = 2  # 8-connectivity

# Preprocessing (models.py:157-201).
PREPROCESS_TARGET_SIZE = 1024
TRIM_PIXEL_THRESHOLD = 1e-3  # channel-sum > this counts as non-black
TRIM_ROW_FRACTION = 0.85  # row kept if > this fraction of pixels non-black

IMG_EXTENSIONS = (
    ".jpg", ".jpeg", ".png", ".ppm", ".bmp", ".pgm", ".tif", ".tiff", "webp",
)


@dataclasses.dataclass
class TrainConfig:
    """Training hyperparameters, defaults pinned to __main__.py:234-269."""

    seed: int = 42
    lr: float = 5e-4
    weight_decay: float = 2e-3  # torch-Adam style L2 (added to grads)
    crop_size: int = 512
    batch_size: int = 5
    epochs: int = 30
    dropout: float = 0.8  # __main__.py:231
    # Sampling: WeightedRandomSampler num_samples = len(train)*12
    # (__main__.py:168-171), drop_last=True.
    samples_per_epoch_factor: int = 12
    # ReduceLROnPlateau (__main__.py:245-250)
    plateau_factor: float = 0.2
    plateau_patience: int = 3
    plateau_threshold: float = 1e-1  # absolute threshold mode
    # EarlyStopping (__main__.py:253-257)
    early_stop_min_delta: float = 1e-1
    early_stop_patience: int = 8
    monitor: str = "val_miou"  # __main__.py:241
    monitor_mode: str = "max"
    # Augmentation (__main__.py:155-166)
    jitter_saturation: float = 0.2
    jitter_brightness: float = 0.1
    pad_resize_size: int = 1024
    # Splits (utils.py:77-79)
    train_percent: float = 0.8
    valid_percent: float = 0.1
    # TPU-native addition: the per-train-batch F1 log's in-metric
    # connected-component postprocess costs ~5x the fwd+bwd step; True
    # restores exact reference batch logging (val/test F1 always
    # postprocesses regardless).
    train_f1_postprocess: bool = False
    # bf16 activations/conv compute for training (params stay f32). Off by
    # default: the reference recipe trains f32 and checkpoint-reproducible
    # training is a parity goal; flip for ~memory/VPU savings.
    use_bfloat16: bool = False
    # Keep the whole uint8 dataset in device HBM (steps ship only indices;
    # ~4 MB/image-pair at 1024^2). Set False when the corpus exceeds HBM:
    # batches are then assembled on host and transferred per step.
    device_resident_data: bool = True
    # ImageNet-pretrained backbone initialization: the reference fine-tunes
    # from torchvision pretrained=True (models.py:127-130 via
    # __main__.py:231). Point this at a bare torchvision resnet50/101
    # ImageNet state_dict (.pth/.pt/.npz); the backbone subtree of the
    # freshly initialized model is replaced before training
    # (models/convert.py:torchvision_resnet_to_backbone).
    backbone_ckpt: str | None = None


@dataclasses.dataclass
class PredictConfig:
    """Inference configuration, defaults pinned to models.py:206-228."""

    model_path: str = "./best_model.pt"
    mean: Sequence[float] = DEFAULT_MEAN
    std: Sequence[float] = DEFAULT_STD
    target_size: int = PREPROCESS_TARGET_SIZE
    mm_per_pix: float = DEFAULT_MM_PER_PIXEL
    exclude_nodes: bool = False
    # TPU-native additions (do not change reference-visible semantics):
    batch_size: int = 8  # images per device step (reference is 1/sequential)
    pad_batch_pow2: bool = True  # pad partial launch batches (folder tails,
    # serving micro-batches) up the {1,2,4,...,batch_size} ladder with
    # dummy rows so every arrival count reuses one of a handful of
    # compiled programs — each distinct batch size is otherwise a fresh
    # XLA compile (tens of seconds), which under mixed serving load is
    # catastrophic (measured: 8-client serving p95 went 115 s -> sub-second
    # once sizes 2..7 stopped compiling). Dummy rows are dropped before
    # postprocess; results are bit-identical either way
    height_bucket: int = 128  # pad trimmed heights up to a multiple of this
    fixed_pad_height: int | None = None  # pin EVERY ragged launch to this
    # pad height (must be a multiple of height_bucket). Serving sets 1024:
    # dark-band trim gives each request a content-dependent height, and a
    # height bucket nobody warmed is a 20-40 s XLA compile stalling every
    # queued request; padding to one fixed height is bit-exact (ragged row
    # masking, tests/test_ragged.py) at up to `bucket/fixed` extra compute.
    # Heights above it fall back to normal bucketing. Folder jobs keep
    # None: buckets amortize over many images and cost less compute.
    figure_dpi: int = 200  # reference hardcodes 900 (models.py:346);
    # ours is configurable because dpi=900 dominates reference wall-time.
    use_bfloat16: bool = True  # run the conv stack in bf16 on the MXU
    use_pallas: bool = True  # fused upsample+argmax kernel (TPU backend
    # only; other backends use the unfused XLA path automatically)
    pallas_interpret: bool = False  # run the Pallas kernel in interpret
    # mode on non-TPU backends (tests / multichip dryrun on a CPU mesh)
    renderer: str = "fast"  # combined-figure renderer: "fast" =
    # first-party compositor (pipeline/compositor.py, same layout,
    # ~8x cheaper); "mpl" = matplotlib Agg (reference byte-style output)
    fold_bn: bool = True  # constant-fold eval-mode BatchNorm (and its
    # batch_stats) into conv kernels+biases at load (models/fold.py) —
    # removes every BN elementwise pass from the inference graph;
    # backbones without fold support fall back to the unfolded forward
    quantize_int8: bool = False  # opt-in int8 inference: post-training
    # per-channel weight + static activation quantization calibrated on
    # the first chunk (models/quantize.py). ~1.6-2x faster device step
    # (benchmarks/int8_probe.json) but APPROXIMATE — class maps can
    # differ from f32 on a small fraction of boundary pixels, so the
    # default stays on the exact bf16 path
    prefetch: int = 2  # chunks in flight in the predict pump: each holds
    # its host batch + device buffers + pulled maps (~30 MB per chunk of
    # 8 at 1024^2), and higher values keep a slow host<->device link busy
    # across the decode/upload/pull/render streams
    pipelined_uploads: bool = True  # single-device meshes: upload each
    # chunk as two device_put groups so the first transfer starts after
    # a few decodes instead of after the whole chunk (dead link time at
    # every chunk head on a bandwidth-bound host<->device path)
    compiler_options: dict | None = None  # extra XLA:TPU options merged
    # over the device step's defaults (predict.py::_build_device_step
    # already sets xla_tpu_scoped_vmem_limit_kib for the Pallas step;
    # entries here win on key collisions). Escape hatch for deployment
    # tuning — measured on this stack the accepted knobs are neutral
    # for inference (benchmarks/inference_opts.json), and unknown keys
    # are rejected at compile time by the server-side compiler.
    effnet_bucket_heights: bool = False  # EfficientNet backbones can't
    # run masked ragged batches exactly (TF-SAME stride phase,
    # models/efficientnet.py), so by default they compile one program
    # per DISTINCT trimmed height — unbounded warmup on height-diverse
    # folders. This opt-in pads EfficientNet inputs up to the height
    # bucket with EDGE-REPLICATED rows instead (<= 8 programs like the
    # ResNet path), trading exactness for bounded compiles: the whole
    # map becomes APPROXIMATE — squeeze-excite global-pools the feature
    # map, so pad rows perturb every pixel's SE scale slightly, flipping
    # near-tie argmax pixels (tests/test_efficientnet.py bounds the
    # effect; exact when heights already sit on the bucket). ResNet
    # backbones ignore this (their ragged batching is bit-exact).
