"""Folder dataset: manifest scan, image loading, label decoding.

Host-side IO layer replacing the reference ``RegressionDatasetFolder``
(dataset.py:93-212) and ``make_dataset`` (dataset.py:41-74): walks
``root/samples/<wood_type>/`` (required) and pairs each sample with
``root/duals/<wood_type>/<name .bmp->.png>`` when present. Images decode to
float32 [0,1] numpy arrays (HWC for samples, HW for targets) ready for
batched device transfer; the augmentation itself runs on device
(data/augment.py), so this layer stays deliberately thin.

Label decoding parity (dataset.py:188-198): dual PNGs store
{0, 127, 255}; after /255 scaling, ``round(target * 2)`` yields classes
{0, 1, 2}. Missing target -> all-zero mask (dataset.py:199-200).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Callable, Iterator, Sequence

import numpy as np
from PIL import Image

from ..config import IMG_EXTENSIONS, WOOD_TYPES


def has_file_allowed_extension(filename: str,
                               extensions: Sequence[str]) -> bool:
    """Reference dataset.py:19-28 parity (note: 'webp' has no dot there)."""
    filename_lower = filename.lower()
    return any(filename_lower.endswith(ext) for ext in extensions)


@dataclasses.dataclass(frozen=True)
class Record:
    sample_path: str
    target_path: str  # "" when absent
    fname: str  # sample name with bmp -> png
    wood_type: str


def make_dataset(root: str,
                 extensions: Sequence[str] = IMG_EXTENSIONS) -> list[Record]:
    """Scan root/samples/<wood_type> (+ optional root/duals), sorted.

    Parity with reference make_dataset_for_dir (dataset.py:41-68), including
    the IOError when 'samples' is missing and the bmp->png target rename.
    """
    root = os.path.expanduser(root)
    samples_dir = os.path.join(root, "samples")
    targets_dir = os.path.join(root, "duals")
    if not os.path.isdir(samples_dir):
        raise IOError("Root folder should have a 'samples' subfolder !")

    records = []
    for wood_type in WOOD_TYPES:
        samples_type_dir = os.path.join(samples_dir, wood_type)
        targets_type_dir = os.path.join(targets_dir, wood_type)
        for _, _, fnames in sorted(os.walk(samples_type_dir)):
            for fname in sorted(fnames):
                if not has_file_allowed_extension(fname, extensions):
                    continue
                sample_path = os.path.join(samples_type_dir, fname)
                out_name = fname.replace("bmp", "png")
                target_path = os.path.join(targets_type_dir, out_name)
                if not os.path.isfile(target_path):
                    target_path = ""
                records.append(Record(sample_path, target_path, out_name,
                                      wood_type))
    return records


def load_image(path: str, grayscale: bool = False) -> np.ndarray | None:
    """PIL decode to float32 [0,1]; RGB -> [H,W,3], L -> [H,W].

    Parity with pil_loader (dataset.py:82-90) + ToTensor scaling.
    """
    if not path or not os.path.isfile(path):
        return None
    with open(path, "rb") as f:
        img = Image.open(f)
        img = img.convert("L" if grayscale else "RGB")
        return np.asarray(img, dtype=np.float32) / 255.0


def decode_label(target: np.ndarray | None,
                 shape: tuple[int, int]) -> np.ndarray:
    """Float [0,1] dual image -> int32 class map {0,1,2}
    (dataset.py:188-200)."""
    if target is None:
        return np.zeros(shape, dtype=np.int32)
    t = target
    if t.max() > 200:  # raw 0..255 input (never for /255-scaled floats)
        t = t / 255.0
    return np.rint(t * 2.0).astype(np.int32)


def load_image_u8(path: str, grayscale: bool = False) -> np.ndarray | None:
    """PIL decode to uint8; RGB -> [H,W,3], L -> [H,W]. The uint8 twin of
    ``load_image`` for pipelines that normalize on device (4x less
    host->device traffic)."""
    if not path or not os.path.isfile(path):
        return None
    with open(path, "rb") as f:
        img = Image.open(f)
        img = img.convert("L" if grayscale else "RGB")
        return np.asarray(img, dtype=np.uint8)


def save_image_u8(path: str, img: np.ndarray) -> None:
    """Save float [0,1] (HWC or HW) or uint8 array as PNG/BMP via PIL."""
    if img.dtype != np.uint8:
        img = np.rint(np.clip(img, 0.0, 1.0) * 255.0).astype(np.uint8)
    mode = "L" if img.ndim == 2 else "RGB"
    Image.fromarray(img, mode=mode).save(path)


class BarkDataset:
    """Minimal indexed dataset over a manifest, with optional in-memory
    caching (parity feature: reference dataset.py:146-160) and an optional
    per-item host transform (e.g. precomputed pad_resize for training)."""

    def __init__(self, root: str, in_memory: bool = False,
                 host_transform: Callable[[np.ndarray, np.ndarray],
                                          tuple[np.ndarray, np.ndarray]]
                 | None = None):
        self.records = make_dataset(root)
        if not self.records:
            raise RuntimeError(
                "Found 0 files in subfolders of: " + root + "\n"
                "Supported extensions are: " + ",".join(IMG_EXTENSIONS))
        self.host_transform = host_transform
        self._cache: list | None = None
        if in_memory:
            self._cache = [self._load(i) for i in range(len(self.records))]

    def _load(self, index: int):
        rec = self.records[index]
        sample = load_image(rec.sample_path)
        raw_target = load_image(rec.target_path, grayscale=True)
        target = decode_label(raw_target, sample.shape[:2])
        if self.host_transform is not None:
            sample, target = self.host_transform(sample, target)
        return sample, target

    def __len__(self) -> int:
        return len(self.records)

    def __getitem__(self, index: int):
        if self._cache is not None:
            sample, target = self._cache[index]
        else:
            sample, target = self._load(index)
        rec = self.records[index]
        return sample, target, rec.fname, rec.wood_type

    def iter_records(self) -> Iterator[Record]:
        return iter(self.records)

    def print_filenames(self) -> None:
        """Reference RegressionDatasetFolder.print_filenames parity
        (called at __main__.py:271)."""
        for rec in self.records:
            print(rec.fname)
