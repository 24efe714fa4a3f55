"""Datasets and the packed-array loader.

The reference re-reads and re-crops NIfTIs from disk on every training step
with num_workers=0 (`unet/utils/dataset.py:105-139`, SURVEY.md §3.1 — its
single biggest performance bug). Here the decode+preprocess runs ONCE:
`pack_pairs` writes a memory-mapped fp16 array of shape (N, 2, D, H, W)
plus a covariate matrix, and `BatchLoader` streams shuffled batches with
host->device prefetch. The NIfTI-backed datasets keep the reference's
__getitem__ contract for tooling and for packing.

Datasets:
  PairedVolumeDataset  == pair_PET_T1dataset (dataset.py:14-143)
  PairedLatentDataset  == pair_PETlatent_T1_dataset (dataset.py:145-248)
  MCIClassificationDataset == pair_MRI_dataset_only_mci
                          (pet_for_classification/dataset.py:16-168)
"""

from __future__ import annotations

import csv
import json
import os
from dataclasses import dataclass
from typing import Dict, Iterator, List, Mapping, Optional, Sequence, Tuple

import numpy as np

from cips_tpu.data import nifti
from cips_tpu.data.covariates import covariate_vector
from cips_tpu.data.manifest import PairRow, read_manifest

CROP_SIZE = (96, 128, 96)  # the working volume (train_unet.py:111)

_NATIVE = None
_NATIVE_CHECKED = False


def _native():
    """The C++ decode runtime, or None when the toolchain is unavailable."""
    global _NATIVE, _NATIVE_CHECKED
    if not _NATIVE_CHECKED:
        _NATIVE_CHECKED = True
        try:
            from cips_tpu.runtime import native

            if native.available():
                _NATIVE = native
        except Exception:
            _NATIVE = None
    return _NATIVE


def pad_crop_np(img: np.ndarray, target: Sequence[int]) -> np.ndarray:
    """Symmetric pad then center crop (MONAI SpatialPad+CenterSpatialCrop,
    dataset.py:81-83), numpy host-side version of ops.volume.pad_crop_to."""
    pads = []
    for cur, tgt in zip(img.shape, target):
        if cur < tgt:
            total = tgt - cur
            pads.append((total // 2, total - total // 2))
        else:
            pads.append((0, 0))
    img = np.pad(img, pads)
    slices = []
    for cur, tgt in zip(img.shape, target):
        start = (cur - tgt) // 2
        slices.append(slice(start, start + tgt))
    return img[tuple(slices)]


def max_normalize_np(img: np.ndarray, eps: float = 1e-12) -> np.ndarray:
    m = float(img.max())
    return img / max(m, eps)


def _first_file(folder: str) -> Optional[str]:
    if not os.path.isdir(folder):
        return None
    entries = sorted(os.listdir(folder))
    for e in entries:
        p = os.path.join(folder, e)
        if os.path.isfile(p):
            return p
    return None


@dataclass
class Sample:
    t1: np.ndarray  # (D, H, W) float32, max-normalised
    pet: np.ndarray  # (D, H, W) float32, max-normalised
    info: np.ndarray  # (K,) float32 covariates (possibly empty)
    subject: str
    t1_date: str
    pet_date: str


class PairedVolumeDataset:
    """CSV-driven paired T1/PET dataset (pair_PET_T1dataset contract).

    Scans {dir}/{Subject}/{date}/ and takes the first file; skips rows whose
    directories are missing (dataset.py:55-63). `pet_name` pins a specific
    filename (used to read synthesized `rec.nii.gz`).
    """

    def __init__(
        self,
        info_csv: str,
        pet_dir: str,
        t1_dir: str,
        crop_size: Sequence[int] = CROP_SIZE,
        need_values: Sequence[str] = (),
        min_and_max: Optional[Mapping[str, Tuple[float, float]]] = None,
        pet_name: Optional[str] = None,
        invert_abeta: bool = False,
        resize_size: Optional[Sequence[int]] = None,
        random_crop_size: Optional[Sequence[int]] = None,
        seed: int = 0,
    ):
        self.crop_size = tuple(crop_size)
        self.resize_size = tuple(resize_size) if resize_size else None
        # RandSpatialCrop(random_size=False, random_center=True) training
        # augmentation (unet/utils/dataset.py:85-87): one random offset
        # applied JOINTLY to t1+pet, max-norm after the crop.
        self.random_crop_size = tuple(random_crop_size) if random_crop_size else None
        self._crop_rng = np.random.default_rng(seed)
        self.need_values = list(need_values)
        self.min_and_max = dict(min_and_max or {})
        self.invert_abeta = invert_abeta
        self.rows: List[PairRow] = []
        self.paths: List[Tuple[str, str]] = []
        for row in read_manifest(info_csv):
            t1_folder = os.path.join(t1_dir, row.subject, row.t1_date)
            pet_folder = os.path.join(pet_dir, row.subject, row.pet_date)
            t1_path = _first_file(t1_folder)
            if pet_name is not None:
                pet_path = os.path.join(pet_folder, pet_name)
                if not os.path.isfile(pet_path):
                    pet_path = None
            else:
                pet_path = _first_file(pet_folder)
            if t1_path is None or pet_path is None:
                continue
            self.rows.append(row)
            self.paths.append((t1_path, pet_path))

    def __len__(self) -> int:
        return len(self.rows)

    def _load(self, path: str, normalize: bool = True) -> np.ndarray:
        """Decode + pad/crop [+ resize] [+ max-normalise], via the native C++
        runtime when available (single fused pass), else pure Python.
        ``resize_size`` reproduces pair_PET_T1dataset's optional Resize
        (dataset.py:88-90)."""
        if self.resize_size is None and _native() is not None:
            try:
                return _native().decode(path, self.crop_size, normalize=normalize)
            except Exception:
                pass
        vol = nifti.read_array(path).astype(np.float32)
        vol = pad_crop_np(vol, self.crop_size)
        if self.resize_size is not None:
            import jax.numpy as jnp

            from cips_tpu.ops.resample import resize_trilinear

            vol = np.asarray(resize_trilinear(jnp.asarray(vol), self.resize_size))
        return max_normalize_np(vol) if normalize else vol

    def __getitem__(self, index: int) -> Sample:
        row = self.rows[index]
        t1_path, pet_path = self.paths[index]
        rcs = self.random_crop_size
        t1 = self._load(t1_path, normalize=rcs is None)
        pet = self._load(pet_path, normalize=rcs is None)
        if rcs is not None:
            sl = tuple(
                slice(o, o + r)
                for o, r in zip(
                    (int(self._crop_rng.integers(0, c - r + 1)) for c, r in zip(t1.shape, rcs)),
                    rcs,
                )
            )
            t1 = max_normalize_np(np.ascontiguousarray(t1[sl]))
            pet = max_normalize_np(np.ascontiguousarray(pet[sl]))
        if self.need_values:
            info = covariate_vector(
                row, self.need_values, self.min_and_max, invert_abeta=self.invert_abeta
            )
        else:
            info = np.zeros((0,), np.float32)
        return Sample(t1, pet, info, row.subject, row.t1_date, row.pet_date)


class PairedLatentDataset:
    """T1 volumes paired with precomputed PET latents stored as .npy
    (pair_PETlatent_T1_dataset, dataset.py:145-248)."""

    def __init__(
        self,
        info_csv: str,
        latent_dir: str,
        t1_dir: str,
        crop_size: Sequence[int] = CROP_SIZE,
        need_values: Sequence[str] = (),
        min_and_max: Optional[Mapping[str, Tuple[float, float]]] = None,
        latent_name: str = "latent.npy",
    ):
        self.crop_size = tuple(crop_size)
        self.need_values = list(need_values)
        self.min_and_max = dict(min_and_max or {})
        self.rows: List[PairRow] = []
        self.paths: List[Tuple[str, str]] = []
        for row in read_manifest(info_csv):
            t1_path = _first_file(os.path.join(t1_dir, row.subject, row.t1_date))
            latent_path = os.path.join(latent_dir, row.subject, row.pet_date, latent_name)
            if t1_path is None or not os.path.isfile(latent_path):
                continue
            self.rows.append(row)
            self.paths.append((t1_path, latent_path))

    def __len__(self) -> int:
        return len(self.rows)

    def __getitem__(self, index: int):
        row = self.rows[index]
        t1_path, latent_path = self.paths[index]
        t1 = max_normalize_np(
            pad_crop_np(nifti.read_array(t1_path).astype(np.float32), self.crop_size)
        )
        latent = np.load(latent_path)
        if self.need_values:
            info = covariate_vector(row, self.need_values, self.min_and_max)
        else:
            info = np.zeros((0,), np.float32)
        return t1, latent, info, row.subject, row.t1_date, row.pet_date


class MCIClassificationDataset:
    """PET and/or T1 channels + covariates + binary MCI_converter label.

    Semantics of pair_MRI_dataset_only_mci: scans on/after the conversion
    date of converters are excluded (pet_for_classification/dataset.py:87-89);
    pet_name='rec.nii.gz' switches to synthesized PET (:95-99); ABETA is
    inverted after min-max (:155-156).
    """

    def __init__(
        self,
        info_csv: str,
        converter_csv: str,
        pet_dir: str,
        t1_dir: str,
        crop_size: Sequence[int] = CROP_SIZE,
        need_values: Sequence[str] = (),
        min_and_max: Optional[Mapping[str, Tuple[float, float]]] = None,
        use_pet: bool = True,
        use_t1: bool = True,
        pet_name: Optional[str] = None,
    ):
        self.crop_size = tuple(crop_size)
        self.need_values = list(need_values)
        self.min_and_max = dict(min_and_max or {})
        self.use_pet = use_pet
        self.use_t1 = use_t1
        self.pet_name = pet_name

        converters: Dict[str, Dict[str, str]] = {}
        with open(converter_csv, newline="", encoding="utf-8") as f:
            reader = csv.DictReader(f)
            key_col = reader.fieldnames[0]
            for rec in reader:
                converters[rec[key_col]] = rec

        self.rows: List[PairRow] = []
        self.paths: List[Tuple[Optional[str], Optional[str]]] = []
        self.labels: List[int] = []
        for row in read_manifest(info_csv):
            conv = converters.get(row.subject)
            if conv is None:
                continue
            label = int(float(conv.get("MCI_converter", 0) or 0))
            if label == 1 and row.pet_date >= conv.get("Converter_date", "9999"):
                continue  # post-conversion scans excluded
            pet_folder = os.path.join(pet_dir, row.subject, row.pet_date)
            t1_folder = os.path.join(t1_dir, row.subject, row.t1_date)
            pet_path = (
                os.path.join(pet_folder, pet_name) if pet_name else _first_file(pet_folder)
            )
            t1_path = _first_file(t1_folder)
            if self.use_pet and (pet_path is None or not os.path.isfile(pet_path)):
                continue
            if self.use_t1 and t1_path is None:
                continue
            self.rows.append(row)
            self.paths.append((pet_path, t1_path))
            self.labels.append(label)

    def __len__(self) -> int:
        return len(self.rows)

    def __getitem__(self, index: int):
        row = self.rows[index]
        pet_path, t1_path = self.paths[index]
        channels = []
        if self.use_pet:
            pet = max_normalize_np(
                pad_crop_np(nifti.read_array(pet_path).astype(np.float32), self.crop_size)
            )
            channels.append(pet)
        if self.use_t1:
            t1 = max_normalize_np(
                pad_crop_np(nifti.read_array(t1_path).astype(np.float32), self.crop_size)
            )
            channels.append(t1)
        imgs = np.stack(channels, axis=-1)  # (D, H, W, C) channels-last
        if self.need_values:
            info = covariate_vector(
                row, self.need_values, self.min_and_max, invert_abeta=True
            )
        else:
            info = np.zeros((0,), np.float32)
        return imgs, info, self.labels[index], row.subject, row.pet_date, row.t1_date


# ---------------------------------------------------------------------------
# packed arrays — the TPU training path
# ---------------------------------------------------------------------------


def pack_pairs(dataset: PairedVolumeDataset, out_dir: str, dtype=np.float16) -> str:
    """Decode+preprocess every pair once into memory-mapped arrays.

    Writes volumes.npy (N, 2, D, H, W) ``dtype``, covariates.npy (N, K)
    float32 and index.json (subject/date bookkeeping). Returns ``out_dir``.
    """
    os.makedirs(out_dir, exist_ok=True)
    n = len(dataset)
    d, h, w = dataset.crop_size
    k = len(dataset.need_values)
    vols = np.lib.format.open_memmap(
        os.path.join(out_dir, "volumes.npy"), mode="w+", dtype=dtype, shape=(n, 2, d, h, w)
    )
    covs = np.zeros((n, k), np.float32)
    index = []
    for i in range(n):
        s = dataset[i]
        vols[i, 0] = s.t1.astype(dtype)
        vols[i, 1] = s.pet.astype(dtype)
        if k:
            covs[i] = s.info
        index.append({"subject": s.subject, "t1_date": s.t1_date, "pet_date": s.pet_date})
    vols.flush()
    np.save(os.path.join(out_dir, "covariates.npy"), covs)
    with open(os.path.join(out_dir, "index.json"), "w", encoding="utf-8") as f:
        json.dump({"need_values": dataset.need_values, "rows": index}, f)
    return out_dir


class PackedDataset:
    """Memory-mapped packed pairs written by `pack_pairs`."""

    def __init__(self, path: str):
        self.volumes = np.load(os.path.join(path, "volumes.npy"), mmap_mode="r")
        self.covariates = np.load(os.path.join(path, "covariates.npy"))
        with open(os.path.join(path, "index.json"), encoding="utf-8") as f:
            meta = json.load(f)
        self.need_values = meta["need_values"]
        self.index = meta["rows"]

    def __len__(self) -> int:
        return self.volumes.shape[0]


def pack_mci(dataset: "MCIClassificationDataset", out_dir: str, dtype=np.float16) -> str:
    """Decode+preprocess every MCI-classification session once into
    memory-mapped arrays (the classifier counterpart of `pack_pairs`,
    killing the per-epoch NIfTI decode loop of the reference's
    num_workers=0 DataLoader — pet_for_classification/dataset.py:18-168).

    Writes volumes.npy (N, D, H, W, C) ``dtype``, covariates.npy (N, K)
    float32, labels.npy (N,) int32 and index.json. Returns ``out_dir``.
    """
    os.makedirs(out_dir, exist_ok=True)
    n = len(dataset)
    d, h, w = dataset.crop_size
    c = int(dataset.use_pet) + int(dataset.use_t1)
    k = len(dataset.need_values)
    vols = np.lib.format.open_memmap(
        os.path.join(out_dir, "volumes.npy"), mode="w+", dtype=dtype, shape=(n, d, h, w, c)
    )
    covs = np.zeros((n, k), np.float32)
    labels = np.zeros((n,), np.int32)
    index = []
    for i in range(n):
        imgs, info, label, subject, pet_date, t1_date = dataset[i]
        vols[i] = imgs.astype(dtype)
        if k:
            covs[i] = info
        labels[i] = label
        index.append({"subject": subject, "pet_date": pet_date, "t1_date": t1_date})
    vols.flush()
    np.save(os.path.join(out_dir, "covariates.npy"), covs)
    np.save(os.path.join(out_dir, "labels.npy"), labels)
    with open(os.path.join(out_dir, "index.json"), "w", encoding="utf-8") as f:
        json.dump(
            {
                "need_values": dataset.need_values,
                # provenance: a --test_fake_pet run must never silently
                # evaluate a previously packed real-PET cache (or vice versa)
                "pet_source": "fake" if getattr(dataset, "pet_name", None) else "real",
                "rows": index,
            },
            f,
        )
    return out_dir


class PackedMCIDataset:
    """Memory-mapped packed classification sessions written by `pack_mci`."""

    def __init__(self, path: str):
        self.volumes = np.load(os.path.join(path, "volumes.npy"), mmap_mode="r")
        self.covariates = np.load(os.path.join(path, "covariates.npy"))
        self.labels = np.load(os.path.join(path, "labels.npy"))
        with open(os.path.join(path, "index.json"), encoding="utf-8") as f:
            meta = json.load(f)
        self.need_values = meta["need_values"]
        self.pet_source = meta.get("pet_source")  # None for pre-provenance packs
        self.index = meta["rows"]

    def __len__(self) -> int:
        return self.volumes.shape[0]


class MCIBatchLoader:
    """Shuffled epoch iterator over a PackedMCIDataset with host sharding.

    Yields {"imgs": (B,D,H,W,C), "info": (B,1,K), "labels": (B,)} numpy
    batches (classifier_task's batch schema)."""

    def __init__(
        self,
        packed: PackedMCIDataset,
        batch_size: int,
        *,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        process_index: int = 0,
        process_count: int = 1,
    ):
        self.packed = packed
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.process_index = process_index
        self.process_count = process_count

    def epoch(self, epoch: int) -> Iterator[Dict[str, np.ndarray]]:
        n = len(self.packed)
        order = np.arange(n)
        if self.shuffle:
            np.random.default_rng(self.seed + epoch).shuffle(order)
        order = order[self.process_index :: self.process_count]
        num_batches = len(order) // self.batch_size
        if not self.drop_last and len(order) % self.batch_size:
            num_batches += 1
        for b in range(num_batches):
            idx = np.sort(order[b * self.batch_size : (b + 1) * self.batch_size])
            yield {
                "imgs": self.packed.volumes[idx].astype(np.float32),
                "info": self.packed.covariates[idx][:, None, :],
                "labels": self.packed.labels[idx],
            }

    def steps_per_epoch(self) -> int:
        n = len(self.packed) // self.process_count
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)


class StreamingLoader:
    """Epoch iterator decoding NIfTIs on the fly via the native C++ prefetch
    pool — for datasets too large (or too churning) to pack. Decode overlaps
    the accelerator step; falls back to synchronous Python decode when the
    native runtime is unavailable.
    """

    def __init__(
        self,
        dataset: PairedVolumeDataset,
        batch_size: int,
        *,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        n_threads: int = 2,
        process_index: int = 0,
        process_count: int = 1,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.process_index = process_index
        self.process_count = process_count
        self._prefetcher = None
        nat = _native()
        if nat is not None and len(dataset) > 0:
            t1_paths = [p[0] for p in dataset.paths]
            pet_paths = [p[1] for p in dataset.paths]
            try:
                self._prefetcher = nat.NativePrefetcher(
                    t1_paths, pet_paths, dataset.crop_size, n_threads=n_threads,
                    capacity=max(2 * batch_size, 8),
                )
            except Exception:
                self._prefetcher = None

    def epoch(self, epoch: int) -> Iterator[Dict[str, np.ndarray]]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            np.random.default_rng(self.seed + epoch).shuffle(order)
        order = order[self.process_index :: self.process_count]
        usable = len(order) - (len(order) % self.batch_size if self.drop_last else 0)
        order = order[:usable] if self.drop_last else order
        if not len(order):
            return

        if self._prefetcher is not None:
            self._prefetcher.submit([int(i) for i in order])
            served = 0
            batch_vols, batch_idx = [], []
            while served < len(order):
                idx, sample = self._prefetcher.next()
                if idx < 0:  # fully drained (cannot fire early: the native
                    break    # pool tracks in-flight decodes)
                served += 1
                if sample is None:  # per-sample decode failure: skip, warn
                    import warnings

                    warnings.warn(
                        f"skipping unreadable sample {self.dataset.paths[idx]}"
                    )
                else:
                    batch_vols.append(sample)
                    batch_idx.append(idx)
                if not batch_vols:
                    continue
                if len(batch_vols) == self.batch_size or (
                    served == len(order) and not self.drop_last and batch_vols
                ):
                    vols = np.stack(batch_vols)
                    infos = np.stack(
                        [
                            covariate_vector(
                                self.dataset.rows[i],
                                self.dataset.need_values,
                                self.dataset.min_and_max,
                                invert_abeta=self.dataset.invert_abeta,
                            )
                            if self.dataset.need_values
                            else np.zeros((0,), np.float32)
                            for i in batch_idx
                        ]
                    )[:, None, :]
                    yield {
                        "t1": vols[:, 0][..., None],
                        "pet": vols[:, 1][..., None],
                        "info": infos,
                    }
                    batch_vols, batch_idx = [], []
            return

        # python fallback: synchronous decode
        for b in range(0, len(order), self.batch_size):
            idx = order[b : b + self.batch_size]
            if self.drop_last and len(idx) < self.batch_size:
                break
            samples = [self.dataset[int(i)] for i in idx]
            yield {
                "t1": np.stack([s.t1 for s in samples])[..., None],
                "pet": np.stack([s.pet for s in samples])[..., None],
                "info": np.stack([s.info for s in samples])[:, None, :],
            }


class BatchLoader:
    """Shuffled epoch iterator over a PackedDataset with host sharding.

    Yields dict batches {"t1": (B,D,H,W,1), "pet": (B,D,H,W,1),
    "info": (B,1,K)} as numpy; the training loop device-puts them (sharded)
    — replaces DistributedSampler+DataLoader (train_unet.py:116-127).
    ``process_index/process_count`` slice the manifest per host
    (SURVEY.md §2.10 TPU-native equivalent).
    """

    def __init__(
        self,
        packed: PackedDataset,
        batch_size: int,
        *,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
        process_index: int = 0,
        process_count: int = 1,
        random_crop_size: Optional[Sequence[int]] = None,
    ):
        self.packed = packed
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.process_index = process_index
        self.process_count = process_count
        # random-crop training augmentation over the packed (already
        # crop_size) volumes: joint t1/pet offset, re-max-normalised after
        # the crop (scale invariance makes post-crop renormalisation of the
        # pre-normalised store identical to normalising the raw crop)
        self.random_crop_size = tuple(random_crop_size) if random_crop_size else None

    def epoch(self, epoch: int) -> Iterator[Dict[str, np.ndarray]]:
        n = len(self.packed)
        order = np.arange(n)
        rng = np.random.default_rng(self.seed + epoch)
        if self.shuffle:
            rng.shuffle(order)
        order = order[self.process_index :: self.process_count]
        num_batches = len(order) // self.batch_size
        if not self.drop_last and len(order) % self.batch_size:
            num_batches += 1
        for b in range(num_batches):
            idx = order[b * self.batch_size : (b + 1) * self.batch_size]
            # memmap fancy-indexing wants sorted indices; within-batch order
            # is irrelevant (the same sort is applied to the covariates)
            vols = self.packed.volumes[np.sort(idx)].astype(np.float32)
            if self.random_crop_size is not None:
                rcs = self.random_crop_size
                out = np.empty((vols.shape[0], 2, *rcs), np.float32)
                for i in range(vols.shape[0]):
                    sl = tuple(
                        slice(o, o + r)
                        for o, r in zip(
                            (int(rng.integers(0, c - r + 1)) for c, r in zip(vols.shape[2:], rcs)),
                            rcs,
                        )
                    )
                    crop = vols[(i, slice(None)) + sl]
                    for m in range(2):
                        peak = crop[m].max()
                        out[i, m] = crop[m] / peak if peak > 0 else crop[m]
                vols = out
            t1 = vols[:, 0][..., None]
            pet = vols[:, 1][..., None]
            info = self.packed.covariates[np.sort(idx)][:, None, :]
            yield {"t1": t1, "pet": pet, "info": info}

    def steps_per_epoch(self) -> int:
        n = len(self.packed) // self.process_count
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)
