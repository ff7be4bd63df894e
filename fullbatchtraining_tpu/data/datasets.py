"""Raw dataset loading to host numpy arrays (uint8 NHWC + int labels).

TPU-native replacement for the reference's torchvision dataset constructors
(/root/reference/fullbatch/data/data_preparation.py:115-147): datasets are
materialized once as host arrays (the reference's CachedDataset
cached_dataset.py:24-31 is subsumed — HBM/host-resident arrays ARE the cache)
and then device_put/sharded by the pipeline layer.

Loaders understand the standard on-disk formats (CIFAR python pickles,
TinyImageNet folder tree). With zero network egress, a deterministic
synthetic dataset stands in when raw files are absent and
``data.synthetic_fallback`` is set: class-dependent gaussian blobs so that
training can actually reduce loss and reach high accuracy, keeping the full
stack exercisable end-to-end.
"""

from __future__ import annotations

import hashlib
import logging
import os
import pickle
from pathlib import Path

import numpy as np

log = logging.getLogger(__name__)

# Auto-download archives (reference: torchvision download= for CIFAR,
# data_preparation.py:115-147; TinyImageNet url at datasets.py:39-44). The
# md5s are the published archive checksums (torchvision's CIFAR entries; the
# reference's own TinyImageNet md5s hash the extracted file LIST, which our
# folder-exists check subsumes — an extracted tree never re-downloads).
_ARCHIVES = {
    "CIFAR10": ("https://www.cs.toronto.edu/~kriz/cifar-10-python.tar.gz",
                "c58f30108f718f92721af3b95e74349a"),
    "CIFAR100": ("https://www.cs.toronto.edu/~kriz/cifar-100-python.tar.gz",
                 "eb9058c3a382ffc7106e4002c42a8d85"),
    "TinyImageNet": ("http://cs231n.stanford.edu/tiny-imagenet-200.zip",
                     "90528d7ca1a48142e341f4ef8d21d0de"),
}


def download_dataset(name: str, base: Path) -> bool:
    """Fetch + md5-verify + extract the raw archive for ``name`` into ``base``.

    The guarded-urllib pattern of ``pretrained._fetch_release_asset``: attempt
    only when the caller found no raw files, keep partial downloads off the
    final path (pid-unique .part), and degrade gracefully — returns False on
    any network failure so zero-egress environments fall through to the
    synthetic fallback with the existing log line. A checksum MISMATCH raises:
    a corrupt archive must never be silently replaced by synthetic data.
    """
    if name not in _ARCHIVES:
        return False
    if os.environ.get("FBT_NO_DOWNLOAD"):
        # hermetic-mode kill switch (test suite, driver smoke contracts):
        # skip the doomed socket attempt entirely in zero-egress sandboxes
        return False
    url, md5 = _ARCHIVES[name]
    import http.client
    import urllib.error
    import urllib.request

    base = Path(base)
    base.mkdir(parents=True, exist_ok=True)
    archive = base / url.rsplit("/", 1)[-1]
    if not archive.exists():
        tmp = archive.with_suffix(archive.suffix + f".{os.getpid()}.part")
        log.info("Downloading %s -> %s", url, archive)
        try:
            with urllib.request.urlopen(url, timeout=60) as response, \
                    open(tmp, "wb") as out:
                while chunk := response.read(1 << 20):
                    out.write(chunk)
        except (urllib.error.URLError, http.client.HTTPException,
                OSError) as err:  # HTTPException: e.g. IncompleteRead when
            # the server drops the connection mid-body (not an OSError)
            tmp.unlink(missing_ok=True)
            log.warning("Could not download %s (%s) - this environment may "
                        "have no network egress; place the raw files under %s "
                        "manually.", url, err, base)
            return False
        tmp.replace(archive)
    md5sum = hashlib.md5()
    with open(archive, "rb") as handle:  # chunked: archives are 100s of MB
        while chunk := handle.read(1 << 20):
            md5sum.update(chunk)
    digest = md5sum.hexdigest()
    if digest != md5:
        raise RuntimeError(
            f"MD5 mismatch for {archive}: got {digest}, expected {md5}. "
            "Delete the file and retry; refusing to extract a corrupt archive.")
    log.info("Extracting %s (md5 verified)", archive.name)
    if archive.name.endswith((".tar.gz", ".tgz")):
        import tarfile

        with tarfile.open(archive, "r:gz") as tar:
            try:
                tar.extractall(base, filter="data")  # refuses path traversal
            except TypeError:  # Python < 3.12: no filter argument
                tar.extractall(base)
    else:
        import zipfile

        with zipfile.ZipFile(archive) as zf:
            zf.extractall(base)
    return True


# torchvision datasets/folder.py IMG_EXTENSIONS
_IMG_EXTENSIONS = {".jpg", ".jpeg", ".png", ".ppm", ".bmp", ".pgm", ".tif",
                   ".tiff", ".webp"}


class ArrayDataset:
    """images uint8 NHWC, labels int32; the universal host representation."""

    def __init__(self, images: np.ndarray, labels: np.ndarray, classes: int):
        assert images.ndim == 4 and images.dtype == np.uint8
        self.images = images
        self.labels = labels.astype(np.int32)
        self.classes = classes

    def __len__(self):
        return len(self.images)

    def subset(self, indices) -> "ArrayDataset":
        return ArrayDataset(self.images[indices], self.labels[indices], self.classes)


def _load_cifar_pickles(base: Path, name: str) -> tuple | None:
    """CIFAR-10/100 from the standard python-version pickle batches."""
    if name == "CIFAR10":
        folder = base / "cifar-10-batches-py"
        train_files = [folder / f"data_batch_{i}" for i in range(1, 6)]
        test_files = [folder / "test_batch"]
        label_key = b"labels"
    else:
        folder = base / "cifar-100-python"
        train_files = [folder / "train"]
        test_files = [folder / "test"]
        label_key = b"fine_labels"
    if not all(f.exists() for f in train_files + test_files):
        return None

    def read(files):
        imgs, labels = [], []
        for f in files:
            with open(f, "rb") as handle:
                entry = pickle.load(handle, encoding="bytes")
            imgs.append(entry[b"data"].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1))
            labels.extend(entry[label_key])
        return np.concatenate(imgs).astype(np.uint8), np.asarray(labels)

    return read(train_files), read(test_files)


def _synthetic(name: str, size: int, pixels: int, channels: int, classes: int,
               seed: int = 0) -> tuple:
    """Deterministic learnable synthetic data: per-class mean patterns + noise.

    Cached to disk after first generation - gaussian sampling of 50k images on
    a single host core costs minutes, loading the cache costs milliseconds.
    """
    cache = Path("/tmp/fbt_synthetic") / f"{name}_{size}_{pixels}_{channels}_{classes}_{seed}.npz"
    if cache.exists():
        import zipfile
        try:
            data = np.load(cache)
            return ((data["tx"], data["ty"]), (data["vx"], data["vy"]))
        except (OSError, ValueError, KeyError, EOFError, zipfile.BadZipFile):
            log.warning("Corrupt synthetic cache %s - regenerating.", cache)
            cache.unlink(missing_ok=True)

    rng = np.random.default_rng(seed)
    patterns = rng.uniform(0, 255, (classes, pixels, pixels, channels)).astype(np.float32)

    def make(n, split_seed):
        r = np.random.default_rng(split_seed)
        labels = r.integers(0, classes, n)
        images = np.empty((n, pixels, pixels, channels), np.uint8)
        step = 4096
        for start in range(0, n, step):  # chunked: bounds peak memory on small hosts
            idx = labels[start:start + step]
            noise = r.standard_normal((len(idx), pixels, pixels, channels),
                                      dtype=np.float32)
            block = patterns[idx] + 48.0 * noise
            np.clip(block, 0, 255, out=block)
            images[start:start + step] = block.astype(np.uint8)
        return images, labels

    train, valid = make(size, seed + 1), make(max(classes, min(size // 5, 10_000)), seed + 2)
    try:
        cache.parent.mkdir(parents=True, exist_ok=True)
        # pid-unique temp + atomic rename (the download_dataset pattern): a
        # kill mid-write must never leave a corrupt cache at the final path
        tmp = cache.with_suffix(f".{os.getpid()}.part")
        with open(tmp, "wb") as handle:
            np.savez(handle, tx=train[0], ty=train[1], vx=valid[0], vy=valid[1])
        tmp.replace(cache)
    except OSError:
        pass
    return train, valid


_TINY_SIDE = 64  # TinyImageNet images are 64x64


def _load_tiny_imagenet(base: Path) -> tuple | None:
    """None means ABSENT or INCOMPLETE (caller may download / re-extract);
    a present-but-unreadable tree raises instead, so a missing soft
    dependency never triggers a pointless 250MB re-download.

    The ~110k JPEGs decode once through the native libjpeg batch engine
    (PIL fallback per declined file) into a memmap cache beside the tree —
    the _load_imagefolder pattern — so repeat startups cost a cache mmap,
    not minutes of single-core PIL decode."""
    folder = base / "tiny-imagenet-200"
    manifest = folder / "wnids.txt"
    annotations = folder / "val" / "val_annotations.txt"
    if not (manifest.exists() and annotations.exists()):
        # absent, or half-extracted after a crash: the caller's
        # download_dataset() re-extracts the md5-verified archive in place
        return None
    cache = folder / "_fbt_cache"

    def decode_split(tag, files, labels):
        img_file = cache / f"{tag}_images.npy"
        lbl_file = cache / f"{tag}_labels.npy"
        # label file = completion marker, written last (self-healing rebuild)
        if lbl_file.exists() and img_file.exists():
            return np.load(img_file, mmap_mode="r"), np.load(lbl_file)
        try:
            from PIL import Image
        except ImportError as _err:
            raise ImportError(
                f"TinyImageNet is present under {folder} but decoding its "
                "JPEGs needs Pillow, which is not installed. "
                "pip install pillow  (or: pip install "
                "fullbatchtraining-tpu[data])") from _err

        def read_img(path):
            img = Image.open(path).convert("RGB")
            if img.size != (_TINY_SIDE, _TINY_SIDE):
                img = img.resize((_TINY_SIDE, _TINY_SIDE), Image.BILINEAR)
            return np.asarray(img, np.uint8)

        from .native import decode_resize_jpeg_batch

        cache.mkdir(parents=True, exist_ok=True)
        images = np.lib.format.open_memmap(
            img_file, mode="w+", dtype=np.uint8,
            shape=(len(files), _TINY_SIDE, _TINY_SIDE, 3))
        chunk_size = 1024
        for start in range(0, len(files), chunk_size):
            chunk = files[start:start + chunk_size]
            native = decode_resize_jpeg_batch(
                [f.read_bytes() for f in chunk], _TINY_SIDE,
                out=images[start:start + len(chunk)])
            if native is None:
                for i, f in enumerate(chunk):
                    images[start + i] = read_img(f)
            else:
                for i in np.flatnonzero(~native[1]):
                    images[start + i] = read_img(chunk[i])
        images.flush()
        np.save(lbl_file, np.asarray(labels, np.int32))
        return images, np.asarray(labels, np.int32)

    wnids = sorted(manifest.read_text().split())
    wnid_to_label = {w: i for i, w in enumerate(wnids)}
    train_files, train_labels = [], []
    for wnid in wnids:
        for img_path in sorted((folder / "train" / wnid / "images").glob("*.JPEG")):
            train_files.append(img_path)
            train_labels.append(wnid_to_label[wnid])
    val_files, val_labels = [], []
    for line in annotations.read_text().strip().splitlines():
        fname, wnid = line.split("\t")[:2]
        val_files.append(folder / "val" / "images" / fname)
        val_labels.append(wnid_to_label[wnid])
    return (decode_split("train", train_files, train_labels),
            decode_split("val", val_files, val_labels))


def _load_imagefolder(base: Path, pixels: int, cache_tag: str,
                      dryrun: bool = False) -> tuple | None:
    """Standard ImageFolder tree (train/<class>/*, val/<class>/*), decoded once
    into a resized uint8 memmap cache.

    Images are resized so the shorter side is ``pixels`` then center-padded to
    square storage; the configured train/val crops (RandomResizedCrop /
    Resize+CenterCrop) run device-side on these arrays.

    ``dryrun`` decodes only the first 256 files per split into a SEPARATE
    dryrun cache (the reference's dryrun subsets the lazy ImageFolder and
    never decodes the rest, data_preparation.py:32-37 — eagerly caching all
    ~1.3M ImageNet images for a smoke test would take hours). A complete
    full cache is preferred over the dryrun cache when present.
    """
    if not (base / "train").exists():
        return None

    cache = base / f"_fbt_cache_{cache_tag}_{pixels}"
    limit = None
    if dryrun and not all((cache / f"{s}_labels.npy").exists()
                          for s in ("train", "val")):
        # BOTH splits must be cached before a dryrun skips the 256-file
        # cache, else an interrupted full build makes the smoke test decode
        # an entire split
        cache = base / f"_fbt_cache_{cache_tag}_{pixels}_dryrun"
        limit = 256

    def build(split):
        img_file = cache / f"{split}_images.npy"
        lbl_file = cache / f"{split}_labels.npy"
        # The LABEL file is the cache-complete marker: it is written last,
        # so an interrupted decode self-heals by rebuilding. The directory
        # walk is skipped entirely on a cache hit (ImageNet: ~1.3M stats).
        if lbl_file.exists() and img_file.exists():
            return np.load(img_file, mmap_mode="r"), np.load(lbl_file)
        try:  # only a cache MISS decodes; the PIL fallback covers files the
            from PIL import Image  # native libjpeg engine declines
        except ImportError as _err:
            raise ImportError(
                f"An ImageFolder tree is present under {base} but building "
                "its decode cache needs Pillow, which is not installed. "
                "pip install pillow  (or: pip install "
                "fullbatchtraining-tpu[data])") from _err
        split_dir = base / split
        classes = sorted(d.name for d in split_dir.iterdir() if d.is_dir())
        files, labels = [], []
        for label, cls in enumerate(classes):
            for f in sorted((split_dir / cls).iterdir()):
                # torchvision ImageFolder semantics: only image FILES count
                # (IMG_EXTENSIONS filter) — a stray README/.DS_Store/subdir
                # must not abort a multi-hour decode
                if f.suffix.lower() not in _IMG_EXTENSIONS or not f.is_file():
                    continue
                files.append(f)
                labels.append(label)
            if limit is not None and len(files) >= limit:
                break
        if limit is not None:
            files, labels = files[:limit], labels[:limit]
        cache.mkdir(parents=True, exist_ok=True)
        side = int(pixels * 1.15)  # headroom for random crops
        images = np.lib.format.open_memmap(
            img_file, mode="w+", dtype=np.uint8, shape=(len(files), side, side, 3))

        def decode_pil(path):
            img = Image.open(path).convert("RGB")
            scale = side / min(img.size)
            img = img.resize((max(side, round(img.width * scale)),
                              max(side, round(img.height * scale))),
                             Image.BILINEAR)
            left = (img.width - side) // 2
            top = (img.height - side) // 2
            return np.asarray(img.crop((left, top, left + side, top + side)),
                              np.uint8)

        # Native libjpeg engine decodes batches straight into the memmap,
        # threaded across files (native/fbt_jpeg.cpp); files it declines
        # (CMYK, corrupt, non-JPEG) fall back to PIL one by one, as does
        # everything when no toolchain/libjpeg is available.
        from .native import decode_resize_jpeg_batch

        chunk_size = 512
        for start in range(0, len(files), chunk_size):
            chunk = files[start:start + chunk_size]
            native = decode_resize_jpeg_batch(
                [f.read_bytes() for f in chunk], side,
                out=images[start:start + len(chunk)])
            if native is None:
                for i, f in enumerate(chunk):
                    images[start + i] = decode_pil(f)
            else:
                for i in np.flatnonzero(~native[1]):
                    images[start + i] = decode_pil(chunk[i])
            if start % 51_200 == 0:
                log.info("Decoded %d/%d %s images", start, len(files), split)
        images.flush()
        np.save(lbl_file, np.asarray(labels, np.int32))
        return images, np.asarray(labels, np.int32)

    return build("train"), build("val")


def construct_datasets(cfg_data, dryrun: bool = False,
                       can_download: bool = True) -> tuple[ArrayDataset, ArrayDataset]:
    """Build (train, valid) ArrayDatasets per the data config group.

    ``can_download`` mirrors the reference's gate (data_preparation.py:24:
    downloads are disabled under distributed launch so N ranks never race
    one extraction): when raw files are absent, the archive is fetched,
    md5-verified, and extracted once, then loading retries."""
    base = Path(os.path.expanduser(str(cfg_data.path)))
    name = cfg_data.name

    def try_load():
        if name in ("CIFAR10", "CIFAR100"):
            return _load_cifar_pickles(base, name)
        if name == "TinyImageNet":
            return _load_tiny_imagenet(base)
        if name == "ImageNet":
            return _load_imagefolder(base, cfg_data.pixels, name, dryrun=dryrun)
        return None

    loaded = try_load()
    if loaded is None and can_download and download_dataset(name, base):
        loaded = try_load()

    if loaded is None:
        if not cfg_data.get("synthetic_fallback", False):
            raise FileNotFoundError(
                f"Dataset {name} not found under {base} and synthetic_fallback is off.")
        log.warning("Dataset %s not found under %s - using deterministic synthetic data.",
                    name, base)
        size = int(cfg_data.size) if not dryrun else min(int(cfg_data.size), 256)
        loaded = _synthetic(name, size, cfg_data.pixels, cfg_data.channels, cfg_data.classes)

    (train_x, train_y), (valid_x, valid_y) = loaded
    train = ArrayDataset(train_x, train_y, cfg_data.classes)
    valid = ArrayDataset(valid_x, valid_y, cfg_data.classes)

    requested = int(cfg_data.size)
    if requested < len(train):
        # reference dryrun/subset semantics (data_preparation.py:32-37)
        train = train.subset(np.arange(requested))
    return train, valid
