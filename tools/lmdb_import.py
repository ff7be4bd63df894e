#!/usr/bin/env python
"""Import reference LMDB artifacts without an lmdb dependency.

The reference persists two kinds of LMDB files (both ``subdir=False``
single-file databases):

* datasets: ascii index keys -> raw uint8 image rows, plus pickled
  ``__keys__`` / ``__labels__`` / ``__len__`` / ``__shape__`` metadata
  (/root/reference/fullbatch/data/lmdb_datasets.py:227-299);
* loss surfaces: ``pickle.dumps([position])`` keys -> pickled metric dicts,
  plus ``model_state_dict`` / ``x_direction`` / ``y_direction`` blobs
  (/root/reference/fullbatch/visualization/database.py:80-111).

This tool parses them with the dependency-free B+tree reader
(``fullbatchtraining_tpu.data.lmdb_reader``) and writes the TPU repo's
native stores: a BakedDataset directory (images.npy/labels.npy/meta.json,
consumed via ``data/db=baked``) or a SurfaceStore results JSONL (the
resumable crunch store). Values are unpickled with the standard pickler:
only feed artifacts you created yourself - pickle executes code by design.

Usage:
  python tools/lmdb_import.py dataset SRC.lmdb OUT_DIR \
      [--rounds N] [--channels-first|--channels-last] [--name X] [--classes K]
  python tools/lmdb_import.py surface SRC.lmdb OUT_STORE_PATH

The dataset mode prints the store directory; point the training run at it by
baking into the same location or opening it directly with
``BakedDataset(OUT_DIR)``. Rounds: the reference writes ``rounds`` repeated
augmented epochs as one flat key range; pass the original
``data.db.rounds`` to restore the (rounds, n, H, W, C) layout.
"""

import argparse
import json
import pickle
import sys
from pathlib import Path

import numpy as np

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

from fullbatchtraining_tpu.data.lmdb_reader import MdbFile  # noqa: E402


def import_dataset(src, out_dir, rounds=1, channels_first=None, name=None,
                   classes=None) -> Path:
    """Convert a reference dataset LMDB into a BakedDataset directory."""
    src, out_dir = Path(src), Path(out_dir)
    with MdbFile(src) as db:
        meta_blobs = {k: db.get(k.encode()) for k in
                      ("__len__", "__keys__", "__labels__", "__shape__")}
        missing = [k for k, v in meta_blobs.items() if v is None]
        if missing:
            raise ValueError(
                f"{src}: not a reference dataset LMDB (missing {missing})")
        length = int(pickle.loads(meta_blobs["__len__"]))
        keys = pickle.loads(meta_blobs["__keys__"])
        labels = np.asarray(pickle.loads(meta_blobs["__labels__"]),
                            dtype=np.int32)
        shape = [int(s) for s in pickle.loads(meta_blobs["__shape__"])]
        if channels_first is None:
            # the reference encodes the layout in the file name (_CHW / HWC,
            # lmdb_datasets.py:170-175); 3-first shapes default to CHW
            channels_first = ("_CHW" in src.name if ("_CHW" in src.name
                              or "HWC" in src.name) else shape[0] in (1, 3))
        if length % rounds:
            raise ValueError(f"{length} entries do not split into "
                             f"{rounds} rounds")
        n = length // rounds
        h, w, c = ((shape[1], shape[2], shape[0]) if channels_first
                   else (shape[0], shape[1], shape[2]))

        out_dir.mkdir(parents=True, exist_ok=True)
        images = np.lib.format.open_memmap(
            out_dir / "images.npy", mode="w+", dtype=np.uint8,
            shape=(rounds, n, h, w, c))
        for i, key in enumerate(keys):
            raw = db.get(key if isinstance(key, bytes) else str(key).encode())
            if raw is None:
                raise ValueError(f"{src}: key {key!r} listed in __keys__ "
                                 "but absent")
            row = np.frombuffer(raw, np.uint8).reshape(shape)
            if channels_first:
                row = row.transpose(1, 2, 0)
            images[i // n, i % n] = row
        images.flush()
        np.save(out_dir / "labels.npy", labels.reshape(rounds, n))
        meta = {
            "name": name or src.name.split("_")[0],
            "rounds": int(rounds), "size": int(n), "shape": [h, w, c],
            "classes": int(classes if classes is not None
                           else labels.max() + 1),
            "first_round_clean": "_first_clean" in src.name,
            "shuffle_while_writing": "_shuffled" in src.name,
            "imported_from": str(src),
        }
        (out_dir / "meta.json").write_text(json.dumps(meta))
    return out_dir


def import_surface(src, out_store) -> int:
    """Convert a reference surface LMDB into SurfaceStore JSONL rows.

    Returns the number of imported positions. Non-position keys
    (model_state_dict, directions - torch-serialized, reconstructed on the
    TPU side by the converter in ``fullbatchtraining_tpu/pretrained.py``)
    are skipped."""
    from fullbatchtraining_tpu.visualization.database import SurfaceStore

    store = SurfaceStore(Path(out_store))
    store.results_file.parent.mkdir(parents=True, exist_ok=True)
    count = dropped = 0
    with MdbFile(Path(src)) as db:
        for key, value in db.items():
            try:
                parsed = pickle.loads(key)
            except Exception:
                continue  # model_state_dict / x_direction / y_direction
            if not (isinstance(parsed, list) and len(parsed) == 1):
                continue
            pos = np.atleast_1d(np.asarray(parsed[0], dtype=float))
            position = (float(pos[0]), float(pos[1]) if pos.size > 1 else 0.0)
            try:
                payload = pickle.loads(value)
            except Exception:
                # a position key whose VALUE won't decode is data loss, not
                # an auxiliary blob - never drop it silently
                print(f"WARNING: dropping position {position}: "
                      "undecodable payload (truncated/corrupt database?)",
                      file=sys.stderr)
                dropped += 1
                continue
            if not isinstance(payload, dict):
                print(f"WARNING: dropping position {position}: payload is "
                      f"{type(payload).__name__}, expected dict",
                      file=sys.stderr)
                dropped += 1
                continue
            values = {}
            for k, v in payload.items():
                try:
                    values[str(k)] = float(v)
                except (TypeError, ValueError):
                    pass
            store.record(position, **values)
            count += 1
    if dropped:
        print(f"WARNING: {dropped} position(s) dropped - the imported "
              "surface is INCOMPLETE", file=sys.stderr)
    return count


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="mode", required=True)
    d = sub.add_parser("dataset")
    d.add_argument("src"), d.add_argument("out_dir")
    d.add_argument("--rounds", type=int, default=1)
    layout = d.add_mutually_exclusive_group()
    layout.add_argument("--channels-first", dest="cf", action="store_true",
                        default=None)
    layout.add_argument("--channels-last", dest="cf", action="store_false")
    d.add_argument("--name"), d.add_argument("--classes", type=int)
    s = sub.add_parser("surface")
    s.add_argument("src"), s.add_argument("out_store")
    args = ap.parse_args()
    if args.mode == "dataset":
        out = import_dataset(args.src, args.out_dir, rounds=args.rounds,
                             channels_first=args.cf, name=args.name,
                             classes=args.classes)
        print(f"imported dataset store: {out}")
    else:
        n = import_surface(args.src, args.out_store)
        print(f"imported {n} surface positions into {args.out_store}")


if __name__ == "__main__":
    main()
