"""Loss-surface results store.

Replaces the reference's LMDB work-sharing database
(/root/reference/fullbatch/visualization/database.py): directions + the model
snapshot live in a msgpack sidecar, per-position results append to a JSONL
file. Appends are atomic at line granularity, so interrupted crunch jobs
resume exactly like the reference's placeholder-row scheme
(crunch.py:139-172) without an embedded C database.
"""

from __future__ import annotations

import json
import logging
import os
from pathlib import Path

import jax
import numpy as np
from flax import serialization

log = logging.getLogger(__name__)


def surface_path(cfg_impl, cfg_viz, original_cwd) -> Path:
    base_name = cfg_viz.database_name or cfg_impl.checkpoint.name or "debug_db_"
    full = os.path.splitext(str(base_name))[0] + \
        f"_{cfg_viz.ignore_layers}_{cfg_viz.norm}_losses"
    return Path(original_cwd) / "checkpoints" / full


class SurfaceStore:
    """Directions + per-position results with resume semantics."""

    def __init__(self, path: Path):
        self.path = Path(path)
        # plain name concatenation: with_suffix would swallow everything after
        # a dot in the store name, colliding distinct norm/ignore variants
        self.meta_file = self.path.parent / (self.path.name + ".directions.msgpack")
        self.results_file = self.path.parent / (self.path.name + ".results.jsonl")

    def exists(self) -> bool:
        return self.meta_file.exists()

    def remove(self):
        self.meta_file.unlink(missing_ok=True)
        self.results_file.unlink(missing_ok=True)

    def create(self, params, x_direction, y_direction):
        self.path.parent.mkdir(parents=True, exist_ok=True)
        payload = {
            "params": jax.tree.map(np.asarray, jax.device_get(params)),
            "x_direction": jax.tree.map(np.asarray, jax.device_get(x_direction)),
            "y_direction": jax.tree.map(np.asarray, jax.device_get(y_direction)),
        }
        # pid-unique temp + atomic rename: a kill mid-write of the multi-MB
        # sidecar must never leave exists()==True with a truncated payload
        # (which would wedge every resume until manually deleted)
        tmp = self.meta_file.with_name(
            f"{self.meta_file.name}.{os.getpid()}.tmp")
        tmp.write_bytes(serialization.msgpack_serialize(payload))
        tmp.replace(self.meta_file)

    def load(self, params_template):
        payload = serialization.msgpack_restore(self.meta_file.read_bytes())
        template = {
            "params": jax.device_get(params_template),
            "x_direction": jax.device_get(params_template),
            "y_direction": jax.device_get(params_template),
        }
        payload = serialization.from_state_dict(template, payload)
        return payload["params"], payload["x_direction"], payload["y_direction"]

    def verify_model(self, params):
        """Returns the loaded (params, dx, dy) when the stored snapshot
        matches ``params``, else None — one disk read for the caller. A
        snapshot that cannot even be restored into this model's tree (a
        different architecture under the same database name) is 'does not
        match', not a flax traceback."""
        try:
            loaded = self.load(params)
        except Exception as err:  # mismatched tree / incompatible payload
            log.warning("Stored surface snapshot at %s does not restore "
                        "into this model (%s).", self.meta_file, err)
            return None
        for a, b in zip(jax.tree.leaves(loaded[0]),
                        jax.tree.leaves(jax.device_get(params))):
            if not np.array_equal(np.asarray(a), np.asarray(b)):
                return None
        return loaded

    @staticmethod
    def _key(position) -> str:
        return f"{float(position[0]):.6f},{float(position[1]):.6f}"

    def results(self) -> dict:
        out = {}
        if self.results_file.exists():
            for line in self.results_file.read_text().splitlines():
                if not line.strip():
                    continue
                try:
                    row = json.loads(line)
                except json.JSONDecodeError:
                    # torn tail from a killed job or non-atomic concurrent
                    # append: skip so the resume path keeps working (the
                    # reference tolerated damaged LMDB payloads the same way)
                    log.warning("Skipping corrupt results line in %s",
                                self.results_file.name)
                    continue
                key = self._key(row["position"])
                existing = out.get(key)
                if row.get("claim"):
                    # claims never shadow results; newer claims refresh older
                    if existing is None or (existing.get("claim")
                                            and row.get("ts", 0) >= existing.get("ts", 0)):
                        out[key] = row
                else:
                    out[key] = row
        return out

    def record(self, position, **values):
        row = {"position": [float(position[0]), float(position[1])], **values}
        with open(self.results_file, "a") as handle:
            handle.write(json.dumps(row) + "\n")

    def claim(self, positions):
        """Mark positions as in-progress so cooperating jobs skip them
        (the reference's LMDB placeholder rows, crunch.py:156-158). Stale
        claims (older than pending()'s ttl) are ignored there."""
        import time

        now = time.time()
        with open(self.results_file, "a") as handle:
            for position in positions:
                row = {"position": [float(position[0]), float(position[1])],
                       "claim": True, "ts": now}
                handle.write(json.dumps(row) + "\n")

    def pending(self, positions, ttl: float = 3600.0) -> list:
        """Positions with no result and no fresh claim."""
        import time

        now = time.time()
        done = self.results()
        out = []
        for position in positions:
            row = done.get(self._key(position))
            if row is None:
                out.append(position)
            elif row.get("claim") and now - row.get("ts", 0) > ttl:
                out.append(position)  # stale claim: the other job died
        return out


def load_surface(db_path, positions) -> dict:
    """Surface arrays for plotting; NaN where a position is missing
    (reference database.py:92-111)."""
    store = SurfaceStore(Path(db_path))
    results = store.results()
    landscape = {key: np.full(len(positions), np.nan)
                 for key in ("train_loss", "train_acc", "full_loss")}
    for idx, position in enumerate(positions):
        row = results.get(store._key(position))
        if row is not None:
            for key in landscape:
                landscape[key][idx] = row.get(key, np.nan)
    return landscape
