"""Tests for the dependency-free LMDB parser and the artifact importer.

py-lmdb does not exist in this environment, so the fixtures are crafted
directly against the on-disk layout of mdb.c (page/node/meta structs as
documented in fullbatchtraining_tpu/data/lmdb_reader.py). The writer below
builds exactly the structures the C library would: two meta pages, sorted
leaf pages packed from the page end, a branch root when more than one leaf
is needed, and F_BIGDATA overflow chains for values that exceed the inline
node budget - the same shapes the reference's single-file databases use
(/root/reference/fullbatch/data/lmdb_datasets.py:227-299 writes via
lmdb.open(subdir=False) + txn.put).
"""

import pickle
import struct

import numpy as np
import pytest

from fullbatchtraining_tpu.data.lmdb_reader import (CorruptDatabaseError,
                                                    MdbFile)

PSIZE = 4096
P_BRANCH, P_LEAF, P_OVERFLOW, P_META = 0x01, 0x02, 0x04, 0x08
F_BIGDATA = 0x01
INVALID = 0xFFFFFFFFFFFFFFFF


def _even(n):
    return n + (n & 1)


class _MdbWriter:
    """Minimal single-txn LMDB file writer (tests only)."""

    def __init__(self, psize=PSIZE):
        self.psize = psize
        self.pages = {}  # pgno -> bytes/bytearray blob starting at pgno
        self.next_pg = 2
        self.counts = {"branch": 0, "leaf": 0, "overflow": 0}

    def _alloc(self, n=1):
        pg = self.next_pg
        self.next_pg += n
        return pg

    def _overflow(self, value: bytes) -> int:
        npages = -(-(16 + len(value)) // self.psize)
        pg = self._alloc(npages)
        blob = bytearray(npages * self.psize)
        struct.pack_into("<Q", blob, 0, pg)
        struct.pack_into("<H", blob, 10, P_OVERFLOW)
        struct.pack_into("<I", blob, 12, npages)
        blob[16:16 + len(value)] = value
        self.pages[pg] = blob
        self.counts["overflow"] += npages
        return pg

    def _flush_leaf(self, nodes) -> int:
        pg = self._alloc()
        buf = bytearray(self.psize)
        struct.pack_into("<Q", buf, 0, pg)
        struct.pack_into("<H", buf, 10, P_LEAF)
        off = self.psize
        ptrs = []
        for key, lo, hi, fl, data in nodes:
            ln = _even(8 + len(key) + len(data))
            off -= ln
            struct.pack_into("<HHHH", buf, off, lo, hi, fl, len(key))
            buf[off + 8:off + 8 + len(key)] = key
            buf[off + 8 + len(key):off + 8 + len(key) + len(data)] = data
            ptrs.append(off)
        struct.pack_into("<HH", buf, 12, 16 + 2 * len(nodes), off)
        for i, p in enumerate(ptrs):
            struct.pack_into("<H", buf, 16 + 2 * i, p)
        self.pages[pg] = buf
        self.counts["leaf"] += 1
        return pg

    def _branch(self, children) -> int:
        """children: list of (first_key, pgno); first separator is empty."""
        pg = self._alloc()
        buf = bytearray(self.psize)
        struct.pack_into("<Q", buf, 0, pg)
        struct.pack_into("<H", buf, 10, P_BRANCH)
        off = self.psize
        ptrs = []
        for i, (fk, child) in enumerate(children):
            key = b"" if i == 0 else fk
            ln = _even(8 + len(key))
            off -= ln
            struct.pack_into("<HHHH", buf, off, child & 0xFFFF,
                             (child >> 16) & 0xFFFF, (child >> 32) & 0xFFFF,
                             len(key))
            buf[off + 8:off + 8 + len(key)] = key
            ptrs.append(off)
        struct.pack_into("<HH", buf, 12, 16 + 2 * len(children), off)
        for i, p in enumerate(ptrs):
            struct.pack_into("<H", buf, 16 + 2 * i, p)
        self.pages[pg] = buf
        self.counts["branch"] += 1
        return pg

    def _meta(self, pgno, txnid, root, depth, entries) -> bytes:
        buf = bytearray(self.psize)
        struct.pack_into("<Q", buf, 0, pgno)
        struct.pack_into("<H", buf, 10, P_META)
        b = 16
        struct.pack_into("<II", buf, b, 0xBEEFC0DE, 1)
        struct.pack_into("<QQ", buf, b + 8, 0, self.psize * self.next_pg)
        struct.pack_into("<Q", buf, b + 24 + 40, INVALID)  # FREE_DBI root
        main = b + 72
        struct.pack_into("<IHH", buf, main, 0, 0, depth)
        struct.pack_into("<QQQ", buf, main + 8, self.counts["branch"],
                         self.counts["leaf"], self.counts["overflow"])
        struct.pack_into("<QQ", buf, main + 32, entries, root)
        struct.pack_into("<QQ", buf, b + 120, self.next_pg - 1, txnid)
        return bytes(buf)

    def write(self, path, mapping, leaf_budget=3000):
        items = sorted(mapping.items())
        leaves, nodes, used = [], [], 16
        for key, value in items:
            if 8 + len(key) + len(value) > 2000:  # mdb nodemax ~ (psize-16)/2
                data = struct.pack("<Q", self._overflow(value))
                node = (key, len(value) & 0xFFFF, len(value) >> 16,
                        F_BIGDATA, data)
            else:
                node = (key, len(value) & 0xFFFF, len(value) >> 16, 0, value)
            ln = 2 + _even(8 + len(key) + len(node[4]))
            if used + ln > leaf_budget and nodes:
                leaves.append((nodes[0][0], self._flush_leaf(nodes)))
                nodes, used = [], 16
            nodes.append(node)
            used += ln
        if nodes:
            leaves.append((nodes[0][0], self._flush_leaf(nodes)))
        if not leaves:
            root, depth = INVALID, 0
        elif len(leaves) == 1:
            root, depth = leaves[0][1], 1
        else:
            root, depth = self._branch(leaves), 2
        out = bytearray(self.next_pg * self.psize)
        out[0:self.psize] = self._meta(0, 0, INVALID, 0, 0)
        out[self.psize:2 * self.psize] = self._meta(1, 1, root, depth,
                                                    len(items))
        for pg, blob in self.pages.items():
            out[pg * self.psize:pg * self.psize + len(blob)] = blob
        path.write_bytes(bytes(out))


def write_mdb(path, mapping, **kw):
    _MdbWriter().write(path, mapping, **kw)


def test_single_leaf_roundtrip(tmp_path):
    data = {b"alpha": b"1", b"beta": b"two", b"__len__": pickle.dumps(3)}
    f = tmp_path / "small.lmdb"
    write_mdb(f, data)
    with MdbFile(f) as db:
        assert len(db) == 3
        assert dict(db.items()) == data
        assert db.get(b"beta") == b"two"
        assert db.get(b"missing") is None


def test_branch_and_overflow_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    data = {}
    for i in range(64):  # forces several leaves under one branch root
        data[f"{i}".encode()] = rng.integers(0, 256, size=200, dtype=np.uint8).tobytes()
    big = rng.integers(0, 256, size=3 * 32 * 32, dtype=np.uint8).tobytes()
    data[b"bigrow"] = big  # 3072 B -> F_BIGDATA overflow page
    huge = rng.integers(0, 256, size=3 * PSIZE + 17, dtype=np.uint8).tobytes()
    data[b"hugerow"] = huge  # spans 4 overflow pages
    f = tmp_path / "tree.lmdb"
    write_mdb(f, data)
    with MdbFile(f) as db:
        got = dict(db.items())
        assert got == data
        assert db.get(b"bigrow") == big
        assert db.get(b"hugerow") == huge
        for k, v in data.items():
            assert db.get(k) == v
        # key order is memcmp order, like the C library's cursor
        assert list(db.keys()) == sorted(data)


def test_empty_db_and_corruption(tmp_path):
    f = tmp_path / "empty.lmdb"
    write_mdb(f, {})
    with MdbFile(f) as db:
        assert db.get(b"x") is None
        assert list(db.items()) == []
    bad = tmp_path / "bad.lmdb"
    bad.write_bytes(b"\0" * 8192)
    with pytest.raises(CorruptDatabaseError):
        MdbFile(bad)


def test_truncated_value_raises_instead_of_clamping(tmp_path):
    rng = np.random.default_rng(3)
    big = rng.integers(0, 256, size=3 * PSIZE + 17, dtype=np.uint8).tobytes()
    f = tmp_path / "trunc.lmdb"
    write_mdb(f, {b"hugerow": big})
    # cut the file mid-overflow-chain: everything must raise, never shorten
    data = f.read_bytes()
    f.write_bytes(data[:len(data) - 2 * PSIZE])
    with MdbFile(f) as db:
        with pytest.raises(CorruptDatabaseError):
            db.get(b"hugerow")
        with pytest.raises(CorruptDatabaseError):
            dict(db.items())

    # corrupt the recorded value SIZE past the file end: mmap slicing would
    # silently clamp; the reader must refuse
    f2 = tmp_path / "badsize.lmdb"
    write_mdb(f2, {b"k": b"v" * 100})
    blob = bytearray(f2.read_bytes())
    with MdbFile(f2) as db:
        leaf_off = db.root * db.psize
    node = struct.unpack_from("<H", blob, leaf_off + 16)[0]
    struct.pack_into("<HH", blob, leaf_off + node, 0xFFFF, 0x00FF)  # lo, hi
    f2.write_bytes(bytes(blob))
    with MdbFile(f2) as db:
        with pytest.raises(CorruptDatabaseError, match="beyond file end"):
            db.get(b"k")


def test_pointer_cycle_raises_in_items(tmp_path):
    data = {f"{i}".encode(): b"v" * 200 for i in range(64)}  # branch root
    f = tmp_path / "cycle.lmdb"
    write_mdb(f, data)
    blob = bytearray(f.read_bytes())
    with MdbFile(f) as db:
        root = db.root
        psize = db.psize
    # point the branch root's FIRST child back at the root itself
    off = root * psize
    first_node = struct.unpack_from("<H", blob, off + 16)[0]
    struct.pack_into("<HHH", blob, off + first_node,
                     root & 0xFFFF, (root >> 16) & 0xFFFF, (root >> 32))
    f.write_bytes(bytes(blob))
    with MdbFile(f) as db:
        with pytest.raises(CorruptDatabaseError, match="page count"):
            dict(db.items())


def test_invalid_file_does_not_leak_handle(tmp_path, monkeypatch):
    import builtins

    bad = tmp_path / "bad.lmdb"
    bad.write_bytes(b"\0" * 8192)
    handles = []
    real_open = builtins.open

    def spy(path, *a, **kw):
        fh = real_open(path, *a, **kw)
        handles.append(fh)
        return fh

    monkeypatch.setattr(builtins, "open", spy)
    with pytest.raises(CorruptDatabaseError):
        MdbFile(bad)
    assert handles and all(h.closed for h in handles)


def _reference_dataset_lmdb(path, images, labels):
    """Craft a database in the reference's dataset format: ascii index keys
    with raw uint8 rows plus pickled metadata
    (lmdb_datasets.py:267,:296-299)."""
    mapping = {}
    keys = []
    for i, img in enumerate(images):
        k = f"{i}".encode("ascii")
        keys.append(k)
        mapping[k] = np.ascontiguousarray(img).tobytes()
    mapping[b"__keys__"] = pickle.dumps(keys)
    mapping[b"__labels__"] = pickle.dumps([int(l) for l in labels])
    mapping[b"__len__"] = pickle.dumps(len(keys))
    mapping[b"__shape__"] = pickle.dumps(list(images.shape[1:]))
    write_mdb(path, mapping)


def test_import_reference_dataset(tmp_path):
    from tools.lmdb_import import import_dataset

    rng = np.random.default_rng(1)
    images = rng.integers(0, 256, size=(10, 8, 8, 3), dtype=np.uint8)
    labels = rng.integers(0, 4, size=10)
    src = tmp_path / "CIFAR10_train_10_ToTensorHWC.lmdb"
    _reference_dataset_lmdb(src, images, labels)

    out = tmp_path / "imported"
    import_dataset(src, out, rounds=1)

    from fullbatchtraining_tpu.data.baked import BakedDataset
    store = BakedDataset(out)
    np.testing.assert_array_equal(np.asarray(store.images[0]), images)
    np.testing.assert_array_equal(store.labels[0], labels.astype(np.int32))


def test_import_reference_dataset_chw_and_rounds(tmp_path):
    from tools.lmdb_import import import_dataset

    rng = np.random.default_rng(2)
    images = rng.integers(0, 256, size=(6, 3, 8, 8), dtype=np.uint8)  # CHW
    labels = np.arange(6) % 3
    src = tmp_path / "CIFAR10_train_3_ToTensorR2_CHW.lmdb"
    _reference_dataset_lmdb(src, images, labels)

    out = tmp_path / "imported"
    import_dataset(src, out, rounds=2, channels_first=True)

    from fullbatchtraining_tpu.data.baked import BakedDataset
    store = BakedDataset(out)
    assert store.images.shape == (2, 3, 8, 8, 3)
    np.testing.assert_array_equal(
        np.asarray(store.images).reshape(6, 8, 8, 3),
        images.transpose(0, 2, 3, 1))
    assert store.labels.shape == (2, 3)


def test_import_reference_surface(tmp_path):
    from tools.lmdb_import import import_surface

    positions = [(-1.0,), (0.0,), (1.0,)]
    mapping = {}
    for i, pos in enumerate(positions):
        mapping[pickle.dumps([pos])] = pickle.dumps(
            {"train_loss": 1.0 + i, "train_acc": 0.5, "full_loss": 2.0 + i})
    mapping[b"model_state_dict"] = pickle.dumps({"ignored": 0})
    src = tmp_path / "surface.lmdb"
    write_mdb(src, mapping)

    dst = tmp_path / "out_surface"
    n = import_surface(src, dst)
    assert n == 3

    from fullbatchtraining_tpu.visualization.database import SurfaceStore
    store = SurfaceStore(dst)
    rows = store.results()
    assert len(rows) == 3
    assert rows[store._key((0.0, 0.0))]["train_loss"] == 2.0
