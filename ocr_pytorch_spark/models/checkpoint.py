"""torch-free .pth checkpoint importer.

The reference loads pretrained state_dicts with torch.load
(detect/ctpn_predict.py:25-27 ``torch.load(weights, map_location=...)``
and recognize/crnn_recognizer.py:110-113); this module reads the same
files without torch so published checkpoints drop into
``models/weights.py``'s name/shape-matching layers (converted to .npz).

Both torch serialization formats are supported:

* **zipfile format** (torch >= 1.6): a zip containing
  ``<name>/data.pkl`` (pickled object; tensors appear as persistent-id
  storages rebuilt via ``torch._utils._rebuild_tensor_v2``) plus one
  raw little-endian buffer per storage under ``<name>/data/<key>``.
* **legacy format** (torch < 1.6, what a 2019-era checkpoint like the
  reference's ctpn.pth/crnn.pth uses): magic-number pickle, protocol,
  sys_info, the object pickle, the list of storage keys, then each
  storage's bytes prefixed by an int64 element count, in key-list
  order.

Unpickling is restricted: only torch storage classes, the two tensor
rebuild helpers, and basic containers resolve; anything else raises —
a checkpoint cannot execute code here.  That guarantee covers EVERY
pickle section in both formats: the legacy header sections (magic,
protocol, sys_info) and the storage-key list go through a primitive
unpickler with no globals and no persistent ids at all, storage sizes
are validated against the bytes actually left in the file, and tensor
views are bounds-checked against their storage before construction, so
a corrupt or malicious checkpoint fails loudly instead of executing
code or reading out of bounds.
"""

from __future__ import annotations

import io
import os
import pickle
import struct
import zipfile
from collections import OrderedDict

import numpy as np

_MAGIC = 0x1950A86A20F9469CFC6C

_DTYPES = {
    "FloatStorage": np.float32,
    "DoubleStorage": np.float64,
    "HalfStorage": np.float16,
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
}


class _StorageRef:
    __slots__ = ("dtype", "key", "numel")

    def __init__(self, dtype, key, numel):
        self.dtype, self.key, self.numel = dtype, key, numel


def _rebuild_tensor(storage_bytes, ref: _StorageRef, offset, size,
                    stride) -> np.ndarray:
    buf = storage_bytes[ref.key]
    flat = np.frombuffer(buf, dtype=ref.dtype)
    if not size:
        if not 0 <= offset < flat.size:
            raise ValueError(
                f"corrupt checkpoint: scalar offset {offset} outside "
                f"storage of {flat.size} elements")
        return flat[offset].copy()
    size = tuple(int(s) for s in size)
    stride = tuple(int(s) for s in stride)
    if (offset < 0 or len(size) != len(stride)
            or any(s < 0 for s in size) or any(s < 0 for s in stride)):
        raise ValueError(
            "corrupt checkpoint: negative/mismatched tensor "
            f"offset={offset} size={size} stride={stride}")
    if 0 in size:
        return np.empty(size, dtype=ref.dtype)
    # the view must stay inside the storage buffer: last reachable
    # element is offset + sum((dim-1) * stride_dim)
    span = offset + 1 + sum((s - 1) * st for s, st in zip(size, stride))
    if span > flat.size:
        raise ValueError(
            f"corrupt checkpoint: tensor view needs {span} elements "
            f"but storage {ref.key!r} has {flat.size}")
    contig = []
    acc = 1
    for s in reversed(size):
        contig.append(acc)
        acc *= s
    if stride == tuple(reversed(contig)):  # common contiguous case
        return flat[offset:offset + acc].reshape(size).copy()
    arr = np.lib.stride_tricks.as_strided(
        flat[offset:], shape=size,
        strides=tuple(s * flat.itemsize for s in stride))
    return np.ascontiguousarray(arr)


class _PrimitiveUnpickler(pickle.Unpickler):
    """For the legacy header/key sections: these hold only primitives
    (ints, dicts of str, list of str), so NO global may resolve and NO
    persistent id may appear — stock pickle.load here would hand an
    attacker __reduce__ execution before the main pickle's allow-list
    is ever consulted."""

    def find_class(self, module, name):
        raise pickle.UnpicklingError(
            f"checkpoint header references global {module}.{name}")

    def persistent_load(self, pid):
        raise pickle.UnpicklingError(
            "unexpected persistent id in checkpoint header")


def _load_primitive(f):
    return _PrimitiveUnpickler(f, encoding="latin1").load()


class _Unpickler(pickle.Unpickler):
    """find_class allow-list + torch persistent-id storage protocol."""

    def __init__(self, f, storage_bytes: dict):
        super().__init__(f, encoding="latin1")
        self._storage_bytes = storage_bytes
        self.storage_dtypes: dict = {}  # key -> np dtype (legacy reader)

    def find_class(self, module, name):
        if name in _DTYPES and module in ("torch", "torch.storage"):
            return ("storage_class", _DTYPES[name])
        if (module, name) == ("torch._utils", "_rebuild_tensor_v2"):
            return self._rebuild_v2
        if (module, name) == ("torch._utils", "_rebuild_tensor"):
            return self._rebuild_v1
        if (module, name) == ("collections", "OrderedDict"):
            return OrderedDict
        if (module, name) == ("torch", "Size"):
            return tuple
        raise pickle.UnpicklingError(
            f"checkpoint references disallowed global {module}.{name}")

    def _rebuild_v2(self, storage, offset, size, stride,
                    requires_grad=False, backward_hooks=None,
                    *extra):
        return _rebuild_tensor(self._storage_bytes, storage, offset,
                               size, stride)

    def _rebuild_v1(self, storage, offset, size, stride):
        return _rebuild_tensor(self._storage_bytes, storage, offset,
                               size, stride)

    def persistent_load(self, pid):
        if not (isinstance(pid, tuple) and pid and pid[0] == "storage"):
            raise pickle.UnpicklingError(f"unknown persistent id {pid!r}")
        storage_class, key, _location, numel = pid[1:5]
        kind, dtype = storage_class
        assert kind == "storage_class"
        self.storage_dtypes[key] = dtype
        return _StorageRef(dtype, key, numel)


def _load_zip(path: str):
    with zipfile.ZipFile(path) as zf:
        names = zf.namelist()
        pkl_name = next(n for n in names if n.endswith("/data.pkl")
                        or n == "data.pkl")
        prefix = pkl_name[:-len("data.pkl")]
        storage_bytes = {}
        for n in names:
            if n.startswith(prefix + "data/"):
                storage_bytes[n[len(prefix) + 5:]] = zf.read(n)
        # two passes are unnecessary: storages are all read above, and
        # the unpickler materializes tensors eagerly during load
        up = _Unpickler(io.BytesIO(zf.read(pkl_name)), storage_bytes)
        return up.load()


def _load_legacy(path: str):
    file_size = os.path.getsize(path)
    with open(path, "rb") as f:
        magic = _load_primitive(f)
        if magic != _MAGIC:
            raise ValueError("not a torch legacy checkpoint (bad magic)")
        _load_primitive(f)  # protocol version
        _load_primitive(f)  # sys_info
        # the object pickle references storages lazily; record refs now,
        # fill bytes after reading the storage section
        storage_bytes: dict = {}
        up = _Unpickler(f, storage_bytes)
        # legacy tensors must defer materialization until bytes exist:
        # collect thunks, run after the storage section is read
        deferred = []

        def rebuild_later(storage, offset, size, stride, *rest):
            holder = {}
            deferred.append((holder, storage, offset, size, stride))
            return holder

        up._rebuild_v2 = rebuild_later  # type: ignore[assignment]
        up._rebuild_v1 = rebuild_later  # type: ignore[assignment]
        obj = up.load()
        keys = _load_primitive(f)
        if not (isinstance(keys, list)
                and all(isinstance(k, str) for k in keys)):
            raise ValueError(
                "corrupt checkpoint: storage key list is not list[str]")
        for key in keys:
            if key not in up.storage_dtypes:
                raise ValueError(
                    f"corrupt checkpoint: storage key {key!r} never "
                    f"referenced by the object pickle")
            numel = struct.unpack("<q", f.read(8))[0]
            itemsize = np.dtype(up.storage_dtypes[key]).itemsize
            nbytes = numel * itemsize
            if numel < 0 or nbytes > file_size - f.tell():
                raise ValueError(
                    f"corrupt checkpoint: storage {key!r} claims "
                    f"{numel} elements ({nbytes} bytes) but only "
                    f"{file_size - f.tell()} bytes remain")
            storage_bytes[key] = f.read(nbytes)
        placeholder_map = {}
        for holder, storage, offset, size, stride in deferred:
            placeholder_map[id(holder)] = _rebuild_tensor(
                storage_bytes, storage, offset, size, stride)

        def fix(o):
            if isinstance(o, dict) and id(o) in placeholder_map:
                return placeholder_map[id(o)]
            if isinstance(o, OrderedDict):
                return OrderedDict((k, fix(v)) for k, v in o.items())
            if isinstance(o, dict):
                return {k: fix(v) for k, v in o.items()}
            if isinstance(o, (list, tuple)):
                t = type(o)
                return t(fix(v) for v in o)
            return o

        return fix(obj)


def load_state_dict(path: str) -> "OrderedDict[str, np.ndarray]":
    """torch .pth -> {name: ndarray}.  Accepts either serialization
    format; unwraps common checkpoint wrappers
    ({'state_dict'/'model'/'model_state_dict': ...})."""
    obj = _load_zip(path) if zipfile.is_zipfile(path) \
        else _load_legacy(path)
    for wrapper in ("state_dict", "model_state_dict", "model"):
        if isinstance(obj, dict) and wrapper in obj \
                and isinstance(obj[wrapper], dict):
            obj = obj[wrapper]
    if not isinstance(obj, dict):
        raise ValueError(f"checkpoint did not contain a state_dict "
                         f"(got {type(obj).__name__})")
    out = OrderedDict()
    for k, v in obj.items():
        if isinstance(v, np.ndarray):
            out[str(k)] = v
    return out


def strip_module_prefix(sd: dict) -> "OrderedDict[str, np.ndarray]":
    """DataParallel checkpoints prefix every key with 'module.' —
    the reference strips it the same way (crnn_recognizer.py:111-113)."""
    return OrderedDict(
        (k[len("module."):] if k.startswith("module.") else k, v)
        for k, v in sd.items())


def pth_to_npz(pth_path: str, npz_path: str) -> dict:
    """Convert a checkpoint; returns {name: shape} of what was written.
    Keys already match models/weights.py layer names (both mirror the
    reference modules), so the .npz drops into file_weights_spec()."""
    from ocr_pytorch_spark.models.weights import save_npz

    sd = strip_module_prefix(load_state_dict(pth_path))
    save_npz(npz_path, dict(sd))
    return {k: tuple(v.shape) for k, v in sd.items()}


def main(argv=None) -> None:  # pragma: no cover - thin CLI
    import argparse

    ap = argparse.ArgumentParser(
        description="convert torch .pth checkpoints to .npz")
    ap.add_argument("pth")
    ap.add_argument("npz")
    args = ap.parse_args(argv)
    shapes = pth_to_npz(args.pth, args.npz)
    print(f"wrote {args.npz}: {len(shapes)} tensors")


if __name__ == "__main__":  # pragma: no cover
    main()
