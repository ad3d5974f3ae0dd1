"""torch-free .pth importer: synthesize checkpoints in BOTH torch
serialization layouts (zipfile >=1.6 and legacy <1.6) with plain
pickle + fake torch modules, then round-trip through
models/checkpoint.load_state_dict / pth_to_npz.

The fake writer reproduces torch.save's on-disk layout: persistent-id
('storage', <StorageClass>, key, location, numel) + REDUCE of
torch._utils._rebuild_tensor_v2(storage, offset, size, stride, ...)
inside data.pkl, raw little-endian buffers per storage."""

import io
import os
import pickle
import struct
import sys
import types
import zipfile
from collections import OrderedDict

import numpy as np
import pytest

from ocr_pytorch_spark.models import checkpoint as C

_NP_TO_STORAGE = {
    np.dtype(np.float32): "FloatStorage",
    np.dtype(np.float64): "DoubleStorage",
    np.dtype(np.int64): "LongStorage",
    np.dtype(np.uint8): "ByteStorage",
}


@pytest.fixture()
def fake_torch(monkeypatch):
    """Install just enough of a fake 'torch' for pickle.save_global to
    emit the module paths torch.save writes."""
    torch = types.ModuleType("torch")
    utils = types.ModuleType("torch._utils")

    def _rebuild_tensor_v2(*a):  # never called on the write side
        raise AssertionError

    _rebuild_tensor_v2.__module__ = "torch._utils"
    _rebuild_tensor_v2.__qualname__ = "_rebuild_tensor_v2"
    utils._rebuild_tensor_v2 = _rebuild_tensor_v2
    storage_classes = {}
    for name in _NP_TO_STORAGE.values():
        cls = type(name, (), {"__module__": "torch"})
        setattr(torch, name, cls)
        storage_classes[name] = cls
    torch._utils = utils
    monkeypatch.setitem(sys.modules, "torch", torch)
    monkeypatch.setitem(sys.modules, "torch._utils", utils)
    return torch


class _TensorProxy:
    def __init__(self, arr: np.ndarray, key: str):
        self.arr = arr
        self.key = key

    def __reduce__(self):
        rebuild = sys.modules["torch._utils"]._rebuild_tensor_v2
        storage = _StorageProxy(self.arr, self.key)
        stride = tuple(s // self.arr.itemsize for s in self.arr.strides)
        return (rebuild, (storage, 0, tuple(self.arr.shape), stride,
                          False, OrderedDict()))


class _StorageProxy:
    def __init__(self, arr: np.ndarray, key: str):
        self.arr = arr
        self.key = key


def _pickle_state(sd: "OrderedDict[str, np.ndarray]") -> tuple:
    """-> (data_pkl_bytes, {key: raw_bytes}, [keys in pid order])"""
    keys_seen: list = []
    raw: dict = {}

    class P(pickle.Pickler):
        def persistent_id(self, obj):
            if isinstance(obj, _StorageProxy):
                name = _NP_TO_STORAGE[obj.arr.dtype]
                cls = getattr(sys.modules["torch"], name)
                if obj.key not in raw:
                    keys_seen.append(obj.key)
                    raw[obj.key] = np.ascontiguousarray(obj.arr).tobytes()
                return ("storage", cls, obj.key, "cpu", obj.arr.size)
            return None

    counter = [0]

    def proxy(obj):
        if isinstance(obj, np.ndarray):
            counter[0] += 1
            return _TensorProxy(obj, str(counter[0] - 1))
        if isinstance(obj, (dict, OrderedDict)):
            return OrderedDict((k, proxy(v)) for k, v in obj.items())
        return obj

    buf = io.BytesIO()
    P(buf, protocol=2).dump(proxy(sd))
    return buf.getvalue(), raw, keys_seen


def write_fake_pth_zip(sd, path):
    data_pkl, raw, _ = _pickle_state(sd)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as zf:
        zf.writestr("archive/data.pkl", data_pkl)
        zf.writestr("archive/version", "3\n")
        for key, buf in raw.items():
            zf.writestr(f"archive/data/{key}", buf)


def write_fake_pth_legacy(sd, path):
    data_pkl, raw, keys = _pickle_state(sd)
    with open(path, "wb") as f:
        for head in (0x1950A86A20F9469CFC6C, 1001,
                     {"little_endian": True}):
            pickle.dump(head, f, protocol=2)
        f.write(data_pkl)
        pickle.dump(keys, f, protocol=2)
        arrays = [v for v in sd.values()]
        for key in keys:
            f.write(struct.pack("<q", arrays[int(key)].size))
            f.write(raw[key])


def _sample_sd():
    rng = np.random.default_rng(7)
    return OrderedDict([
        ("conv.weight", rng.normal(size=(4, 3, 3, 3))
         .astype(np.float32)),
        ("conv.bias", rng.normal(size=(4,)).astype(np.float32)),
        ("emb.weight", rng.integers(0, 9, size=(5, 2))
         .astype(np.int64)),
        ("deep.block.0.weight", rng.normal(size=(2, 2))
         .astype(np.float32)),
    ])


@pytest.mark.parametrize("writer", [write_fake_pth_zip,
                                    write_fake_pth_legacy])
def test_roundtrip_both_formats(fake_torch, writer, tmp_path):
    sd = _sample_sd()
    p = str(tmp_path / "m.pth")
    writer(sd, p)
    got = C.load_state_dict(p)
    assert list(got) == list(sd)
    for k in sd:
        assert got[k].dtype == sd[k].dtype, k
        assert np.array_equal(got[k], sd[k]), k


def test_module_prefix_stripped(fake_torch, tmp_path):
    sd = OrderedDict(
        ("module." + k, v) for k, v in _sample_sd().items())
    p = str(tmp_path / "dp.pth")
    write_fake_pth_zip(sd, p)
    out = C.strip_module_prefix(C.load_state_dict(p))
    assert all(not k.startswith("module.") for k in out)


def test_wrapped_checkpoint_unwraps(fake_torch, tmp_path):
    sd = _sample_sd()
    p = str(tmp_path / "w.pth")
    write_fake_pth_zip(OrderedDict([("state_dict", sd)]), p)
    got = C.load_state_dict(p)
    assert list(got) == list(sd)
    for k in sd:
        assert np.array_equal(got[k], sd[k]), k


def test_disallowed_global_rejected(fake_torch, tmp_path):
    p = str(tmp_path / "evil.pth")
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr("archive/data.pkl",
                    pickle.dumps(os.system, protocol=2))
        zf.writestr("archive/version", "3\n")
    with pytest.raises(Exception):
        C.load_state_dict(p)


def test_real_weights_drop_in(fake_torch, tmp_path, bundled_weights,
                              fixture_cfg):
    """A checkpoint whose keys/shapes mirror the reference state_dict
    (which models/weights.py already does) converts to .npz and runs
    the full OCR forward with identical results."""
    from ocr_pytorch_spark import datagen, oracle
    from ocr_pytorch_spark.models import weights as W

    ctpn_w, crnn_w = bundled_weights
    pth = str(tmp_path / "ctpn.pth")
    write_fake_pth_zip(OrderedDict(ctpn_w.items()), pth)
    npz = str(tmp_path / "ctpn.npz")
    shapes = C.pth_to_npz(pth, npz)
    assert shapes.keys() == ctpn_w.keys()
    loaded = W.load_npz(npz)
    for k in ctpn_w:
        assert np.array_equal(loaded[k], ctpn_w[k]), k

    img, _ = datagen.gen_image_array("img-ckpt-0000")
    want = oracle.ocr_image(img, ctpn_w, crnn_w, fixture_cfg)
    got = oracle.ocr_image(img, loaded, crnn_w, fixture_cfg)
    assert got == want


def test_bad_magic_rejected(tmp_path):
    p = str(tmp_path / "bad.pth")
    with open(p, "wb") as f:
        pickle.dump(12345, f, protocol=2)  # wrong magic
        f.write(b"garbage")
    with pytest.raises(ValueError):
        C.load_state_dict(p)


def test_truncated_zip_rejected(fake_torch, tmp_path):
    sd = _sample_sd()
    p = str(tmp_path / "trunc.pth")
    write_fake_pth_zip(sd, p)
    data = open(p, "rb").read()
    with open(p, "wb") as f:
        f.write(data[:len(data) // 2])
    with pytest.raises(Exception):
        C.load_state_dict(p)


def test_legacy_header_pickle_cannot_execute(fake_torch, tmp_path):
    """The legacy format's non-object pickle sections (magic, protocol,
    sys_info, key list) are attacker-controlled too: a __reduce__
    payload in ANY of them must be rejected, never executed."""
    canary = str(tmp_path / "pwned")

    class Evil:
        def __reduce__(self):
            return (os.system, (f"touch {canary}",))

    sd = _sample_sd()
    good = str(tmp_path / "good.pth")
    write_fake_pth_legacy(sd, good)
    blob = open(good, "rb").read()
    magic_pkl = pickle.dumps(0x1950A86A20F9469CFC6C, protocol=2)

    # payload in the magic slot
    evil1 = str(tmp_path / "evil1.pth")
    with open(evil1, "wb") as f:
        f.write(pickle.dumps(Evil(), protocol=2))
        f.write(blob[len(magic_pkl):])
    with pytest.raises(Exception):
        C.load_state_dict(evil1)
    assert not os.path.exists(canary)

    # payload in the sys_info slot (3rd section)
    evil2 = str(tmp_path / "evil2.pth")
    with open(evil2, "wb") as f:
        pickle.dump(0x1950A86A20F9469CFC6C, f, protocol=2)
        pickle.dump(1001, f, protocol=2)
        f.write(pickle.dumps(Evil(), protocol=2))
    with pytest.raises(Exception):
        C.load_state_dict(evil2)
    assert not os.path.exists(canary)


def test_legacy_key_list_validated(fake_torch, tmp_path):
    """Storage-key list must be list[str]; anything else is rejected."""
    sd = _sample_sd()
    data_pkl, raw, keys = _pickle_state(sd)
    p = str(tmp_path / "badkeys.pth")
    with open(p, "wb") as f:
        for head in (0x1950A86A20F9469CFC6C, 1001,
                     {"little_endian": True}):
            pickle.dump(head, f, protocol=2)
        f.write(data_pkl)
        pickle.dump({"not": "a list"}, f, protocol=2)
    with pytest.raises(ValueError, match="list"):
        C.load_state_dict(p)


def test_legacy_oversized_storage_rejected(fake_torch, tmp_path):
    """A storage claiming more elements than bytes remain in the file
    must raise instead of silently short-reading."""
    sd = _sample_sd()
    data_pkl, raw, keys = _pickle_state(sd)
    p = str(tmp_path / "oversz.pth")
    with open(p, "wb") as f:
        for head in (0x1950A86A20F9469CFC6C, 1001,
                     {"little_endian": True}):
            pickle.dump(head, f, protocol=2)
        f.write(data_pkl)
        pickle.dump(keys, f, protocol=2)
        f.write(struct.pack("<q", 1 << 40))  # absurd element count
        f.write(raw[keys[0]])
    with pytest.raises(ValueError, match="remain"):
        C.load_state_dict(p)


def test_out_of_bounds_tensor_view_rejected(fake_torch, tmp_path):
    """Checkpoint-controlled size/stride may not read outside the
    storage buffer (as_strided would otherwise return garbage or
    segfault)."""
    ref = C._StorageRef(np.float32, "0", 4)
    storage = {"0": np.arange(4, dtype=np.float32).tobytes()}
    with pytest.raises(ValueError, match="corrupt"):
        C._rebuild_tensor(storage, ref, 0, (100, 100), (100, 1))
    with pytest.raises(ValueError, match="corrupt"):
        C._rebuild_tensor(storage, ref, -1, (2,), (1,))
    with pytest.raises(ValueError, match="corrupt"):
        C._rebuild_tensor(storage, ref, 0, (2, 2), (-2, 1))
    # in-bounds views still work, both contiguous and strided
    assert np.array_equal(
        C._rebuild_tensor(storage, ref, 0, (2, 2), (2, 1)),
        [[0, 1], [2, 3]])
    assert np.array_equal(
        C._rebuild_tensor(storage, ref, 0, (2,), (3,)), [0, 3])
    assert C._rebuild_tensor(storage, ref, 2, (), ()) == 2.0


def test_non_dict_checkpoint_rejected(fake_torch, tmp_path):
    import zipfile as zf_mod

    p = str(tmp_path / "notdict.pth")
    with zf_mod.ZipFile(p, "w") as zf:
        zf.writestr("archive/data.pkl", pickle.dumps([1, 2, 3],
                                                     protocol=2))
        zf.writestr("archive/version", "3\n")
    with pytest.raises(ValueError):
        C.load_state_dict(p)
