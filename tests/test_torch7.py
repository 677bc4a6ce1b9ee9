"""Torch7 checkpoint import: the t7 reader and the weight mapper.

Verification strategy (independence from the code under test):

* the reader's format constants are pinned by a HAND-PACKED byte fixture
  (struct.pack'd from the documented record layout, not produced by the
  test encoder below);
* the mapper is checked end-to-end against NCHW-NATIVE PyTorch forwards
  that mirror models.lua literally (nn.View reshapes as (C,H,W), Concat
  on the channel dim, flatten C-major) — the same independent-wiring idea
  as tests/test_torch_model_crosscheck.py, but here the weights originate
  on the TORCH side in torch layouts, travel through a serialized t7
  file, and must land in our pytrees expressing the identical function.
"""
from __future__ import annotations

import io
import struct

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from ganreverser_tpu import models as M
from ganreverser_tpu.io import checkpoint as gio
from ganreverser_tpu.io import torch7
from ganreverser_tpu.io.import_t7 import import_t7, map_module

torch.manual_seed(0)


# ---------------------------------------------------------------------------
# a minimal t7 writer (test-side only; the product ships only the reader)
# ---------------------------------------------------------------------------

class T7Obj:
    def __init__(self, cls, **payload):
        self.cls = cls
        self.payload = payload


class _Writer:
    def __init__(self):
        self.buf = io.BytesIO()
        self.idx = 0

    def _i32(self, v):
        self.buf.write(struct.pack("<i", v))

    def _i64(self, v):
        self.buf.write(struct.pack("<q", v))

    def _f64(self, v):
        self.buf.write(struct.pack("<d", v))

    def _str(self, s):
        b = s.encode()
        self._i32(len(b))
        self.buf.write(b)

    def _next_idx(self):
        self.idx += 1
        return self.idx

    def obj(self, o):
        if o is None:
            self._i32(0)
        elif isinstance(o, bool):
            self._i32(5)
            self._i32(1 if o else 0)
        elif isinstance(o, (int, float)):
            self._i32(1)
            self._f64(float(o))
        elif isinstance(o, str):
            self._i32(2)
            self._str(o)
        elif isinstance(o, np.ndarray):
            self.tensor(o)
        elif isinstance(o, dict):
            self._i32(3)
            self._i32(self._next_idx())
            self._i32(len(o))
            for k, v in o.items():
                self.obj(k)
                self.obj(v)
        elif isinstance(o, (list, tuple)):
            self.obj({i + 1: v for i, v in enumerate(o)})
        elif isinstance(o, T7Obj):
            self._i32(4)
            self._i32(self._next_idx())
            self._str("V 1")
            self._str(o.cls)
            self.obj(dict(o.payload))
        else:
            raise TypeError(type(o))

    def tensor(self, arr, cls="torch.FloatTensor"):
        arr = np.ascontiguousarray(arr, dtype=np.float32)
        self._i32(4)
        self._i32(self._next_idx())
        self._str("V 1")
        self._str(cls)
        self._i32(arr.ndim)
        for s in arr.shape:
            self._i64(s)
        for s in arr.strides:
            self._i64(s // 4)
        self._i64(1)  # storageOffset (1-based)
        # storage
        self._i32(4)
        self._i32(self._next_idx())
        self._str("V 1")
        self._str(cls.replace("Tensor", "Storage"))
        self._i64(arr.size)
        self.buf.write(arr.tobytes())


def t7_bytes(obj) -> bytes:
    w = _Writer()
    w.obj(obj)
    return w.buf.getvalue()


def t7_file(tmp_path, name, obj) -> str:
    p = tmp_path / name
    p.write_bytes(t7_bytes(obj))
    return str(p)


def t7_decode(obj):
    """Serialize with the test writer, read back with the real reader —
    map_module consumes decoded TorchObjects, not writer handles."""
    return torch7._Reader(io.BytesIO(t7_bytes(obj))).read_object()


# ---------------------------------------------------------------------------
# serialized-module builders from live PyTorch layers (torch layouts)
# ---------------------------------------------------------------------------

def _np(t):
    return t.detach().numpy().astype(np.float32)


def t7_seq(mods):
    return T7Obj("nn.Sequential", modules=list(mods))


def t7_linear(lin):
    return T7Obj("nn.Linear", weight=_np(lin.weight), bias=_np(lin.bias))


def t7_conv(conv, cls="cudnn.SpatialConvolution"):
    return T7Obj(cls, weight=_np(conv.weight), bias=_np(conv.bias),
                 nInputPlane=conv.in_channels, nOutputPlane=conv.out_channels,
                 kH=conv.kernel_size[0], kW=conv.kernel_size[1])


def t7_bn(bn, spatial):
    return T7Obj(
        "nn.SpatialBatchNormalization" if spatial
        else "nn.BatchNormalization",
        weight=_np(bn.weight), bias=_np(bn.bias),
        running_mean=_np(bn.running_mean), running_var=_np(bn.running_var),
        eps=bn.eps)


def t7_prelu(p):
    return T7Obj("nn.PReLU", weight=_np(p.weight))


def _skip(cls):
    return T7Obj(cls)


def _rand_bn(n, spatial):
    bn = (torch.nn.BatchNorm2d if spatial else torch.nn.BatchNorm1d)(n)
    with torch.no_grad():
        bn.weight.copy_(torch.rand(n) + 0.5)
        bn.bias.copy_(torch.randn(n) * 0.1)
        bn.running_mean.copy_(torch.randn(n) * 0.2)
        bn.running_var.copy_(torch.rand(n) + 0.5)
    return bn.eval()


def _bn_f(x, bn):
    return F.batch_norm(x, bn.running_mean, bn.running_var, bn.weight,
                        bn.bias, training=False, eps=bn.eps)


# ---------------------------------------------------------------------------
# reader format constants — hand-packed fixture
# ---------------------------------------------------------------------------

def test_reader_handpacked_bytes():
    """Byte-level pin of the record layout: int32 tags, float64 numbers,
    size-prefixed strings, memo indices, 'V 1'-versioned torch classes,
    int64 tensor geometry with 1-based storage offsets."""
    b = b""
    b += struct.pack("<i", 3)          # TYPE_TABLE
    b += struct.pack("<i", 1)          # memo index
    b += struct.pack("<i", 3)          # three pairs
    # "num" -> 4.5
    b += struct.pack("<i", 2) + struct.pack("<i", 3) + b"num"
    b += struct.pack("<i", 1) + struct.pack("<d", 4.5)
    # "flag" -> true
    b += struct.pack("<i", 2) + struct.pack("<i", 4) + b"flag"
    b += struct.pack("<i", 5) + struct.pack("<i", 1)
    # "t" -> FloatTensor [[1,2,3],[4,5,6]]
    b += struct.pack("<i", 2) + struct.pack("<i", 1) + b"t"
    b += struct.pack("<i", 4)          # TYPE_TORCH
    b += struct.pack("<i", 2)          # memo index
    b += struct.pack("<i", 3) + b"V 1"
    b += struct.pack("<i", 17) + b"torch.FloatTensor"
    b += struct.pack("<i", 2)          # ndim
    b += struct.pack("<q", 2) + struct.pack("<q", 3)   # sizes
    b += struct.pack("<q", 3) + struct.pack("<q", 1)   # strides
    b += struct.pack("<q", 1)          # storageOffset (1-based)
    b += struct.pack("<i", 4)          # storage: TYPE_TORCH
    b += struct.pack("<i", 3)          # memo index
    b += struct.pack("<i", 3) + b"V 1"
    b += struct.pack("<i", 18) + b"torch.FloatStorage"
    b += struct.pack("<q", 6)
    b += np.arange(1, 7, dtype="<f4").tobytes()

    got = torch7._Reader(io.BytesIO(b)).read_object()
    assert got["num"] == 4.5
    assert got["flag"] is True
    np.testing.assert_array_equal(got["t"],
                                  [[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]])


def test_reader_roundtrips_writer():
    obj = {"s": "hello", "n": 7, "nested": {1: 1.5, 2: None},
           "arr": np.arange(12, dtype=np.float32).reshape(3, 4)}
    got = torch7._Reader(io.BytesIO(t7_bytes(obj))).read_object()
    assert got["s"] == "hello" and got["n"] == 7
    assert got["nested"][1] == 1.5 and got["nested"][2] is None
    np.testing.assert_array_equal(got["arr"], obj["arr"])


def test_reader_strided_and_offset_tensor():
    """Non-contiguous serialized tensors (transposed views / narrowed
    slices survive torch.save) reconstruct by strides + offset."""
    w = _Writer()
    w._i32(4)
    w._i32(w._next_idx())
    w._str("V 1")
    w._str("torch.FloatTensor")
    w._i32(2)
    w._i64(2), w._i64(3)          # sizes (2,3)
    w._i64(1), w._i64(2)          # strides: column-major (a transpose)
    w._i64(2)                     # offset: skip the first element
    w._i32(4)                     # the storage record
    w._i32(w._next_idx())
    w._str("V 1")
    w._str("torch.FloatStorage")
    w._i64(10)
    w.buf.write(np.arange(10, dtype="<f4").tobytes())
    got = torch7._Reader(io.BytesIO(w.buf.getvalue())).read_object()
    # storage = [0..9], offset 1 → base 1; [[1,3,5],[2,4,6]]
    np.testing.assert_array_equal(got, [[1, 3, 5], [2, 4, 6]])


def test_cuda_classes_read_as_float():
    arr = np.arange(4, dtype=np.float32)
    w = _Writer()
    w.tensor(arr, cls="torch.CudaTensor")
    got = torch7._Reader(io.BytesIO(w.buf.getvalue())).read_object()
    np.testing.assert_array_equal(got, arr)


# ---------------------------------------------------------------------------
# G3: Linear->BN1d->View(C,H,W) permutation + conv stack
# ---------------------------------------------------------------------------

def build_g3(nd=8, c=3, h=16, w=16, cuda=False):
    """A reference-layout serialized G3 (models.lua:104-143) with a live
    PyTorch forward — geometry-parameterized so benchmarks/
    make_t7_fixture.py can emit drop-in .net files at any size."""
    sh, sw = h // 4, w // 4
    lin = torch.nn.Linear(nd, 512 * sh * sw)
    bn0 = _rand_bn(512 * sh * sw, spatial=False)
    c1 = torch.nn.Conv2d(512, 256, 3, padding=1)
    bn1 = _rand_bn(256, spatial=True)
    c2 = torch.nn.Conv2d(256, 128, 3, padding=1)
    bn2 = _rand_bn(128, spatial=True)
    c3 = torch.nn.Conv2d(128, c, 3, padding=1)

    @torch.no_grad()
    def forward(z):  # models.lua:115-133, literal NCHW
        x = F.relu(_bn_f(lin(z), bn0))
        x = x.view(-1, 512, sh, sw)                      # nn.View(512,sh,sw)
        x = F.interpolate(x, scale_factor=2, mode="nearest")
        x = F.relu(_bn_f(c1(x), bn1))
        x = F.interpolate(x, scale_factor=2, mode="nearest")
        x = F.relu(_bn_f(c2(x), bn2))
        return torch.sigmoid(c3(x))

    mods = [
        t7_linear(lin), t7_bn(bn0, False), _skip("cudnn.ReLU"),
        _skip("nn.View"),
        _skip("nn.SpatialUpSamplingNearest"), t7_conv(c1),
        t7_bn(bn1, True), _skip("cudnn.ReLU"),
        _skip("nn.SpatialUpSamplingNearest"), t7_conv(c2),
        t7_bn(bn2, True), _skip("cudnn.ReLU"),
        t7_conv(c3), _skip("nn.Sigmoid"),
    ]
    if cuda:  # models.lua:107-108, 135-136
        mods = [_skip("nn.Copy")] + mods + [_skip("nn.Copy")]
    return dict(nd=nd, dims=(c, h, w), forward=forward, tree=t7_seq(mods))


@pytest.fixture(scope="module")
def g3_torch():
    return build_g3()


def test_g3_import_forward_parity(g3_torch):
    nd, dims = g3_torch["nd"], g3_torch["dims"]
    G = M.create_G(dims, nd)
    gv = map_module(G, t7_decode(g3_torch["tree"]), (nd,), "G")

    z = np.random.default_rng(1).normal(size=(4, nd)).astype(np.float32)
    theirs = g3_torch["forward"](torch.from_numpy(z)).numpy()
    ours, _ = G.apply(jax.tree.map(jnp.asarray, gv), jnp.asarray(z),
                      train=False)
    np.testing.assert_allclose(np.asarray(ours),
                               theirs.transpose(0, 2, 3, 1),
                               atol=2e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# D2: nested Sequentials, nn.Concat branches, Flatten->Linear permutation
# ---------------------------------------------------------------------------

def build_d2(c=3, h=16, w=16, cuda=False):
    """A reference-layout serialized D2 (models.lua:272-337) with a live
    PyTorch forward — geometry-parameterized (h, w divisible by 8)."""

    def nxn(cin, cout, k, dropout):
        conv = torch.nn.Conv2d(cin, cout, k, padding=(k - 1) // 2)
        pre = torch.nn.PReLU()
        with torch.no_grad():
            pre.weight.fill_(0.35)
        mods = [t7_conv(conv, "nn.SpatialConvolution"), t7_prelu(pre)]
        if dropout > 0:
            mods.append(_skip("nn.SpatialDropout"))
        return (conv, pre), t7_seq(mods)

    (c1, p1), s1 = nxn(c, 128, 3, 0)
    (c2, p2), s2 = nxn(128, 128, 3, 0.2)
    (lc, lp), ls = nxn(128, 64, 5, 0.2)
    llin = torch.nn.Linear(64 * (h // 4) * (w // 4), 512)
    lpre = torch.nn.PReLU()
    (r1, rp1), rs1 = nxn(128, 128, 3, 0.2)
    (r2, rp2), rs2 = nxn(128, 256, 3, 0.2)
    (r3, rp3), rs3 = nxn(256, 256, 3, 0.2)
    rlin = torch.nn.Linear(256 * (h // 8) * (w // 8), 512)
    rpre = torch.nn.PReLU()
    top1 = torch.nn.Linear(1024, 256)
    tpre = torch.nn.PReLU()
    top2 = torch.nn.Linear(256, 1)

    def prelu(x, p):
        return F.prelu(x, p.weight)

    @torch.no_grad()
    def forward(imgs):  # models.lua:283-327, literal NCHW
        x = prelu(c1(imgs), p1)
        x = prelu(c2(x), p2)
        x = F.max_pool2d(x, 2)
        lx = prelu(lc(x), lp)
        lx = F.max_pool2d(lx, 2)
        lx = lx.reshape(lx.shape[0], -1)                # nn.View: C-major
        lx = prelu(llin(lx), lpre)
        rx = prelu(r1(x), rp1)
        rx = F.max_pool2d(rx, 2)
        rx = prelu(r2(rx), rp2)
        rx = prelu(r3(rx), rp3)
        rx = F.max_pool2d(rx, 2)
        rx = rx.reshape(rx.shape[0], -1)
        rx = prelu(rlin(rx), rpre)
        y = torch.cat([lx, rx], dim=1)                  # nn.Concat(2)
        y = prelu(top1(y), tpre)
        return torch.sigmoid(top2(y))

    left = t7_seq([ls, _skip("nn.SpatialMaxPooling"), _skip("nn.View"),
                   t7_linear(llin), t7_prelu(lpre), _skip("nn.Dropout")])
    right = t7_seq([rs1, _skip("nn.SpatialMaxPooling"), rs2, rs3,
                    _skip("nn.SpatialMaxPooling"), _skip("nn.View"),
                    t7_linear(rlin), t7_prelu(rpre)])
    mods = [
        s1, s2, _skip("nn.SpatialMaxPooling"),
        T7Obj("nn.Concat", modules=[left, right]),
        t7_linear(top1), t7_prelu(tpre), _skip("nn.Dropout"),
        t7_linear(top2), _skip("nn.Sigmoid"),
    ]
    if cuda:  # models.lua:284-285, 329-330
        mods = [_skip("nn.Copy")] + mods + [_skip("nn.Copy")]
    return dict(dims=(c, h, w), forward=forward, tree=t7_seq(mods))


@pytest.fixture(scope="module")
def d2_torch():
    return build_d2()


def test_d2_import_forward_parity(d2_torch):
    dims = d2_torch["dims"]
    c, h, w = dims
    D = M.create_D(dims)
    dv = map_module(D, t7_decode(d2_torch["tree"]), (h, w, c), "D")

    imgs = np.random.default_rng(2).uniform(
        size=(4, c, h, w)).astype(np.float32)
    theirs = d2_torch["forward"](torch.from_numpy(imgs)).numpy()
    ours, _ = D.apply(jax.tree.map(jnp.asarray, dv),
                      jnp.asarray(imgs.transpose(0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-4,
                               rtol=1e-3)


# ---------------------------------------------------------------------------
# R: flat conv stack + Flatten->Linear + geometry inference from the file
# ---------------------------------------------------------------------------

def _r_torch(noise_method="uniform", fixer=False, cuda=False,
             nd=6, c=3, h=16, w=16):
    convs, bns = [], []
    cin = c
    for feat in (64, 64, 64, 128, 128, 128):
        convs.append(torch.nn.Conv2d(cin, feat, 3, padding=1))
        bns.append(_rand_bn(feat, spatial=True))
        cin = feat
    head = torch.nn.Linear(128 * (h // 4) * (w // 4), 512)
    hbn = _rand_bn(512, spatial=False)
    out = torch.nn.Linear(512, nd)

    @torch.no_grad()
    def forward(imgs):  # models.lua:389-464 literal (dropout=eval identity)
        x = imgs
        for i in range(3):
            x = F.elu(_bn_f(convs[i](x), bns[i]))
        x = F.max_pool2d(x, 2)
        for i in range(3, 6):
            x = F.elu(_bn_f(convs[i](x), bns[i]))
        x = F.max_pool2d(x, 2)
        x = x.reshape(x.shape[0], -1)
        x = F.elu(_bn_f(head(x), hbn))
        z = out(x)
        return torch.tanh(z) if noise_method == "uniform" else z

    mods = []
    if cuda:  # models.lua:393-395 — GPU-trained files keep the wrapper
        mods.append(_skip("nn.Copy"))
    if fixer:
        mods.append(_skip("nn.Dropout"))
    for i in range(6):
        mods += [t7_conv(convs[i], "nn.SpatialConvolution"),
                 t7_bn(bns[i], True), _skip("nn.ELU"),
                 _skip("nn.Dropout")]
        if i in (2, 5):
            mods.append(_skip("nn.SpatialMaxPooling"))
    mods += [_skip("nn.View"), t7_linear(head), t7_bn(hbn, False),
             _skip("nn.ELU"), _skip("nn.Dropout"), t7_linear(out)]
    if noise_method == "uniform":
        mods.append(_skip("nn.Tanh"))
    if cuda:  # models.lua:458-459
        mods.append(_skip("nn.Copy"))
    return dict(nd=nd, dims=(c, h, w), forward=forward,
                tree=t7_seq(mods), noise_method=noise_method)


@pytest.mark.parametrize("noise_method", ["normal", "uniform"])
def test_r_import_forward_parity(noise_method):
    r = _r_torch(noise_method)
    c, h, w = r["dims"]
    R = M.create_R(r["dims"], r["nd"], noise_method)
    rv = map_module(R, t7_decode(r["tree"]), (h, w, c), "R")

    imgs = np.random.default_rng(3).uniform(
        size=(4, c, h, w)).astype(np.float32)
    theirs = r["forward"](torch.from_numpy(imgs)).numpy()
    ours, _ = R.apply(jax.tree.map(jnp.asarray, rv),
                      jnp.asarray(imgs.transpose(0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-4,
                               rtol=1e-3)


def test_r_file_import_infers_geometry(tmp_path):
    r = _r_torch("uniform")
    path = t7_file(tmp_path, "r_3x16x16.net",
                   {"R": r["tree"],
                    "opt": {"batchSize": 32, "R_L2": 1e-4, "seed": 1,
                            "fixer": False}})
    ckpt = import_t7(path, str(tmp_path / "out"), verbose=False)
    tree, cfg, _ = gio.load_checkpoint(ckpt)
    assert cfg["height"] == 16 and cfg["width"] == 16
    assert cfg["noiseDim"] == r["nd"]
    assert cfg["noiseMethod"] == "uniform"
    assert not cfg["fixer"]
    assert "opt_state" in tree["R"]  # fresh moments, train_r --cont ready


def test_r_gpu_file_infers_fixer_and_uniform_through_copy(tmp_path):
    """GPU-trained R files (train_r.lua's default gpu=0 -> cuda=true)
    serialize with nn.Copy at both ends (models.lua:393-395, 458-459);
    fixer/uniform detection must look through them, and with a stripped
    opt the inference path is all there is."""
    r = _r_torch("uniform", fixer=True, cuda=True)
    path = t7_file(tmp_path, "r_gpu.net",
                   {"R": r["tree"], "opt": {"batchSize": 32, "seed": 1}})
    ckpt = import_t7(path, str(tmp_path / "out"), verbose=False)
    tree, cfg, _ = gio.load_checkpoint(ckpt)
    assert cfg["fixer"] is True
    assert cfg["noiseMethod"] == "uniform"
    assert cfg["height"] == 16 and cfg["width"] == 16
    assert "_fixer" in ckpt

    # and the Copy-wrapped graph maps onto the fixer module tree cleanly
    rv = map_module(M.create_R(r["dims"], r["nd"], "uniform", fixer=True),
                    t7_decode(r["tree"]), (16, 16, 3), "R")
    assert set(rv["params"]) == set(tree["R"]["params"])


def test_r_file_saved_opt_is_authoritative(tmp_path):
    """train_r.lua:71-75 copies geometry into OPT before the save at :234
    and fixer is a saved lapp flag — prefer those over module inference
    (covers non-square geometry, which inference alone cannot resolve)."""
    r = _r_torch("normal", fixer=False, cuda=True)
    path = t7_file(tmp_path, "r_opt.net",
                   {"R": r["tree"],
                    "opt": {"height": 16, "width": 16, "noiseDim": r["nd"],
                            "noiseMethod": "normal", "fixer": False,
                            "colorSpace": "rgb", "batchSize": 32,
                            "seed": 1}})
    ckpt = import_t7(path, str(tmp_path / "out"), verbose=False)
    _, cfg, _ = gio.load_checkpoint(ckpt)
    assert cfg["height"] == 16 and cfg["width"] == 16
    assert cfg["noiseMethod"] == "normal" and cfg["fixer"] is False


def test_r_file_opt_noisedim_mismatch_raises(tmp_path):
    from ganreverser_tpu.io.import_t7 import ImportError7
    r = _r_torch("normal")
    path = t7_file(tmp_path, "r_bad.net",
                   {"R": r["tree"], "opt": {"noiseDim": r["nd"] + 1}})
    with pytest.raises(ImportError7, match="noiseDim"):
        import_t7(path, str(tmp_path / "out"), verbose=False)


# ---------------------------------------------------------------------------
# full adversarial-file import (the train.lua:256 layout) + CLI
# ---------------------------------------------------------------------------

def test_adversarial_file_import(tmp_path, g3_torch, d2_torch):
    vis = np.random.default_rng(4).normal(size=(10, 8)).astype(np.float32)
    path = t7_file(tmp_path, "adversarial.net", {
        "G": g3_torch["tree"], "D": d2_torch["tree"],
        "opt": {"noiseDim": 8, "noiseMethod": "normal", "height": 16,
                "width": 16, "colorSpace": "rgb", "batchSize": 16,
                "seed": 3, "D_optmethod": "adam", "G_optmethod": "adam",
                "window": 3, "gpu": False},
        "epoch": 7,
        "plot_data": [[1, 0.5, 0.6], [2, 0.4, 0.7]],
        "vis_noise_inputs": vis,
        "normalize_mean": 0.44, "normalize_std": 0.21,
    })
    ckpt = import_t7(path, str(tmp_path / "logs"), verbose=False)
    tree, cfg, extra = gio.load_checkpoint(ckpt)
    assert cfg["noiseDim"] == 8 and cfg["height"] == 16
    assert "window" not in cfg and "gpu" not in cfg
    assert extra["epoch"] == 7
    assert extra["plot_data"] == [[1.0, 0.5, 0.6], [2.0, 0.4, 0.7]]
    assert extra["normalize_mean"] == pytest.approx(0.44)
    np.testing.assert_allclose(tree["vis_noise_inputs"], vis)

    # imported G must express the SAME function as the torch original
    z = np.asarray(vis[:4], np.float32)
    theirs = g3_torch["forward"](torch.from_numpy(z)).numpy()
    G = M.create_G((3, 16, 16), 8)
    ours, _ = G.apply({"params": jax.tree.map(jnp.asarray,
                                              tree["G"]["params"]),
                       "state": jax.tree.map(jnp.asarray,
                                             tree["G"]["state"])},
                      jnp.asarray(z), train=False)
    np.testing.assert_allclose(np.asarray(ours),
                               theirs.transpose(0, 2, 3, 1),
                               atol=2e-4, rtol=1e-3)


def test_decoder_only_import(tmp_path, g3_torch):
    """pretrain_g.lua:202 layout {G=decoder, opt, EPOCH} — lands under the
    g_pretrained_* name train.lua:148-157 auto-loads from."""
    path = t7_file(tmp_path, "g_pretrained.net", {
        "G": g3_torch["tree"],
        "opt": {"noiseDim": 8, "height": 16, "width": 16,
                "colorSpace": "rgb"},
        "EPOCH": 4,
    })
    ckpt = import_t7(path, str(tmp_path / "logs"), verbose=False)
    assert ckpt.endswith("g_pretrained_3x16x16_nd8")
    tree, _, extra = gio.load_checkpoint(ckpt)
    assert extra["epoch"] == 4
    # decoder-only trees are bare {params, state} (what train.py consumes)
    assert set(tree) == {"params", "state"}
    z = np.random.default_rng(8).normal(size=(2, 8)).astype(np.float32)
    theirs = g3_torch["forward"](torch.from_numpy(z)).numpy()
    G = M.create_G((3, 16, 16), 8)
    ours, _ = G.apply(jax.tree.map(jnp.asarray, tree), jnp.asarray(z),
                      train=False)
    np.testing.assert_allclose(np.asarray(ours),
                               theirs.transpose(0, 2, 3, 1),
                               atol=2e-4, rtol=1e-3)


def test_distilled_pair_import(tmp_path, g3_torch, d2_torch):
    """pretrain_with_previous_net.lua:265 layout {G, D, opt} (no epoch/vis
    keys) — lands under the pretrained_* name train.lua:127-138 auto-loads."""
    path = t7_file(tmp_path, "pretrained.net", {
        "G": g3_torch["tree"], "D": d2_torch["tree"],
        "opt": {"noiseDim": 8, "height": 16, "width": 16,
                "colorSpace": "rgb"},
    })
    ckpt = import_t7(path, str(tmp_path / "logs"), verbose=False)
    assert ckpt.endswith("pretrained_3x16x16_nd8")
    tree, _, _ = gio.load_checkpoint(ckpt)
    assert "G" in tree and "D" in tree


def test_import_cli(tmp_path, g3_torch, d2_torch):
    path = t7_file(tmp_path, "adversarial.net", {
        "G": g3_torch["tree"], "D": d2_torch["tree"],
        "opt": {"noiseDim": 8, "height": 16, "width": 16,
                "colorSpace": "rgb"},
        "epoch": 2, "vis_noise_inputs": np.zeros((10, 8), np.float32),
    })
    from ganreverser_tpu.cli import import_t7 as cli
    cli.main([path, "--out", str(tmp_path / "logs")])
    assert gio.exists(str(tmp_path / "logs" / "adversarial"))


def test_g4_import_forward_parity():
    """create_G4 (models.lua:145-194): 32 branch Sequentials inside an
    nn.Concat — pins nested containers, the in-branch Linear->View
    permutation, and cross-branch channel-concat ordering."""
    nd, c = 5, 3
    nb = 4  # 4 of the 32 branches are enough to pin the wiring
    branches_t, branch_mods = [], []
    for _ in range(nb):
        l1 = torch.nn.Linear(nd, 16)
        p1 = torch.nn.PReLU()
        l2 = torch.nn.Linear(16, 16 * 16 * 16)
        bn1 = _rand_bn(16 * 16 * 16, spatial=False)
        p2 = torch.nn.PReLU()
        cv = torch.nn.Conv2d(16, 16, 3, padding=1)
        bn2 = _rand_bn(16, spatial=True)
        p3 = torch.nn.PReLU()
        branch_mods.append((l1, p1, l2, bn1, p2, cv, bn2, p3))
        branches_t.append(t7_seq([
            t7_linear(l1), t7_prelu(p1), t7_linear(l2), t7_bn(bn1, False),
            t7_prelu(p2), _skip("nn.View"),
            _skip("nn.SpatialUpSamplingNearest"),
            t7_conv(cv), t7_bn(bn2, True), t7_prelu(p3)]))
    top1 = torch.nn.Conv2d(16 * nb, 64, 3, padding=1)
    tbn = _rand_bn(64, spatial=True)
    tp = torch.nn.PReLU()
    top2 = torch.nn.Conv2d(64, c, 3, padding=1)

    def prelu(x, p):
        return F.prelu(x, p.weight)

    @torch.no_grad()
    def forward(z):  # literal NCHW, View(16,16,16), Concat on channels
        outs = []
        for (l1, p1, l2, bn1, p2, cv, bn2, p3) in branch_mods:
            x = prelu(l1(z), p1)
            x = prelu(_bn_f(l2(x), bn1), p2)
            x = x.view(-1, 16, 16, 16)
            x = F.interpolate(x, scale_factor=2, mode="nearest")
            x = prelu(_bn_f(cv(x), bn2), p3)
            outs.append(x)
        y = torch.cat(outs, dim=1)
        y = prelu(_bn_f(top1(y), tbn), tp)
        return torch.sigmoid(top2(y))

    tree = t7_decode(t7_seq([
        T7Obj("nn.Concat", modules=branches_t),
        t7_conv(top1), t7_bn(tbn, True), t7_prelu(tp),
        t7_conv(top2), _skip("nn.Sigmoid")]))

    # our G4 with the branch count trimmed to match
    from ganreverser_tpu.models import modules as mm
    full = M.create_G4((c, 32, 32), nd)
    concat = full.layers[0]
    G4 = mm.Sequential([mm.ConcatBranches(list(concat.branches)[:nb])]
                       + list(full.layers[1:]))
    gv = map_module(G4, tree, (nd,), "G4")

    z = np.random.default_rng(6).normal(size=(2, nd)).astype(np.float32)
    theirs = forward(torch.from_numpy(z)).numpy()
    ours, _ = G4.apply(jax.tree.map(jnp.asarray, gv), jnp.asarray(z),
                       train=False)
    np.testing.assert_allclose(np.asarray(ours),
                               theirs.transpose(0, 2, 3, 1),
                               atol=3e-4, rtol=1e-3)


def test_g_encoder_import_forward_parity():
    """create_G_encoder (models.lua:57-102): AvgPool/MaxPool mix and the
    Flatten->Linear input permutation."""
    nd, c, h, w = 6, 3, 16, 16
    c1 = torch.nn.Conv2d(c, 16, 3, padding=1)
    b1 = _rand_bn(16, spatial=True)
    c2 = torch.nn.Conv2d(16, 32, 3, padding=1)
    b2 = _rand_bn(32, spatial=True)
    c3 = torch.nn.Conv2d(32, 64, 3, padding=1)
    b3 = _rand_bn(64, spatial=True)
    l1 = torch.nn.Linear(64 * (h // 8) * (w // 8), 512)
    b4 = _rand_bn(512, spatial=False)
    l2 = torch.nn.Linear(512, nd)

    @torch.no_grad()
    def forward(imgs):
        x = F.avg_pool2d(F.relu(_bn_f(c1(imgs), b1)), 2)
        x = F.max_pool2d(F.relu(_bn_f(c2(x), b2)), 2)
        x = F.max_pool2d(F.relu(_bn_f(c3(x), b3)), 2)
        x = x.reshape(x.shape[0], -1)
        x = F.relu(_bn_f(l1(x), b4))
        return torch.tanh(l2(x))

    tree = t7_decode(t7_seq([
        t7_conv(c1), t7_bn(b1, True), _skip("cudnn.ReLU"),
        _skip("nn.SpatialAveragePooling"),
        t7_conv(c2), t7_bn(b2, True), _skip("cudnn.ReLU"),
        _skip("nn.SpatialMaxPooling"),
        t7_conv(c3), t7_bn(b3, True), _skip("cudnn.ReLU"),
        _skip("nn.SpatialMaxPooling"), _skip("nn.View"),
        t7_linear(l1), t7_bn(b4, False), _skip("cudnn.ReLU"),
        t7_linear(l2), _skip("nn.Tanh")]))
    E = M.create_G_encoder((c, h, w), nd)
    ev = map_module(E, tree, (h, w, c), "E")

    imgs = np.random.default_rng(7).uniform(
        size=(3, c, h, w)).astype(np.float32)
    theirs = forward(torch.from_numpy(imgs)).numpy()
    ours, _ = E.apply(jax.tree.map(jnp.asarray, ev),
                      jnp.asarray(imgs.transpose(0, 2, 3, 1)), train=False)
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-4,
                               rtol=1e-3)


def test_imported_checkpoint_drives_sample_cli(tmp_path, g3_torch,
                                               d2_torch):
    """Drop-in proof: a converted adversarial.net feeds the sample CLI
    unchanged (the reference user's first post-switch command)."""
    path = t7_file(tmp_path, "adversarial.net", {
        "G": g3_torch["tree"], "D": d2_torch["tree"],
        "opt": {"noiseDim": 8, "noiseMethod": "normal", "height": 16,
                "width": 16, "colorSpace": "rgb"},
        "epoch": 3, "vis_noise_inputs": np.random.default_rng(5).normal(
            size=(100, 8)).astype(np.float32),
    })
    ckpt = import_t7(path, str(tmp_path / "logs"), verbose=False)
    from ganreverser_tpu.cli import sample as sample_cli
    out = tmp_path / "samples"
    sample_cli.main(["--network", ckpt, "--writeto", str(out),
                     "--dataset", "synthetic", "--height", "16",
                     "--width", "16"])
    assert any(out.iterdir()), "sample CLI wrote no artifacts"


def test_show_cli_inspects_t7_file(tmp_path, g3_torch, capsys):
    """show on a raw .net file prints its structure without converting —
    show_model_content.lua:14's input format works directly."""
    path = t7_file(tmp_path, "adversarial.net", {
        "G": g3_torch["tree"],
        "opt": {"noiseDim": 8, "height": 16},
        "epoch": 9,
    })
    from ganreverser_tpu.cli import show
    show.main([path])
    out = capsys.readouterr().out
    assert "Torch7 file" in out
    assert "nn.Sequential" in out and "nn.Linear" in out
    assert "epoch = 9" in out
    assert "noiseDim = 8" in out
    assert "import_t7" in out  # points at the converter


def test_structural_mismatch_raises(g3_torch):
    R = M.create_R((3, 16, 16), 8, "normal")
    with pytest.raises(Exception, match="serialized|expected"):
        map_module(R, t7_decode(g3_torch["tree"]), (16, 16, 3), "R")
