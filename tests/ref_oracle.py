"""Import the reference PyTorch implementation (read-only, /root/reference) as
a *numerical oracle* for parity tests.

The reference depends on GPU-era packages absent here (triton, torchvision,
timm, iopath, decord, pycocotools); this shim stubs exactly what its module
import graph touches so the pure-PyTorch math is importable on CPU. Tests that
use this module must be guarded with ``pytest.mark.skipif(not HAS_REF, ...)``
— the oracle exists only in the development environment, never at user sites.
"""

from __future__ import annotations

import os
import sys
import types

REF_PATH = "/root/reference"
HAS_REF = os.path.isdir(os.path.join(REF_PATH, "sam3"))

_installed = False


class _AnyAttrModule(types.ModuleType):
    def __getattr__(self, name):
        if name.startswith("__"):
            raise AttributeError(name)
        return _Dummy()


class _Dummy:
    def __call__(self, *a, **k):
        return self

    def __getattr__(self, name):
        return _Dummy()

    def __getitem__(self, k):
        return _Dummy()


def install_stubs():
    global _installed
    if _installed:
        return
    _installed = True

    import torch

    # this box exposes 1 physical core but torch spawns ~19 MKL/OMP threads;
    # oversubscribed multithreaded reductions were observed to produce
    # nondeterministic NaNs in the reference forward. Single-thread is just as
    # fast here and deterministic.
    torch.set_num_threads(1)

    # pin_memory() raises without an accelerator (the reference calls it
    # unconditionally in the geometry encoder, geometry_encoders.py:659)
    if not torch.cuda.is_available():
        torch.Tensor.pin_memory = lambda self, *a, **k: self

    # the reference defers torch.compile on some submodules (decoder.py:
    # 596-600); inductor would import triton.backends, which our stub lacks.
    # Run the oracle eagerly.
    os.environ["TORCHDYNAMO_DISABLE"] = "1"
    try:
        import torch._dynamo

        torch._dynamo.config.disable = True
    except Exception:
        pass

    def stub(name, cls=types.ModuleType):
        if name not in sys.modules:
            mod = cls(name)
            mod.__path__ = []  # mark as package so submodule imports resolve
            sys.modules[name] = mod
        return sys.modules[name]

    io_mod = stub("iopath")
    stub("iopath.common")
    fio = stub("iopath.common.file_io")

    class _PathMgr:
        @staticmethod
        def open(path, mode="r", **kw):
            return open(path, mode, **kw)

        @staticmethod
        def exists(path):
            return os.path.exists(path)

    fio.g_pathmgr = _PathMgr()
    io_mod.common = sys.modules["iopath.common"]

    tv = stub("torchvision")
    ops = stub("torchvision.ops")
    roi = stub("torchvision.ops.roi_align")

    class RoIAlign(torch.nn.Module):
        def __init__(self, output_size, spatial_scale=1.0, sampling_ratio=-1, aligned=True):
            super().__init__()
            self.output_size = (
                (output_size, output_size)
                if isinstance(output_size, int) else output_size
            )
            self.spatial_scale = spatial_scale
            self.sampling_ratio = sampling_ratio
            self.aligned = aligned

        def forward(self, x, rois):
            return roi_align_fn(
                x, rois, self.output_size, self.spatial_scale,
                self.sampling_ratio, self.aligned,
            )

    roi.RoIAlign = RoIAlign

    def roi_align_fn(
        input, boxes, output_size, spatial_scale=1.0, sampling_ratio=-1,
        aligned=False,
    ):
        """Minimal CPU torchvision.ops.roi_align (bilinear average pooling,
        aligned=False semantics) — reference oracle only, runs on a handful
        of prompt boxes in tests."""
        if isinstance(output_size, int):
            output_size = (output_size, output_size)
        oh, ow = output_size
        if isinstance(boxes, (list, tuple)):
            rois = []
            for bi, b in enumerate(boxes):
                if b.numel() == 0:
                    continue
                idx = torch.full((b.shape[0], 1), float(bi))
                rois.append(torch.cat([idx, b.float()], 1))
            rois = (
                torch.cat(rois, 0) if rois else torch.zeros((0, 5))
            )
        else:
            rois = boxes.float()
        n = rois.shape[0]
        c = input.shape[1]
        out = torch.zeros((n, c, oh, ow), dtype=input.dtype)
        off = 0.5 if aligned else 0.0
        h, w = input.shape[-2:]
        for r in range(n):
            bi = int(rois[r, 0])
            x1, y1, x2, y2 = (rois[r, 1:] * spatial_scale - off).tolist()
            rw = max(x2 - x1, 1.0)
            rh = max(y2 - y1, 1.0)
            bin_h, bin_w = rh / oh, rw / ow
            sr_h = sampling_ratio if sampling_ratio > 0 else max(1, int(np_ceil(bin_h)))
            sr_w = sampling_ratio if sampling_ratio > 0 else max(1, int(np_ceil(bin_w)))
            for i in range(oh):
                for j in range(ow):
                    acc = torch.zeros(c, dtype=torch.float32)
                    for iy in range(sr_h):
                        yy = y1 + bin_h * (i + (iy + 0.5) / sr_h)
                        for ix in range(sr_w):
                            xx = x1 + bin_w * (j + (ix + 0.5) / sr_w)
                            acc += _bilinear(input[bi], xx, yy, h, w)
                    out[r, :, i, j] = (acc / (sr_h * sr_w)).to(input.dtype)
        return out

    def _bilinear(img, x, y, h, w):
        if x < -1.0 or x > w or y < -1.0 or y > h:
            return torch.zeros(img.shape[0])
        x = min(max(x, 0.0), w - 1)
        y = min(max(y, 0.0), h - 1)
        x0, y0 = int(x), int(y)
        x1, y1 = min(x0 + 1, w - 1), min(y0 + 1, h - 1)
        lx, ly = x - x0, y - y0
        return (
            img[:, y0, x0] * (1 - ly) * (1 - lx)
            + img[:, y0, x1] * (1 - ly) * lx
            + img[:, y1, x0] * ly * (1 - lx)
            + img[:, y1, x1] * ly * lx
        ).float()

    from math import ceil as np_ceil

    ops.roi_align = roi_align_fn

    def masks_to_boxes(masks):
        n = masks.shape[0]
        boxes = torch.zeros(n, 4, dtype=torch.float32)
        for i in range(n):
            ys, xs = torch.where(masks[i])
            if len(ys):
                boxes[i] = torch.tensor(
                    [xs.min(), ys.min(), xs.max(), ys.max()], dtype=torch.float32
                )
        return boxes

    def batched_nms(boxes, scores, idxs, iou_threshold):
        return torch.arange(len(scores))

    def nms(boxes, scores, iou_threshold):
        return torch.arange(len(scores))

    ops.masks_to_boxes = masks_to_boxes
    ops.batched_nms = batched_nms
    ops.nms = nms
    tv.ops = ops
    ds = stub("torchvision.datasets")
    dsv = stub("torchvision.datasets.vision")

    class VisionDataset:
        def __init__(self, root=None, *a, **k):
            self.root = root

    dsv.VisionDataset = VisionDataset
    ds.vision = dsv
    tvt = stub("torchvision.transforms", _AnyAttrModule)
    stub("torchvision.transforms.v2", _AnyAttrModule)
    stub("torchvision.transforms.functional", _AnyAttrModule)
    tv.transforms = tvt
    stub("torchvision.io", _AnyAttrModule)
    stub("torchvision.utils", _AnyAttrModule)

    timm = stub("timm")
    layers = stub("timm.layers")

    class DropPath(torch.nn.Module):
        def __init__(self, drop_prob=0.0, scale_by_keep=True):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            return x

    class Mlp(torch.nn.Module):
        def __init__(
            self, in_features, hidden_features=None, out_features=None,
            act_layer=torch.nn.GELU, norm_layer=None, bias=True, drop=0.0,
            use_conv=False,
        ):
            super().__init__()
            out_features = out_features or in_features
            hidden_features = hidden_features or in_features
            if isinstance(drop, (tuple, list)):
                drop1, drop2 = drop
            else:
                drop1 = drop2 = drop
            if isinstance(bias, (tuple, list)):
                bias1, bias2 = bias
            else:
                bias1 = bias2 = bias
            self.fc1 = torch.nn.Linear(in_features, hidden_features, bias=bias1)
            self.act = act_layer()
            self.drop1 = torch.nn.Dropout(drop1)
            self.fc2 = torch.nn.Linear(hidden_features, out_features, bias=bias2)
            self.drop2 = torch.nn.Dropout(drop2)

        def forward(self, x):
            return self.drop2(self.fc2(self.drop1(self.act(self.fc1(x)))))

    layers.DropPath = DropPath
    layers.Mlp = Mlp

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            tensor.normal_(mean, std).clamp_(a * std, b * std)
        return tensor

    layers.trunc_normal_ = trunc_normal_
    timm.layers = layers

    triton = stub("triton", _AnyAttrModule)
    tl = stub("triton.language", _AnyAttrModule)
    triton.language = tl

    def _jit(fn=None, **kw):
        if fn is None:
            return lambda f: f
        return fn

    triton.jit = _jit
    triton.cdiv = lambda a, b: (a + b - 1) // b

    stub("decord", _AnyAttrModule)
    pc = stub("pycocotools", _AnyAttrModule)
    pm = stub("pycocotools.mask", _AnyAttrModule)
    pc.mask = pm
    # ftfy.fix_text must return a real str (it feeds the tokenizer's regex
    # pipeline); our tokenizer skips mojibake fixing the same way.
    ftfy = stub("ftfy")
    ftfy.fix_text = lambda s, **kw: s

    if REF_PATH not in sys.path:
        sys.path.insert(0, REF_PATH)


from contextlib import contextmanager


@contextmanager
def cuda_to_cpu():
    """Redirect hard-coded device='cuda' tensor creation to CPU (the reference
    precomputes sine position tables on cuda, position_encoding.py:47) and
    no-op ``Tensor.cuda()`` moves (the tracker hot-loads memories with
    ``.cuda(non_blocking=True)``, sam3_tracker_base.py:660)."""
    import torch

    patched = {}
    for fname in ("zeros", "ones", "arange", "empty"):
        orig = getattr(torch, fname)
        patched[fname] = orig

        def wrap(orig_fn):
            def f(*a, **k):
                if k.get("device") == "cuda":
                    k["device"] = "cpu"
                return orig_fn(*a, **k)

            return f

        setattr(torch, fname, wrap(orig))
    orig_tensor_cuda = torch.Tensor.cuda
    torch.Tensor.cuda = lambda self, *a, **k: self
    try:
        yield
    finally:
        for fname, orig in patched.items():
            setattr(torch, fname, orig)
        torch.Tensor.cuda = orig_tensor_cuda


def import_ref(module: str):
    """Import a reference module with stubs installed, e.g.
    ``import_ref('sam3.model.vitdet')``."""
    install_stubs()
    import importlib

    return importlib.import_module(module)
