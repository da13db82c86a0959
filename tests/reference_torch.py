"""Import helper for the torch reference implementation at /root/reference.

The reference depends on ``torchvision.ops.deform_conv2d`` (a CUDA/C++ kernel;
torchvision is not installed here) and calls ``torch.cuda.current_device()``
at import (reference planerecnet.py:18).  This module installs the stubs the
reference needs to run on CPU torch:

* ``torchvision.ops.deform_conv2d`` -> a vectorised pure-torch DCNv2 with the
  published semantics (zero out-of-bounds bilinear sampling, per-tap
  modulation).  It is pinned to the same slow numpy oracle that validates the
  JAX op (tests/test_dcn.py), so the end-to-end parity tests compare two
  *independently verified* DCN implementations.
* ``torch.cuda.current_device`` -> constant 0.

``load_reference()`` performs the (idempotent) stubbing + sys.path setup and
returns the reference's config module; reference modules can then be imported
normally (``import planerecnet``, ``from data.config import cfg``...).
"""

from __future__ import annotations

import sys
import types

import torch

REFERENCE_ROOT = "/root/reference"


def torch_deform_conv2d(input=None, offset=None, weight=None, bias=None,
                        stride=(1, 1), padding=(0, 0), dilation=(1, 1),
                        mask=None):
    """Vectorised torch DCNv2 matching ``torchvision.ops.deform_conv2d``.

    input:  (B, Cin, H, W)
    offset: (B, 2*K, Ho, Wo)  interleaved (dy, dx) per kernel tap, row-major
    weight: (Cout, Cin, kh, kw)
    mask:   (B, K, Ho, Wo) modulation, or None
    """
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = (padding, padding)
    if isinstance(dilation, int):
        dilation = (dilation, dilation)

    b, cin, h, w = input.shape
    cout, _, kh, kw = weight.shape
    _, _, ho, wo = offset.shape
    k = kh * kw
    offset = offset.view(b, k, 2, ho, wo)

    base_y = (torch.arange(ho, dtype=input.dtype) * stride[0]
              - padding[0]).view(1, ho, 1)
    base_x = (torch.arange(wo, dtype=input.dtype) * stride[1]
              - padding[1]).view(1, 1, wo)

    flat = input.reshape(b, cin, h * w)

    def bilinear(py, px):
        """Zero-padded bilinear sample at (B,Ho,Wo) float positions."""
        y0 = torch.floor(py)
        x0 = torch.floor(px)
        fy = py - y0
        fx = px - x0
        val = 0.0
        for dy in (0, 1):
            for dx in (0, 1):
                yy = y0.long() + dy
                xx = x0.long() + dx
                wgt = (fy if dy else 1 - fy) * (fx if dx else 1 - fx)
                inb = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
                idx = (yy.clamp(0, h - 1) * w + xx.clamp(0, w - 1))
                v = flat.gather(
                    2, idx.view(b, 1, -1).expand(-1, cin, -1)
                ).view(b, cin, ho, wo)
                val = val + v * (wgt * inb.to(input.dtype)).unsqueeze(1)
        return val

    cols = []
    for ki in range(kh):
        for kj in range(kw):
            t = ki * kw + kj
            py = base_y + ki * dilation[0] + offset[:, t, 0]
            px = base_x + kj * dilation[1] + offset[:, t, 1]
            v = bilinear(py, px)
            if mask is not None:
                v = v * mask[:, t].unsqueeze(1)
            cols.append(v)
    cols = torch.stack(cols, dim=2)              # (B, Cin, K, Ho, Wo)
    out = torch.einsum("bckhw,ock->bohw", cols,
                       weight.reshape(cout, cin, k))
    if bias is not None:
        out = out + bias.view(1, -1, 1, 1)
    return out


def load_reference():
    """Install stubs, put /root/reference on sys.path, return its config
    module (with the mutable global ``cfg``)."""
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        ops = types.ModuleType("torchvision.ops")
        ops.deform_conv2d = torch_deform_conv2d
        tv.ops = ops
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = ops
    # reference planerecnet.py:18 calls this at import; CPU torch raises.
    torch.cuda.current_device = lambda: 0

    # reference utils/timer.py:19-21 instantiates cuda Events at import.
    class _FakeEvent:
        def __init__(self, **kwargs):
            pass

        def record(self):
            pass

        def synchronize(self):
            pass

        def elapsed_time(self, other):
            return 0.0

    torch.cuda.Event = _FakeEvent
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    import data.config as ref_config  # noqa: PLC0415
    return ref_config


def seeded_prn50_net(seed: int = 0):
    """Deterministic reference PlaneRecNet-50 with realistic weight and
    BN-statistic distributions — the offline stand-in for the released
    ``.pth`` (reference README.md:35-64) used by the bundled-asset golden.

    Beyond ``torch.manual_seed`` init, the zero-initialised DCN
    offset/modulator convs get real values (so fractional deformable
    sampling is exercised) and every BatchNorm's running mean/var is
    drawn from a non-trivial distribution (random init leaves them at
    0/1, which would make BN a no-op and hide conversion bugs in the
    running-stat remap).

    Returns ``(net, ref_config)`` with the net in eval mode.
    """
    ref_config = load_reference()
    ref_config.set_cfg("PlaneRecNet_50_config")
    ref_config.cfg.device = "cpu"
    from utils import timer as ref_timer  # noqa: PLC0415 (reference pkg)
    ref_timer.disable_all()
    import planerecnet as ref_prn  # noqa: PLC0415 (reference pkg)

    torch.manual_seed(seed)
    net = ref_prn.PlaneRecNet(ref_config.cfg)
    gen = torch.Generator().manual_seed(seed + 1)
    with torch.no_grad():
        for name, p in net.named_parameters():
            if "offset_conv" in name or "modulator_conv" in name:
                p.copy_(torch.randn(p.shape, generator=gen) * 0.1)
        for m in net.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.copy_(
                    torch.randn(m.running_mean.shape, generator=gen) * 0.5)
                m.running_var.copy_(
                    0.5 + torch.rand(m.running_var.shape, generator=gen) * 1.5)
    net.eval()
    return net, ref_config
