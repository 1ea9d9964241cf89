"""Validate the analytic ViT FLOP model against torch.profiler.

Builds a ViT-B/16 classifier with the REFERENCE's computation pattern
(fused-QKV naive attention materialising the S x S softmax, GELU MLP,
pre-LN blocks — /root/reference/train.py:498-593 semantics, re-implemented
from the SURVEY spec, no code copied) and counts fwd and fwd+bwd FLOPs with
torch.profiler(with_flops=True) on CPU. The number grounds
`utils/flops.backbone_fwd_gflops`, which in turn grounds bench.py's
effective-TFLOP/s and the GPU-proxy denominator (PERFORMANCE.md
"vs BASELINE" section).

Run: python benchmarks/torch_flop_check.py
"""
import torch
import torch.nn as nn


class NaiveAttention(nn.Module):
    def __init__(self, d, h):
        super().__init__()
        self.h, self.hd = h, d // h
        self.qkv = nn.Linear(d, 3 * d)
        self.proj = nn.Linear(d, d)

    def forward(self, x):
        b, s, d = x.shape
        qkv = self.qkv(x).reshape(b, s, 3, self.h, self.hd)
        q, k, v = qkv.permute(2, 0, 3, 1, 4)
        att = (q @ k.transpose(-2, -1)) / (self.hd ** 0.5)
        att = att.softmax(-1)
        out = (att @ v).transpose(1, 2).reshape(b, s, d)
        return self.proj(out)


class Block(nn.Module):
    def __init__(self, d, h, m):
        super().__init__()
        self.ln1, self.ln2 = nn.LayerNorm(d), nn.LayerNorm(d)
        self.attn = NaiveAttention(d, h)
        self.mlp = nn.Sequential(nn.Linear(d, m), nn.GELU(), nn.Linear(m, d))

    def forward(self, x):
        x = x + self.attn(self.ln1(x))
        return x + self.mlp(self.ln2(x))


class ViT(nn.Module):
    def __init__(self, img=224, patch=16, d=768, depth=12, h=12, m=3072,
                 classes=6):
        super().__init__()
        self.embed = nn.Conv2d(3, d, patch, patch)
        n = (img // patch) ** 2
        self.cls = nn.Parameter(torch.zeros(1, 1, d))
        self.pos = nn.Parameter(torch.zeros(1, n + 1, d))
        self.blocks = nn.ModuleList(Block(d, h, m) for _ in range(depth))
        self.ln = nn.LayerNorm(d)
        self.head = nn.Linear(d, classes)

    def forward(self, x):
        b = x.shape[0]
        x = self.embed(x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls.expand(b, -1, -1), x], 1) + self.pos
        for blk in self.blocks:
            x = blk(x)
        return self.head(self.ln(x)[:, 0])


def profiled_gflops(fn):
    from torch.profiler import ProfilerActivity, profile

    with profile(activities=[ProfilerActivity.CPU], with_flops=True) as prof:
        fn()
    return sum(e.flops or 0 for e in prof.key_averages()) / 1e9


def main():
    torch.manual_seed(0)
    model = ViT()
    x = torch.randn(2, 3, 224, 224)

    fwd = profiled_gflops(lambda: model(x)) / 2
    print(f"torch fwd: {fwd:.2f} GFLOP/image")

    def step():
        model.zero_grad()
        model(x).square().sum().backward()

    fwd_bwd = profiled_gflops(step) / 2
    print(f"torch fwd+bwd: {fwd_bwd:.2f} GFLOP/image "
          f"({fwd_bwd / fwd:.2f}x fwd)")

    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from arsvt_tpu.models.registry import get_preset
    from arsvt_tpu.utils.flops import backbone_fwd_gflops

    ours = backbone_fwd_gflops(get_preset("vit_base_16_224"))
    print(f"analytic model (utils/flops.py): {ours:.2f} GFLOP/image fwd")
    print(f"ratio torch/analytic: {fwd / ours:.3f}")


if __name__ == "__main__":
    main()
