"""Independent torch implementation of the AIM forward math, used ONLY as a
numerical golden for converter/model parity tests.

Written from the published AIM equations (ICLR 2023):
  block:  x += DropPath(T_Adapter(Attn_T(LN1(x))))        (temporal, factorized)
          x += S_Adapter(Attn_S(LN1(x)))                  (spatial; adapter has
                                                           inner residual)
          x += MLP(LN2(x)) + s * MLP_Adapter(LN2(x))      (joint)
with a frozen CLIP ViT providing Attn/MLP/LN weights, a learned temporal
embedding, and zero-init adapter up-projections. Parameter names follow the
CLIP/AIM checkpoint conventions so ``state_dict()`` doubles as a synthetic
"released checkpoint" for the converter tests.
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


class GoldenAttention(nn.Module):
    """MHA with CLIP's packed in-projection parameter naming."""

    def __init__(self, d, heads):
        super().__init__()
        self.d = d
        self.heads = heads
        self.in_proj_weight = nn.Parameter(torch.empty(3 * d, d).normal_(0, 0.02))
        self.in_proj_bias = nn.Parameter(torch.zeros(3 * d))
        self.out_proj = nn.Linear(d, d)

    def forward(self, x):  # x: (B, L, D) batch-first
        b, l, d = x.shape
        hd = d // self.heads
        qkv = x @ self.in_proj_weight.t() + self.in_proj_bias
        q, k, v = qkv.chunk(3, dim=-1)
        q = q.view(b, l, self.heads, hd).transpose(1, 2)
        k = k.view(b, l, self.heads, hd).transpose(1, 2)
        v = v.view(b, l, self.heads, hd).transpose(1, 2)
        att = (q @ k.transpose(-2, -1)) / math.sqrt(hd)
        att = att.softmax(dim=-1)
        out = (att @ v).transpose(1, 2).reshape(b, l, d)
        return self.out_proj(out)


class GoldenAdapter(nn.Module):
    def __init__(self, d, ratio=0.25, skip=True):
        super().__init__()
        self.skip = skip
        h = int(d * ratio)
        self.D_fc1 = nn.Linear(d, h)
        self.D_fc2 = nn.Linear(h, d)

    def forward(self, x):
        y = self.D_fc2(F.gelu(self.D_fc1(x)))
        return x + y if self.skip else y


class GoldenMLP(nn.Module):
    def __init__(self, d):
        super().__init__()
        self.c_fc = nn.Linear(d, 4 * d)
        self.c_proj = nn.Linear(4 * d, d)

    def forward(self, x):
        h = self.c_fc(x)
        h = h * torch.sigmoid(1.702 * h)  # QuickGELU
        return self.c_proj(h)


class GoldenBlock(nn.Module):
    def __init__(self, d, heads, frames, scale=0.5):
        super().__init__()
        self.frames = frames
        self.scale = scale
        self.attn = GoldenAttention(d, heads)
        self.ln_1 = nn.LayerNorm(d)
        self.ln_2 = nn.LayerNorm(d)
        self.mlp = GoldenMLP(d)
        self.S_Adapter = GoldenAdapter(d)
        self.T_Adapter = GoldenAdapter(d, skip=False)
        self.MLP_Adapter = GoldenAdapter(d, skip=False)

    def forward(self, x):  # x: (B*T, N, D)
        bt, n, d = x.shape
        t = self.frames
        b = bt // t
        # temporal: tokens attend over the frame axis
        xt = x.view(b, t, n, d).permute(0, 2, 1, 3).reshape(b * n, t, d)
        xt = self.T_Adapter(self.attn(self.ln_1(xt)))
        xt = xt.view(b, n, t, d).permute(0, 2, 1, 3).reshape(bt, n, d)
        x = x + xt
        # spatial
        x = x + self.S_Adapter(self.attn(self.ln_1(x)))
        # joint
        xn = self.ln_2(x)
        x = x + self.mlp(xn) + self.scale * self.MLP_Adapter(xn)
        return x


class GoldenTransformer(nn.Module):
    def __init__(self, d, heads, layers, frames, scale=0.5):
        super().__init__()
        self.resblocks = nn.ModuleList(
            [GoldenBlock(d, heads, frames, scale) for _ in range(layers)])

    def forward(self, x):
        for blk in self.resblocks:
            x = blk(x)
        return x


class GoldenAIM(nn.Module):
    """Backbone. Input (B, C, T, H, W), output (B, T, D) cls features."""

    def __init__(self, res=32, patch=16, d=64, heads=4, layers=2, frames=4,
                 scale=0.5):
        super().__init__()
        self.frames = frames
        self.conv1 = nn.Conv2d(3, d, kernel_size=patch, stride=patch, bias=False)
        s = d ** -0.5
        self.class_embedding = nn.Parameter(s * torch.randn(d))
        n = (res // patch) ** 2
        self.positional_embedding = nn.Parameter(s * torch.randn(n + 1, d))
        self.temporal_embedding = nn.Parameter(torch.zeros(1, frames, d))
        self.ln_pre = nn.LayerNorm(d)
        self.transformer = GoldenTransformer(d, heads, layers, frames, scale)
        self.ln_post = nn.LayerNorm(d)

    def forward(self, x):
        b, c, t, h, w = x.shape
        x = x.permute(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
        x = self.conv1(x)  # (BT, D, H', W')
        x = x.flatten(2).transpose(1, 2)  # (BT, N, D)
        cls = self.class_embedding.expand(x.shape[0], 1, -1)
        x = torch.cat([cls, x], dim=1)
        x = x + self.positional_embedding
        n, d = x.shape[1], x.shape[2]
        x = x.view(b, t, n, d).permute(0, 2, 1, 3).reshape(b * n, t, d)
        x = x + self.temporal_embedding
        x = x.view(b, n, t, d).permute(0, 2, 1, 3).reshape(b * t, n, d)
        x = self.ln_pre(x)
        x = self.transformer(x)
        x = self.ln_post(x)
        return x[:, 0].view(b, t, d)


class GoldenRecognizer(nn.Module):
    def __init__(self, num_classes=10, **kw):
        super().__init__()
        self.backbone = GoldenAIM(**kw)
        d = self.backbone.class_embedding.shape[0]
        self.cls_head = nn.Module()
        self.cls_head.fc_cls = nn.Linear(d, num_classes)

    def forward(self, x):
        feat = self.backbone(x)  # (B, T, D)
        pooled = feat.mean(dim=1)
        return self.cls_head.fc_cls(pooled)


# ---------------------------------------------------------------------------
# timm-style golden (for ViT_ImageNet parity tests)


class GoldenTimmAttention(nn.Module):
    """timm naming: packed qkv Linear + proj."""

    def __init__(self, d, heads, qkv_bias=True):
        super().__init__()
        self.heads = heads
        self.qkv = nn.Linear(d, 3 * d, bias=qkv_bias)
        self.proj = nn.Linear(d, d)

    def forward(self, x):
        b, l, d = x.shape
        hd = d // self.heads
        q, k, v = self.qkv(x).chunk(3, dim=-1)
        q = q.view(b, l, self.heads, hd).transpose(1, 2)
        k = k.view(b, l, self.heads, hd).transpose(1, 2)
        v = v.view(b, l, self.heads, hd).transpose(1, 2)
        att = (q @ k.transpose(-2, -1)) / math.sqrt(hd)
        out = (att.softmax(dim=-1) @ v).transpose(1, 2).reshape(b, l, d)
        return self.proj(out)


class GoldenTimmMLP(nn.Module):
    def __init__(self, d, ratio=4.0):
        super().__init__()
        self.fc1 = nn.Linear(d, int(d * ratio))
        self.fc2 = nn.Linear(int(d * ratio), d)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class GoldenTimmBlock(nn.Module):
    def __init__(self, d, heads, frames, scale=0.5):
        super().__init__()
        self.frames = frames
        self.scale = scale
        self.attn = GoldenTimmAttention(d, heads)
        self.norm1 = nn.LayerNorm(d, eps=1e-6)
        self.norm2 = nn.LayerNorm(d, eps=1e-6)
        self.mlp = GoldenTimmMLP(d)
        self.S_Adapter = GoldenAdapter(d)
        self.T_Adapter = GoldenAdapter(d, skip=False)
        self.MLP_Adapter = GoldenAdapter(d, skip=False)

    def forward(self, x):
        bt, n, d = x.shape
        t = self.frames
        b = bt // t
        xt = x.view(b, t, n, d).permute(0, 2, 1, 3).reshape(b * n, t, d)
        xt = self.T_Adapter(self.attn(self.norm1(xt)))
        xt = xt.view(b, n, t, d).permute(0, 2, 1, 3).reshape(bt, n, d)
        x = x + xt
        x = x + self.S_Adapter(self.attn(self.norm1(x)))
        xn = self.norm2(x)
        return x + self.mlp(xn) + self.scale * self.MLP_Adapter(xn)


class GoldenTimmViT(nn.Module):
    """timm-checkpoint-compatible skeleton (keys: patch_embed.proj, blocks.*,
    norm) + AIM adapters."""

    def __init__(self, res=32, patch=16, d=64, heads=4, layers=2, frames=4):
        super().__init__()
        self.frames = frames
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, d, patch, patch, bias=True)
        n = (res // patch) ** 2
        self.cls_token = nn.Parameter(torch.zeros(1, 1, d))
        self.pos_embed = nn.Parameter(torch.zeros(1, n + 1, d))
        self.temporal_embedding = nn.Parameter(torch.zeros(1, frames, d))
        self.blocks = nn.ModuleList(
            [GoldenTimmBlock(d, heads, frames) for _ in range(layers)])
        self.norm = nn.LayerNorm(d, eps=1e-6)

    def forward(self, x):
        b, c, t, h, w = x.shape
        x = x.permute(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        cls = self.cls_token.expand(x.shape[0], -1, -1)
        x = torch.cat([cls, x], dim=1) + self.pos_embed
        n, d = x.shape[1], x.shape[2]
        x = x.view(b, t, n, d).permute(0, 2, 1, 3).reshape(b * n, t, d)
        x = x + self.temporal_embedding
        x = x.view(b, n, t, d).permute(0, 2, 1, 3).reshape(b * t, n, d)
        for blk in self.blocks:
            x = blk(x)
        x = self.norm(x)
        return x[:, 0].view(b, t, d)
