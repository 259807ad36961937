"""Forward-parity golden for the MViT checkpoint rules: build the
reference MViT in raw torch.nn with PySlowFast names
(HOI/models/lta/video_model_builder.py:627-1408 semantics: fused qkv,
per-head shared depthwise pool convs, post-pool norm_q/k/v, channel
expansion in the MLP output with residual proj(norm2(x)), skip max-pool
kernel = stride+1), translate the real state_dict, and compare outputs
numerically (ADVICE r1 #1)."""

import math

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

from egot2x.core.torch_import import apply_rules, mvit_rules  # noqa: E402
from egot2x.nn.mvit import MViT  # noqa: E402

EMBED, DEPTH, HEADS = 8, 4, 1
FRAMES, IMG = 4, 16
KERNEL = (3, 3, 3)


def torch_attention_pool(t, pool, thw, norm=None):
    """reference attention_pool for (B, H, L, C) with cls token."""
    cls_tok, t_ = t[:, :, :1], t[:, :, 1:]
    B, N, L, C = t_.shape
    T, H, W = thw
    g = t_.reshape(B * N, T, H, W, C).permute(0, 4, 1, 2, 3).contiguous()
    g = pool(g)
    new_thw = list(g.shape[2:])
    g = g.reshape(B, N, C, -1).transpose(2, 3)
    out = torch.cat((cls_tok, g), dim=2)
    if norm is not None:
        out = norm(out)
    return out, new_thw


class TAttention(tnn.Module):
    def __init__(self, dim, heads, kernel_q, kernel_kv, stride_q, stride_kv):
        super().__init__()
        self.heads = heads
        self.head_dim = dim // heads
        self.scale = self.head_dim ** -0.5
        self.qkv = tnn.Linear(dim, dim * 3, bias=True)
        self.proj = tnn.Linear(dim, dim)
        hd = self.head_dim

        def mk(kernel, stride):
            pad = [k // 2 for k in kernel]
            return tnn.Conv3d(hd, hd, kernel, stride, pad, groups=hd,
                              bias=False)

        if kernel_q:
            self.pool_q = mk(kernel_q, stride_q)
            self.norm_q = tnn.LayerNorm(hd, eps=1e-6)
        if kernel_kv:
            self.pool_k = mk(kernel_kv, stride_kv)
            self.norm_k = tnn.LayerNorm(hd, eps=1e-6)
            self.pool_v = mk(kernel_kv, stride_kv)
            self.norm_v = tnn.LayerNorm(hd, eps=1e-6)

    def forward(self, x, thw):
        B, N, C = x.shape
        qkv = self.qkv(x).reshape(B, N, 3, self.heads, self.head_dim) \
            .permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        q_thw = thw
        if hasattr(self, "pool_q"):
            q, q_thw = torch_attention_pool(q, self.pool_q, thw, self.norm_q)
        if hasattr(self, "pool_k"):
            k, _ = torch_attention_pool(k, self.pool_k, thw, self.norm_k)
            v, _ = torch_attention_pool(v, self.pool_v, thw, self.norm_v)
        attn = (q @ k.transpose(-2, -1)) * self.scale
        attn = attn.softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(B, -1, C)
        return self.proj(out), q_thw


class TBlock(tnn.Module):
    def __init__(self, dim, dim_out, heads, kernel_q, kernel_kv,
                 stride_q, stride_kv):
        super().__init__()
        self.dim, self.dim_out = dim, dim_out
        self.norm1 = tnn.LayerNorm(dim, eps=1e-6)
        self.attn = TAttention(dim, heads, kernel_q, kernel_kv, stride_q,
                               stride_kv)
        self.norm2 = tnn.LayerNorm(dim, eps=1e-6)
        self.mlp = tnn.Module()
        self.mlp.fc1 = tnn.Linear(dim, dim * 4)
        self.mlp.fc2 = tnn.Linear(dim * 4, dim_out)
        if dim != dim_out:
            self.proj = tnn.Linear(dim, dim_out)
        if stride_q:
            kernel_skip = [s + 1 if s > 1 else s for s in stride_q]
            self.pool_skip = tnn.MaxPool3d(
                kernel_skip, stride_q, [k // 2 for k in kernel_skip],
                ceil_mode=False)

    def forward(self, x, thw):
        xb, new_thw = self.attn(self.norm1(x), thw)
        x_res = x
        if hasattr(self, "pool_skip"):
            cls_tok, t_ = x[:, :1], x[:, 1:]
            B, L, C = t_.shape
            g = t_.reshape(B, *thw, C).permute(0, 4, 1, 2, 3)
            g = self.pool_skip(g)
            g = g.reshape(B, C, -1).transpose(1, 2)
            x_res = torch.cat((cls_tok, g), dim=1)
        x = x_res + xb
        x_norm = self.norm2(x)
        x_mlp = self.mlp.fc2(tnn.functional.gelu(self.mlp.fc1(x_norm)))
        if self.dim != self.dim_out:
            x = self.proj(x_norm)
        return x + x_mlp, new_thw


class TMViT(tnn.Module):
    def __init__(self, schedule):
        super().__init__()
        self.patch_embed = tnn.Module()
        self.patch_embed.proj = tnn.Conv3d(3, EMBED, (3, 7, 7), (2, 4, 4),
                                           (1, 3, 3))
        self.cls_token = tnn.Parameter(torch.zeros(1, 1, EMBED))
        n_tok = (FRAMES // 2) * (IMG // 4) * (IMG // 4) + 1
        self.pos_embed = tnn.Parameter(torch.zeros(1, n_tok, EMBED))
        self.blocks = tnn.ModuleList([
            TBlock(dim, dim_out, heads,
                   KERNEL if q_stride else (), KERNEL if kv_stride else (),
                   list(q_stride), list(kv_stride))
            for dim, dim_out, heads, q_stride, kv_stride in schedule
        ])
        self.norm = tnn.LayerNorm(schedule[-1][1], eps=1e-6)

    def forward(self, x):  # (B, C, T, H, W)
        y = self.patch_embed.proj(x)
        B = y.shape[0]
        thw = list(y.shape[2:])
        y = y.flatten(2).transpose(1, 2)
        y = torch.cat((self.cls_token.expand(B, -1, -1), y), dim=1)
        y = y + self.pos_embed
        for blk in self.blocks:
            y, thw = blk(y, thw)
        y = self.norm(y)
        return y[:, 0]


def test_mvit_forward_parity(rng):
    model = MViT(embed_dim=EMBED, depth=DEPTH, num_heads=HEADS,
                 num_frames=FRAMES, dim_mul_blocks=(1, 3),
                 head_mul_blocks=(1, 3), q_pool_blocks=(1, 3),
                 kv_stride_base=(1, 2, 2), drop_path_rate=0.0,
                 with_head=False)
    schedule = model._schedule()
    tm = TMViT(schedule)
    with torch.no_grad():
        for p in tm.parameters():
            p.uniform_(-0.1, 0.1)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}

    tree = apply_rules(sd, mvit_rules(depth=DEPTH))
    assert tree["unused"] == [], f"unconsumed torch keys: {tree['unused']}"

    x = rng.standard_normal((2, FRAMES, IMG, IMG, 3)).astype(np.float32)
    variables = {"params": tree["params"]}
    # validate against a fresh init: same tree structure ⇒ full coverage
    ref_vars = model.init(jax.random.key(0), x, train=False, middle=True)
    ref_paths = {jax.tree_util.keystr(p) for p, _ in
                 jax.tree_util.tree_leaves_with_path(ref_vars["params"])}
    got_paths = {jax.tree_util.keystr(p) for p, _ in
                 jax.tree_util.tree_leaves_with_path(tree["params"])}
    assert ref_paths == got_paths, (
        f"missing={sorted(ref_paths - got_paths)[:8]} "
        f"extra={sorted(got_paths - ref_paths)[:8]}")

    ours = np.asarray(model.apply(variables, x, train=False, middle=True))
    with torch.no_grad():
        tm.eval()
        theirs = tm(torch.from_numpy(x).permute(0, 4, 1, 2, 3)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-5)
