"""UNet2DConditionModel goldens (reference models/unet/*).

No `diffusers` in this environment, so the oracle is an independent torch
implementation of the same SD 1.x semantics written here (NCHW, module
names matching diffusers' state_dict so convert/hf_unet.py consumes it
directly — the same golden pattern as tests/test_chatglm.py). Plus
op-level checks of the new conv/pool/norm ops against torch.
"""

import math

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from trtllm_llama_tpu.models import unet as junet
from trtllm_llama_tpu.convert.hf_unet import params_from_diffusers_unet


# ------------------------------------------------------------ torch oracle

class TResnet(nn.Module):
    def __init__(self, cin, cout, temb_ch, groups, eps):
        super().__init__()
        self.norm1 = nn.GroupNorm(groups, cin, eps=eps)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.time_emb_proj = nn.Linear(temb_ch, cout)
        self.norm2 = nn.GroupNorm(groups, cout, eps=eps)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        self.conv_shortcut = (nn.Conv2d(cin, cout, 1)
                              if cin != cout else None)

    def forward(self, x, temb):
        h = self.conv1(F.silu(self.norm1(x)))
        h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


def _attn(q, k, v, heads, scale):
    b, sq, inner = q.shape
    sk = k.shape[1]
    d = inner // heads
    q = q.view(b, sq, heads, d).permute(0, 2, 1, 3)
    k = k.view(b, sk, heads, d).permute(0, 2, 1, 3)
    v = v.view(b, sk, heads, d).permute(0, 2, 1, 3)
    probs = torch.softmax((q.float() @ k.float().transpose(-1, -2)) * scale,
                          dim=-1)
    out = (probs @ v.float()).to(v.dtype)
    return out.permute(0, 2, 1, 3).reshape(b, sq, inner)


class TGeglu(nn.Module):
    def __init__(self, dim, inner):
        super().__init__()
        self.proj = nn.Linear(dim, 2 * inner)

    def forward(self, x):
        val, gate = self.proj(x).chunk(2, dim=-1)
        return val * F.gelu(gate.float()).to(val.dtype)


class TAttnSub(nn.Module):
    """attn1 (self) or attn2 (cross) with diffusers naming."""
    def __init__(self, dim, ctx_dim, heads):
        super().__init__()
        self.heads = heads
        self.scale = (dim // heads) ** -0.5
        self.to_q = nn.Linear(dim, dim, bias=False)
        self.to_k = nn.Linear(ctx_dim, dim, bias=False)
        self.to_v = nn.Linear(ctx_dim, dim, bias=False)
        self.to_out = nn.ModuleList([nn.Linear(dim, dim)])

    def forward(self, x, context=None):
        ctx = x if context is None else context
        out = _attn(self.to_q(x), self.to_k(ctx), self.to_v(ctx),
                    self.heads, self.scale)
        return self.to_out[0](out)


class TBasicBlock(nn.Module):
    def __init__(self, dim, ctx_dim, heads):
        super().__init__()
        self.attn1 = TAttnSub(dim, dim, heads)
        self.attn2 = TAttnSub(dim, ctx_dim, heads)
        ff_inner = 4 * dim
        self.ff = nn.Module()
        self.ff.net = nn.ModuleList([TGeglu(dim, ff_inner), nn.Identity(),
                                     nn.Linear(ff_inner, dim)])
        self.norm1 = nn.LayerNorm(dim)
        self.norm2 = nn.LayerNorm(dim)
        self.norm3 = nn.LayerNorm(dim)

    def forward(self, x, context):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), context)
        h = self.ff.net[0](self.norm3(x))
        return x + self.ff.net[2](h)


class TTransformer2D(nn.Module):
    def __init__(self, ch, ctx_dim, heads, groups):
        super().__init__()
        self.norm = nn.GroupNorm(groups, ch, eps=1e-6)
        self.proj_in = nn.Conv2d(ch, ch, 1)
        self.transformer_blocks = nn.ModuleList(
            [TBasicBlock(ch, ctx_dim, heads)])
        self.proj_out = nn.Conv2d(ch, ch, 1)

    def forward(self, x, context):
        b, c, h, w = x.shape
        res = x
        x = self.proj_in(self.norm(x))
        x = x.permute(0, 2, 3, 1).reshape(b, h * w, c)
        for blk in self.transformer_blocks:
            x = blk(x, context)
        x = x.reshape(b, h, w, c).permute(0, 3, 1, 2)
        return self.proj_out(x) + res


class TUNet(nn.Module):
    """Mini SD UNet; mirrors unet_2d_condition.py wiring exactly."""

    def __init__(self, cfg: junet.UNetConfig):
        super().__init__()
        self.cfg = cfg
        c0 = cfg.block_out_channels[0]
        ted = cfg.time_embed_dim
        g, eps, heads = (cfg.norm_num_groups, cfg.norm_eps,
                         cfg.attention_head_dim)
        ctx = cfg.cross_attention_dim

        self.conv_in = nn.Conv2d(cfg.in_channels, c0, 3, padding=1)
        self.time_embedding = nn.Module()
        self.time_embedding.linear_1 = nn.Linear(c0, ted)
        self.time_embedding.linear_2 = nn.Linear(ted, ted)

        downs, ups = junet._block_channel_plan(cfg)
        self.down_blocks = nn.ModuleList()
        for (cin, cout, has_down), btype in zip(downs, cfg.down_block_types):
            blk = nn.Module()
            blk.has_attn = btype == "CrossAttnDownBlock2D"
            blk.resnets = nn.ModuleList(
                [TResnet(cin if i == 0 else cout, cout, ted, g, eps)
                 for i in range(cfg.layers_per_block)])
            if blk.has_attn:
                blk.attentions = nn.ModuleList(
                    [TTransformer2D(cout, ctx, heads, g)
                     for _ in range(cfg.layers_per_block)])
            if has_down:
                blk.downsamplers = nn.ModuleList([nn.Module()])
                blk.downsamplers[0].conv = nn.Conv2d(cout, cout, 3,
                                                     stride=2, padding=1)
            blk.has_down = has_down
            self.down_blocks.append(blk)

        top = cfg.block_out_channels[-1]
        self.mid_block = nn.Module()
        self.mid_block.resnets = nn.ModuleList(
            [TResnet(top, top, ted, g, eps), TResnet(top, top, ted, g, eps)])
        self.mid_block.attentions = nn.ModuleList(
            [TTransformer2D(top, ctx, heads, g)])

        n_up = cfg.layers_per_block + 1
        self.up_blocks = nn.ModuleList()
        for (cin, cout, prev_out, has_up), btype in zip(
                ups, cfg.up_block_types):
            blk = nn.Module()
            blk.has_attn = btype == "CrossAttnUpBlock2D"
            resnets = []
            for i in range(n_up):
                skip = cin if i == n_up - 1 else cout
                rin = prev_out if i == 0 else cout
                resnets.append(TResnet(rin + skip, cout, ted, g, eps))
            blk.resnets = nn.ModuleList(resnets)
            if blk.has_attn:
                blk.attentions = nn.ModuleList(
                    [TTransformer2D(cout, ctx, heads, g)
                     for _ in range(n_up)])
            if has_up:
                blk.upsamplers = nn.ModuleList([nn.Module()])
                blk.upsamplers[0].conv = nn.Conv2d(cout, cout, 3, padding=1)
            blk.has_up = has_up
            self.up_blocks.append(blk)

        self.conv_norm_out = nn.GroupNorm(g, c0, eps=eps)
        self.conv_out = nn.Conv2d(c0, cfg.out_channels, 3, padding=1)

    def time_proj(self, t):
        dim = self.cfg.block_out_channels[0]
        half = dim // 2
        freqs = torch.exp(torch.arange(half, dtype=torch.float32)
                          * (-math.log(10000.0)
                             / (half - self.cfg.freq_shift)))
        args = t.float()[:, None] * freqs[None]
        if self.cfg.flip_sin_to_cos:
            return torch.cat([torch.cos(args), torch.sin(args)], dim=1)
        return torch.cat([torch.sin(args), torch.cos(args)], dim=1)

    def forward(self, sample, t, context):
        temb = self.time_embedding.linear_2(
            F.silu(self.time_embedding.linear_1(self.time_proj(t))))
        x = self.conv_in(sample)
        skips = [x]
        for blk in self.down_blocks:
            for i, rn in enumerate(blk.resnets):
                x = rn(x, temb)
                if blk.has_attn:
                    x = blk.attentions[i](x, context)
                skips.append(x)
            if blk.has_down:
                x = blk.downsamplers[0].conv(x)
                skips.append(x)

        x = self.mid_block.resnets[0](x, temb)
        x = self.mid_block.attentions[0](x, context)
        x = self.mid_block.resnets[1](x, temb)

        for blk in self.up_blocks:
            for i, rn in enumerate(blk.resnets):
                x = torch.cat([x, skips.pop()], dim=1)
                x = rn(x, temb)
                if blk.has_attn:
                    x = blk.attentions[i](x, context)
            if blk.has_up:
                x = F.interpolate(x, scale_factor=2.0, mode="nearest")
                x = blk.upsamplers[0].conv(x)

        return self.conv_out(F.silu(self.conv_norm_out(x)))


# ----------------------------------------------------------------- fixtures

def _tiny_cfg():
    return junet.UNetConfig(
        in_channels=4, out_channels=4,
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        block_out_channels=(32, 64), layers_per_block=1,
        norm_num_groups=8, cross_attention_dim=40, attention_head_dim=4)


@pytest.fixture(scope="module")
def golden():
    torch.manual_seed(0)
    cfg = _tiny_cfg()
    tm = TUNet(cfg).eval()
    x = torch.randn(2, 4, 16, 16)
    t = torch.tensor([3.0, 977.0])
    ctx = torch.randn(2, 7, cfg.cross_attention_dim)
    with torch.no_grad():
        ref = tm(x, t, ctx)
    return cfg, tm, x, t, ctx, ref


# -------------------------------------------------------------------- tests

def test_unet_golden_vs_torch(golden):
    cfg, tm, x, t, ctx, ref = golden
    params = params_from_diffusers_unet(
        {k: v for k, v in tm.state_dict().items()
         # converter expects diffusers' conv_norm_out name as-is
         }, cfg)
    out = jax.jit(lambda p, a, b, c: junet.forward(p, cfg, a, b, c))(
        params, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(t.numpy()), jnp.asarray(ctx.numpy()))
    out_nchw = np.asarray(out).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(out_nchw, ref.numpy(), atol=2e-4, rtol=2e-3)


def test_unet_spatial_shapes(golden):
    """Multi-resolution path: 2 blocks => one down/upsample pair; odd
    batch; different spatial size from the golden run."""
    cfg, tm, *_ = golden
    params = params_from_diffusers_unet(tm.state_dict(), cfg)
    x = jnp.zeros((3, 8, 8, 4))
    out = junet.forward(params, cfg, x, jnp.array(5.0),
                        jnp.zeros((3, 7, cfg.cross_attention_dim)))
    assert out.shape == (3, 8, 8, 4)
    assert bool(jnp.isfinite(out).all())


def test_timestep_embedding_vs_torch(golden):
    cfg, tm, _, t, *_ = golden
    ours = junet.timestep_embedding(jnp.asarray(t.numpy()),
                                    cfg.block_out_channels[0],
                                    cfg.flip_sin_to_cos, cfg.freq_shift)
    np.testing.assert_allclose(np.asarray(ours), tm.time_proj(t).numpy(),
                               atol=1e-5, rtol=1e-5)


# --------------------------------------------------------- op-level goldens

def test_conv2d_vs_torch():
    from trtllm_llama_tpu.ops.conv import conv2d
    torch.manual_seed(1)
    m = nn.Conv2d(6, 10, 3, stride=2, padding=1)
    x = torch.randn(2, 6, 9, 9)
    with torch.no_grad():
        ref = m(x)
    out = conv2d(jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                 jnp.asarray(m.weight.detach().numpy().transpose(2, 3, 1, 0)),
                 jnp.asarray(m.bias.detach().numpy()), stride=2, padding=1)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2),
                               ref.numpy(), atol=1e-5, rtol=1e-4)


def test_conv_transpose2d_vs_torch():
    from trtllm_llama_tpu.ops.conv import conv_transpose2d
    torch.manual_seed(2)
    m = nn.ConvTranspose2d(5, 8, 4, stride=2, padding=1)
    x = torch.randn(2, 5, 7, 7)
    with torch.no_grad():
        ref = m(x)
    # torch ConvTranspose2d weight: [Cin, Cout, KH, KW] -> HWIO
    w = m.weight.detach().numpy().transpose(2, 3, 0, 1)
    out = conv_transpose2d(jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                           jnp.asarray(w),
                           jnp.asarray(m.bias.detach().numpy()),
                           stride=2, padding=1)
    assert out.shape[1:3] == ref.shape[2:]
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2),
                               ref.numpy(), atol=1e-5, rtol=1e-4)


def test_pool_and_upsample_vs_torch():
    from trtllm_llama_tpu.ops.conv import (avg_pool2d, max_pool2d,
                                           upsample_nearest2x)
    torch.manual_seed(3)
    x = torch.randn(2, 3, 8, 8)
    xj = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    np.testing.assert_allclose(
        np.asarray(avg_pool2d(xj, 2)).transpose(0, 3, 1, 2),
        F.avg_pool2d(x, 2).numpy(), atol=1e-6, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(max_pool2d(xj, 2)).transpose(0, 3, 1, 2),
        F.max_pool2d(x, 2).numpy(), atol=1e-6, rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(upsample_nearest2x(xj)).transpose(0, 3, 1, 2),
        F.interpolate(x, scale_factor=2.0, mode="nearest").numpy(),
        atol=0, rtol=0)


def test_group_norm_vs_torch():
    from trtllm_llama_tpu.ops.conv import group_norm
    torch.manual_seed(4)
    m = nn.GroupNorm(4, 12, eps=1e-5)
    with torch.no_grad():
        m.weight.mul_(1.3).add_(0.1)
        m.bias.add_(0.05)
    x = torch.randn(2, 12, 5, 5)
    with torch.no_grad():
        ref = m(x)
    out = group_norm(jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
                     jnp.asarray(m.weight.detach().numpy()),
                     jnp.asarray(m.bias.detach().numpy()), 4, 1e-5)
    np.testing.assert_allclose(np.asarray(out).transpose(0, 3, 1, 2),
                               ref.numpy(), atol=1e-5, rtol=1e-4)
