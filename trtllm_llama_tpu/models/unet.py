"""UNet2DConditionModel — the Stable-Diffusion UNet family
(reference models/unet/{unet_2d_condition,unet_2d_blocks,resnet,attention,
embeddings}.py, ~1.5k LoC of graph-DSL modules).

TPU-native design:
  - **NHWC end-to-end.** The reference's NCHW graph pays a relayout around
    every conv on TPU; here activations stay [B, H, W, C] so every conv is
    an MXU implicit-GEMM with C on the lanes, and the spatial-transformer
    flatten is a free reshape ([B,H,W,C] -> [B, H*W, C]) instead of the
    reference's permute([0,2,3,1]) (attention.py:255-258).
  - Functional param-tree modules like every other family here; blocks are
    heterogeneous (per-resolution channel widths), so the model unrolls the
    block structure statically under jit instead of lax.scan.
  - fp32 softmax in attention (reference attention.py:62 `precision(
    'float32')`) and fp32 conv/norm accumulation.

Shapes follow SD 1.x geometry: attention_head_dim is the NUMBER of heads
(diffusers v0.x naming quirk, see unet_2d_blocks.py:360-363 where head_dim
is computed as channels // attn_num_head_channels).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops.conv import (avg_pool2d, conv2d, group_norm, upsample_nearest2x)
from ..ops.norm import layer_norm


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    down_block_types: Tuple[str, ...] = (
        "CrossAttnDownBlock2D", "CrossAttnDownBlock2D",
        "CrossAttnDownBlock2D", "DownBlock2D")
    up_block_types: Tuple[str, ...] = (
        "UpBlock2D", "CrossAttnUpBlock2D", "CrossAttnUpBlock2D",
        "CrossAttnUpBlock2D")
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    norm_eps: float = 1e-5
    cross_attention_dim: int = 1280
    attention_head_dim: int = 8          # = number of heads (SD 1.x quirk)
    flip_sin_to_cos: bool = True
    freq_shift: float = 0.0
    dtype: str = "float32"

    @property
    def jnp_dtype(self):
        return jnp.dtype(self.dtype)

    @property
    def time_embed_dim(self) -> int:
        return self.block_out_channels[0] * 4


# ---------------------------------------------------------------- embeddings

def timestep_embedding(timesteps, dim: int, flip_sin_to_cos: bool = True,
                       freq_shift: float = 0.0, max_period: float = 10000.0):
    """Sinusoidal timestep embedding (reference embeddings.py:9-54, DDPM
    convention). timesteps: [B] (possibly fractional). Returns [B, dim]."""
    half = dim // 2
    exponent = (jnp.arange(half, dtype=jnp.float32)
                * (-math.log(max_period) / (half - freq_shift)))
    freqs = jnp.exp(exponent)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    if flip_sin_to_cos:
        return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=1)
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=1)


# ------------------------------------------------------------------- modules

def _silu(x):
    return jax.nn.silu(x)


def _linear(x, w, b=None):
    out = x @ w
    return out if b is None else out + b


def _resnet_block(p, cfg: UNetConfig, x, temb):
    """ResnetBlock2D (reference resnet.py:89-215): GN->silu->conv3x3 ->
    +time_proj -> GN->silu->conv3x3, with an optional 1x1 shortcut when
    channel counts change."""
    g, eps = cfg.norm_num_groups, cfg.norm_eps
    h = group_norm(x, p["n1w"], p["n1b"], g, eps)
    h = _silu(h)
    h = conv2d(h, p["c1w"], p["c1b"], padding=1)
    t = _linear(_silu(temb), p["tw"], p["tb"]).astype(h.dtype)
    h = h + t[:, None, None, :]
    h = group_norm(h, p["n2w"], p["n2b"], g, eps)
    h = _silu(h)
    h = conv2d(h, p["c2w"], p["c2b"], padding=1)
    if "sw" in p:
        x = conv2d(x, p["sw"], p["sb"], padding=0)
    return x + h


def _attention(q, k, v, heads: int, scale: float):
    """Multi-head attention over flat token sequences; fp32 softmax
    (reference attention.py:196-203 _attention + precision('float32'))."""
    b, sq, inner = q.shape
    sk = k.shape[1]
    d = inner // heads
    q = q.reshape(b, sq, heads, d)
    k = k.reshape(b, sk, heads, d)
    v = v.reshape(b, sk, heads, d)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v)
    return out.reshape(b, sq, inner)


def _transformer_block(p, heads: int, x, context):
    """BasicTransformerBlock (reference attention.py:184-210): pre-LN
    self-attn -> pre-LN cross-attn -> pre-LN GEGLU feed-forward."""
    inner = x.shape[-1]
    scale = (inner // heads) ** -0.5

    h = layer_norm(x, p["ln1w"], p["ln1b"])
    qkv = _linear(h, p["qkv_w"])
    q, k, v = jnp.split(qkv, 3, axis=-1)
    x = x + _linear(_attention(q, k, v, heads, scale), p["o1_w"], p["o1_b"])

    h = layer_norm(x, p["ln2w"], p["ln2b"])
    q = _linear(h, p["q_w"])
    kv = _linear(context, p["kv_w"])
    k, v = jnp.split(kv, 2, axis=-1)
    x = x + _linear(_attention(q, k, v, heads, scale), p["o2_w"], p["o2_b"])

    h = layer_norm(x, p["ln3w"], p["ln3b"])
    h = _linear(h, p["ff_iw"], p["ff_ib"])
    val, gate = jnp.split(h, 2, axis=-1)
    h = val * jax.nn.gelu(gate.astype(jnp.float32),
                          approximate=False).astype(val.dtype)
    return x + _linear(h, p["ff_ow"], p["ff_ob"])


def _transformer_2d(p, cfg: UNetConfig, x, context):
    """Transformer2DModel (reference attention.py:213-269): GN -> 1x1
    proj_in -> flatten spatial -> transformer blocks -> 1x1 proj_out +
    residual. NHWC makes the flatten a plain reshape."""
    b, hh, ww, c = x.shape
    residual = x
    h = group_norm(x, p["nw"], p["nb"], cfg.norm_num_groups, 1e-6)
    h = conv2d(h, p["piw"], p["pib"], padding=0)
    inner = h.shape[-1]
    h = h.reshape(b, hh * ww, inner)
    for bp in p["blocks"]:
        h = _transformer_block(bp, cfg.attention_head_dim, h, context)
    h = h.reshape(b, hh, ww, inner)
    h = conv2d(h, p["pow"], p["pob"], padding=0)
    return h + residual


# -------------------------------------------------------------------- blocks

def _down_block(p, cfg: UNetConfig, has_attn: bool, x, temb, context):
    skips = []
    for i, rp in enumerate(p["resnets"]):
        x = _resnet_block(rp, cfg, x, temb)
        if has_attn:
            x = _transformer_2d(p["attns"][i], cfg, x, context)
        skips.append(x)
    if "down" in p:
        x = conv2d(x, p["down"]["w"], p["down"]["b"], stride=2, padding=1)
        skips.append(x)
    return x, skips


def _up_block(p, cfg: UNetConfig, has_attn: bool, x, skips, temb, context):
    for i, rp in enumerate(p["resnets"]):
        x = jnp.concatenate([x, skips.pop()], axis=-1)
        x = _resnet_block(rp, cfg, x, temb)
        if has_attn:
            x = _transformer_2d(p["attns"][i], cfg, x, context)
    if "up" in p:
        x = upsample_nearest2x(x)
        x = conv2d(x, p["up"]["w"], p["up"]["b"], padding=1)
    return x


def _mid_block(p, cfg: UNetConfig, x, temb, context):
    x = _resnet_block(p["resnets"][0], cfg, x, temb)
    for ap, rp in zip(p["attns"], p["resnets"][1:]):
        x = _transformer_2d(ap, cfg, x, context)
        x = _resnet_block(rp, cfg, x, temb)
    return x


# ------------------------------------------------------------------- forward

def forward(params, cfg: UNetConfig, sample, timesteps,
            encoder_hidden_states):
    """Denoising step (reference unet_2d_condition.py:126-173).

    sample: [B, H, W, in_channels] (NHWC!); timesteps: [B] (or scalar);
    encoder_hidden_states: [B, S_ctx, cross_attention_dim].
    Returns predicted noise [B, H, W, out_channels].
    """
    if timesteps.ndim == 0:
        timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))

    temb = timestep_embedding(timesteps, cfg.block_out_channels[0],
                              cfg.flip_sin_to_cos, cfg.freq_shift)
    te = params["time_emb"]
    temb = _linear(temb.astype(cfg.jnp_dtype), te["w1"], te["b1"])
    temb = _linear(_silu(temb), te["w2"], te["b2"])

    x = conv2d(sample, params["conv_in"]["w"], params["conv_in"]["b"],
               padding=1)

    skips = [x]
    for bp, btype in zip(params["down"], cfg.down_block_types):
        x, s = _down_block(bp, cfg, btype == "CrossAttnDownBlock2D",
                           x, temb, encoder_hidden_states)
        skips.extend(s)

    x = _mid_block(params["mid"], cfg, x, temb, encoder_hidden_states)

    for bp, btype in zip(params["up"], cfg.up_block_types):
        n = len(bp["resnets"])
        x = _up_block(bp, cfg, btype == "CrossAttnUpBlock2D",
                      x, skips[-n:], temb, encoder_hidden_states)
        del skips[-n:]

    x = group_norm(x, params["norm_out"]["w"], params["norm_out"]["b"],
                   cfg.norm_num_groups, cfg.norm_eps)
    x = _silu(x)
    return conv2d(x, params["conv_out"]["w"], params["conv_out"]["b"],
                  padding=1)


# ---------------------------------------------------------------------- init

def _block_channel_plan(cfg: UNetConfig):
    """(in, out, skip-in) channel bookkeeping mirroring the reference's
    constructor loops (unet_2d_condition.py:54-115)."""
    downs = []
    out_ch = cfg.block_out_channels[0]
    for i in range(len(cfg.down_block_types)):
        in_ch, out_ch = out_ch, cfg.block_out_channels[i]
        downs.append((in_ch, out_ch,
                      i != len(cfg.block_out_channels) - 1))
    ups = []
    rev = list(reversed(cfg.block_out_channels))
    out_ch = rev[0]
    for i in range(len(cfg.up_block_types)):
        prev_out, out_ch = out_ch, rev[i]
        in_ch = rev[min(i + 1, len(cfg.block_out_channels) - 1)]
        ups.append((in_ch, out_ch, prev_out,
                    i != len(cfg.block_out_channels) - 1))
    return downs, ups


def init_params(cfg: UNetConfig, key):
    """Random params with the full SD block structure."""
    dt = cfg.jnp_dtype
    ted = cfg.time_embed_dim
    counter = [0]

    def nxt():
        counter[0] += 1
        return jax.random.fold_in(key, counter[0])

    def w(shape):
        fan_in = int(jnp.prod(jnp.asarray(shape[:-1])))
        return (jax.random.normal(nxt(), shape, jnp.float32)
                * (fan_in ** -0.5)).astype(dt)

    def conv_p(cin, cout, k=3):
        return {"w": w((k, k, cin, cout)), "b": jnp.zeros((cout,), dt)}

    def res_p(cin, cout):
        p = {"n1w": jnp.ones((cin,), dt), "n1b": jnp.zeros((cin,), dt),
             "c1w": w((3, 3, cin, cout)), "c1b": jnp.zeros((cout,), dt),
             "tw": w((ted, cout)), "tb": jnp.zeros((cout,), dt),
             "n2w": jnp.ones((cout,), dt), "n2b": jnp.zeros((cout,), dt),
             "c2w": w((3, 3, cout, cout)), "c2b": jnp.zeros((cout,), dt)}
        if cin != cout:
            p["sw"] = w((1, 1, cin, cout))
            p["sb"] = jnp.zeros((cout,), dt)
        return p

    def tr_p(ch):
        inner, ctx = ch, cfg.cross_attention_dim
        block = {
            "ln1w": jnp.ones((inner,), dt), "ln1b": jnp.zeros((inner,), dt),
            "qkv_w": w((inner, 3 * inner)),
            "o1_w": w((inner, inner)), "o1_b": jnp.zeros((inner,), dt),
            "ln2w": jnp.ones((inner,), dt), "ln2b": jnp.zeros((inner,), dt),
            "q_w": w((inner, inner)), "kv_w": w((ctx, 2 * inner)),
            "o2_w": w((inner, inner)), "o2_b": jnp.zeros((inner,), dt),
            "ln3w": jnp.ones((inner,), dt), "ln3b": jnp.zeros((inner,), dt),
            "ff_iw": w((inner, 8 * inner)),
            "ff_ib": jnp.zeros((8 * inner,), dt),
            "ff_ow": w((4 * inner, inner)),
            "ff_ob": jnp.zeros((inner,), dt),
        }
        return {"nw": jnp.ones((ch,), dt), "nb": jnp.zeros((ch,), dt),
                "piw": w((1, 1, ch, inner)), "pib": jnp.zeros((inner,), dt),
                "pow": w((1, 1, inner, ch)), "pob": jnp.zeros((ch,), dt),
                "blocks": [block]}

    downs, ups = _block_channel_plan(cfg)
    c0 = cfg.block_out_channels[0]
    params = {
        "conv_in": conv_p(cfg.in_channels, c0),
        "time_emb": {"w1": w((c0, ted)), "b1": jnp.zeros((ted,), dt),
                     "w2": w((ted, ted)), "b2": jnp.zeros((ted,), dt)},
        "down": [], "up": [],
        "norm_out": {"w": jnp.ones((c0,), dt), "b": jnp.zeros((c0,), dt)},
        "conv_out": conv_p(c0, cfg.out_channels),
    }

    for (in_ch, out_ch, has_down), btype in zip(downs, cfg.down_block_types):
        has_attn = btype == "CrossAttnDownBlock2D"
        bp = {"resnets": [res_p(in_ch if i == 0 else out_ch, out_ch)
                          for i in range(cfg.layers_per_block)]}
        if has_attn:
            bp["attns"] = [tr_p(out_ch) for _ in range(cfg.layers_per_block)]
        if has_down:
            bp["down"] = conv_p(out_ch, out_ch)
        params["down"].append(bp)

    top = cfg.block_out_channels[-1]
    params["mid"] = {"resnets": [res_p(top, top), res_p(top, top)],
                     "attns": [tr_p(top)]}

    n_up = cfg.layers_per_block + 1
    for (in_ch, out_ch, prev_out, has_up), btype in zip(
            ups, cfg.up_block_types):
        has_attn = btype == "CrossAttnUpBlock2D"
        resnets = []
        for i in range(n_up):
            skip_ch = in_ch if i == n_up - 1 else out_ch
            rin = prev_out if i == 0 else out_ch
            resnets.append(res_p(rin + skip_ch, out_ch))
        bp = {"resnets": resnets}
        if has_attn:
            bp["attns"] = [tr_p(out_ch) for _ in range(n_up)]
        if has_up:
            bp["up"] = conv_p(out_ch, out_ch)
        params["up"].append(bp)

    return params
