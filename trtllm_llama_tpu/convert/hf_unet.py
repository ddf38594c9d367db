"""Diffusers UNet2DConditionModel state dict -> engine params
(models/unet.py layout).

The load-time half of the reference's UNet weight pipeline
(models/unet/weights.py update_unet_2d_condition_model_weights): torch
NCHW/OIHW tensors become NHWC/HWIO and [out,in] Linears become matmul-ready
[in,out]; attn1 q/k/v fuse into one projection and attn2 k/v into one, the
same fusions weights.py:29-41 performs. Accepts any mapping of
diffusers-named tensors (a `state_dict()` or a loaded safetensors dict) —
the upstream `diffusers` package itself is not required.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..models.unet import UNetConfig, _block_channel_plan
from .hf import _n


def params_from_diffusers_unet(state_dict, cfg: UNetConfig, dtype=None):
    sd = {k: _n(v) for k, v in state_dict.items()}
    dt = jnp.dtype(dtype or cfg.dtype)

    def lin(name):                       # torch Linear [out,in] -> [in,out]
        return jnp.asarray(sd[name + ".weight"].T, dt)

    def vec(name, suffix=".bias"):
        return jnp.asarray(sd[name + suffix], dt)

    def conv(name):                      # OIHW -> HWIO
        return {"w": jnp.asarray(sd[name + ".weight"].transpose(2, 3, 1, 0),
                                 dt),
                "b": vec(name)}

    def res_p(pre, cin, cout):
        p = {"n1w": vec(pre + "norm1", ".weight"), "n1b": vec(pre + "norm1"),
             "n2w": vec(pre + "norm2", ".weight"), "n2b": vec(pre + "norm2"),
             "tw": lin(pre + "time_emb_proj"),
             "tb": vec(pre + "time_emb_proj")}
        p["c1w"], p["c1b"] = conv(pre + "conv1")["w"], vec(pre + "conv1")
        p["c2w"], p["c2b"] = conv(pre + "conv2")["w"], vec(pre + "conv2")
        if cin != cout:
            sc = conv(pre + "conv_shortcut")
            p["sw"], p["sb"] = sc["w"], sc["b"]
        return p

    def tr_block_p(pre):
        return {
            "ln1w": vec(pre + "norm1", ".weight"), "ln1b": vec(pre + "norm1"),
            "ln2w": vec(pre + "norm2", ".weight"), "ln2b": vec(pre + "norm2"),
            "ln3w": vec(pre + "norm3", ".weight"), "ln3b": vec(pre + "norm3"),
            "qkv_w": jnp.concatenate(
                [lin(pre + "attn1.to_q"), lin(pre + "attn1.to_k"),
                 lin(pre + "attn1.to_v")], axis=1),
            "o1_w": lin(pre + "attn1.to_out.0"),
            "o1_b": vec(pre + "attn1.to_out.0"),
            "q_w": lin(pre + "attn2.to_q"),
            "kv_w": jnp.concatenate(
                [lin(pre + "attn2.to_k"), lin(pre + "attn2.to_v")], axis=1),
            "o2_w": lin(pre + "attn2.to_out.0"),
            "o2_b": vec(pre + "attn2.to_out.0"),
            "ff_iw": lin(pre + "ff.net.0.proj"),
            "ff_ib": vec(pre + "ff.net.0.proj"),
            "ff_ow": lin(pre + "ff.net.2"), "ff_ob": vec(pre + "ff.net.2"),
        }

    def tr_p(pre):
        n_blocks = len({k.split(".")[0] for k in
                        (key[len(pre) + 19:] for key in sd
                         if key.startswith(pre + "transformer_blocks."))})
        pi, po = conv(pre + "proj_in"), conv(pre + "proj_out")
        return {"nw": vec(pre + "norm", ".weight"), "nb": vec(pre + "norm"),
                "piw": pi["w"], "pib": pi["b"],
                "pow": po["w"], "pob": po["b"],
                "blocks": [tr_block_p(pre + f"transformer_blocks.{k}.")
                           for k in range(n_blocks)]}

    downs, ups = _block_channel_plan(cfg)
    params = {
        "conv_in": conv("conv_in"),
        "time_emb": {"w1": lin("time_embedding.linear_1"),
                     "b1": vec("time_embedding.linear_1"),
                     "w2": lin("time_embedding.linear_2"),
                     "b2": vec("time_embedding.linear_2")},
        "down": [], "up": [],
        "norm_out": {"w": vec("conv_norm_out", ".weight"),
                     "b": vec("conv_norm_out")},
        "conv_out": conv("conv_out"),
    }

    for i, ((in_ch, out_ch, has_down), btype) in enumerate(
            zip(downs, cfg.down_block_types)):
        pre = f"down_blocks.{i}."
        bp = {"resnets": [res_p(pre + f"resnets.{j}.",
                                in_ch if j == 0 else out_ch, out_ch)
                          for j in range(cfg.layers_per_block)]}
        if btype == "CrossAttnDownBlock2D":
            bp["attns"] = [tr_p(pre + f"attentions.{j}.")
                           for j in range(cfg.layers_per_block)]
        if has_down:
            bp["down"] = conv(pre + "downsamplers.0.conv")
        params["down"].append(bp)

    top = cfg.block_out_channels[-1]
    params["mid"] = {
        "resnets": [res_p("mid_block.resnets.0.", top, top),
                    res_p("mid_block.resnets.1.", top, top)],
        "attns": [tr_p("mid_block.attentions.0.")]}

    n_up = cfg.layers_per_block + 1
    for i, ((in_ch, out_ch, prev_out, has_up), btype) in enumerate(
            zip(ups, cfg.up_block_types)):
        pre = f"up_blocks.{i}."
        resnets = []
        for j in range(n_up):
            skip_ch = in_ch if j == n_up - 1 else out_ch
            rin = prev_out if j == 0 else out_ch
            resnets.append(res_p(pre + f"resnets.{j}.",
                                 rin + skip_ch, out_ch))
        bp = {"resnets": resnets}
        if btype == "CrossAttnUpBlock2D":
            bp["attns"] = [tr_p(pre + f"attentions.{j}.")
                           for j in range(n_up)]
        if has_up:
            bp["up"] = conv(pre + "upsamplers.0.conv")
        params["up"].append(bp)

    return params
