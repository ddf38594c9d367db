"""Pipeline parallelism: the layer stack sharded over a 'pp' mesh axis.

The reference carries send/recv graph ops (functional.py:2525,2568) but
hardcodes pp_size=1 (runtime/generation.py:179) — pipelining never ships.
Here it does, TPU-style: no point-to-point plumbing or per-rank engine
builds — one shard_map pipeline where

  - every stacked layer leaf ([L, ...] weights, the [L, B, H, S, D] KV
    cache) is sharded over 'pp' on the L axis, so stage p physically holds
    only its own L/pp layers;
  - activations are microbatched over the batch axis and flow through the
    stages on a `lax.ppermute` ring (GPipe schedule: M microbatches drain
    in M + pp - 1 ticks, bubbles masked out);
  - embed / final norm / lm_head / sampling stay outside the pipeline as
    ordinary GSPMD ops (replicated under a pure-pp mesh).

Because stage transfers are one activation tensor per tick, 'pp' is the
axis meant to span DCN (multi-slice) where TP's per-layer collectives
cannot — the classic reason inference pipelines exist.

`PipelinedLlama` is a model shim exposing the llama forward contract
(init_caches / forward_prefill / forward_decode), so GenerationSession
reuses its entire on-device decode loop unchanged:

    mapping = Mapping(pp=4); mesh = mapping.make_mesh()
    shim = PipelinedLlama(mapping, n_micro=4)
    sess = GenerationSession(cfg, params, ecfg, mapping=mapping, mesh=mesh,
                             model=shim)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

# jax >= 0.7 top-level API; the call below uses axis_names=/check_vma=
# which the old experimental shard_map never had, so no fallback exists
from jax import shard_map as _shard_map

from ..config import ModelConfig
from ..models import llama
from ..ops.attention import KVCache


def _dyn(a, i):
    return jax.lax.dynamic_index_in_dim(a, i, 0, keepdims=False)


def pipeline_layers(cfg: ModelConfig, mesh, n_micro: int, lw, x, cos, sin,
                    aux, caches: KVCache, decode: bool):
    """Run the transformer stack as a pp-stage pipeline.

    lw: stacked layer weights, leaves [L, ...] sharded P('pp', ...).
    x: [B, S, D] (prefill) or [B, D] (decode) — replicated.
    cos/sin: RoPE slices broadcast like x; aux: seq_lens (prefill) or write
    positions (decode), [B]. caches: stacked KVCache sharded over 'pp' on L.
    Returns (y, caches) with y replicated.
    """
    pp = dict(mesh.shape)["pp"]
    m = n_micro
    b = x.shape[0]
    if b % m:
        raise ValueError(f"batch {b} not divisible by n_micro {m}")
    mb = b // m

    def stage(lw_loc, k_loc, v_loc, sc_loc, x, cos, sin, aux):
        # drop the singleton dp/sp/tp shard axes shard_map leaves on
        # unmentioned-axis operands: all arrays arrive full-size here
        p = jax.lax.axis_index("pp")
        caches_loc = KVCache(k_loc, v_loc, sc_loc)
        l_loc = k_loc.shape[0]
        xm = x.reshape(m, mb, *x.shape[1:])
        cosm = cos.reshape(m, mb, *cos.shape[1:])
        sinm = sin.reshape(m, mb, *sin.shape[1:])
        auxm = aux.reshape(m, mb, *aux.shape[1:])

        def tick(t, carry):
            buf, out, caches = carry
            mi = t - p                       # microbatch this stage handles
            act = (mi >= 0) & (mi < m)
            mi_c = jnp.clip(mi, 0, m - 1)
            x_in = jnp.where(p == 0, _dyn(xm, mi_c), buf)
            cos_i, sin_i = _dyn(cosm, mi_c), _dyn(sinm, mi_c)
            aux_i = _dyn(auxm, mi_c)
            row0 = mi_c * mb
            c_mb = KVCache(
                jax.lax.dynamic_slice_in_dim(caches.k, row0, mb, 1),
                jax.lax.dynamic_slice_in_dim(caches.v, row0, mb, 1),
                caches.scale)

            def body(carry, layer):
                h, cc = carry
                h, cc = llama._attn_block(cfg, lw_loc, layer, h, cos_i,
                                          sin_i, cc, aux_i, decode)
                h = llama._mlp_block(cfg, lw_loc, layer, h)
                return (h, cc), None

            (h, c_new), _ = jax.lax.scan(body, (x_in, c_mb),
                                         jnp.arange(l_loc))
            # bubbles must not touch the cache (their rows belong to a
            # clipped real microbatch)
            k2 = jax.lax.dynamic_update_slice_in_dim(
                caches.k, jnp.where(act, c_new.k, c_mb.k), row0, 1)
            v2 = jax.lax.dynamic_update_slice_in_dim(
                caches.v, jnp.where(act, c_new.v, c_mb.v), row0, 1)
            out_upd = jax.lax.dynamic_update_index_in_dim(
                out, h, mi_c, 0)
            out = jnp.where(act & (p == pp - 1), out_upd, out)
            # hand this tick's output to the next stage (ring; stage 0's
            # incoming value is ignored — it injects fresh microbatches)
            buf = jax.lax.ppermute(
                h, "pp", [(i, (i + 1) % pp) for i in range(pp)])
            return buf, out, KVCache(k2, v2, caches.scale)

        buf0 = jnp.zeros_like(_dyn(xm, 0))
        out0 = jnp.zeros_like(xm)
        buf, out, caches_loc = jax.lax.fori_loop(
            0, m + pp - 1, tick, (buf0, out0, caches_loc))
        # only the last stage holds real outputs; replicate across stages.
        # psum in f32: XLA-CPU's AllReducePromotion pass crashes cloning a
        # bf16 all-reduce (TPU is fine either way; cast is epsilon cost).
        out = jax.lax.psum(
            jnp.where(p == pp - 1, out,
                      jnp.zeros_like(out)).astype(jnp.float32), "pp")
        out = out.astype(x.dtype)
        return out.reshape(b, *x.shape[1:]), caches_loc.k, caches_loc.v

    def leaf_spec(a):
        return P("pp", *([None] * (a.ndim - 1)))

    lw_specs = jax.tree.map(leaf_spec, lw)
    fn = _shard_map(
        stage, mesh=mesh, axis_names={"pp"},
        in_specs=(lw_specs, P("pp"), P("pp"), P("pp"), P(), P(), P(), P()),
        out_specs=(P(), P("pp"), P("pp")),
        check_vma=False)
    y, k, v = fn(lw, caches.k, caches.v, caches.scale, x, cos, sin,
                 jnp.asarray(aux, jnp.int32))
    return y, KVCache(k, v, caches.scale)


class PipelinedLlama:
    """llama with the layer stack pipelined over 'pp' (model-shim contract:
    init_caches / forward_prefill / forward_decode, so GenerationSession's
    jitted generate loop works unchanged)."""

    def __init__(self, mapping, n_micro: int = 0):
        if mapping.pp < 2:
            raise ValueError("PipelinedLlama needs mapping.pp >= 2")
        if mapping.dp * mapping.sp != 1:
            raise ValueError("pipeline composes with pp and tp "
                             "(dp = sp = 1); tp stays a GSPMD auto axis "
                             "inside the shard_map stages")
        self.mapping = mapping
        self.n_micro = n_micro or mapping.pp
        self._mesh = None   # bound by the session via bind_mesh

    def bind_mesh(self, mesh):
        self._mesh = mesh

    def init_caches(self, cfg, batch, max_len, kv_scales=None):
        return llama.init_caches(cfg, batch, max_len, kv_scales)

    def _rope(self, cfg, positions):
        from ..ops.rope import rope_tables_for, take_rope
        return take_rope(*rope_tables_for(cfg), positions)

    def forward_prefill(self, params, cfg, input_ids, seq_lens, caches,
                        return_all_logits: bool = False):
        from ..ops.linear import dense, embedding_lookup
        from ..ops.norm import rms_norm
        b, s = input_ids.shape
        x = embedding_lookup(params["embed"], input_ids, cfg.jnp_dtype)
        positions = jnp.broadcast_to(jnp.arange(s)[None], (b, s))
        cos, sin = self._rope(cfg, positions)
        x, caches = pipeline_layers(cfg, self._mesh, self.n_micro,
                                    params["layers"], x, cos, sin,
                                    seq_lens, caches, decode=False)
        x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
        if return_all_logits:
            return dense(x, params["lm_head"], jnp.float32), caches
        last = jnp.take_along_axis(
            x, (seq_lens - 1)[:, None, None].astype(jnp.int32), axis=1)[:, 0]
        return dense(last, params["lm_head"], jnp.float32), caches

    def forward_decode(self, params, cfg, tokens, positions, caches):
        from ..ops.linear import dense, embedding_lookup
        from ..ops.norm import rms_norm
        x = embedding_lookup(params["embed"], tokens, cfg.jnp_dtype)
        cos, sin = self._rope(cfg, positions)
        x, caches = pipeline_layers(cfg, self._mesh, self.n_micro,
                                    params["layers"], x, cos, sin,
                                    positions, caches, decode=True)
        x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
        return dense(x, params["lm_head"], jnp.float32), caches
