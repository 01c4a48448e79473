"""Sharding rules: map the DualAR params/state pytrees onto the (dp, tp) mesh.

GSPMD-style design: we *annotate* every weight and cache array with a
``NamedSharding`` and let XLA's SPMD partitioner insert the collectives.
Layout (standard Megatron-style TP, per the scaling-book recipe):

- attention: ``wqkv`` column-parallel over heads (last dim), ``wo``
  row-parallel (first non-layer dim) — one psum per attention block;
- FFN: ``w1``/``w3`` column-parallel over the hidden dim, ``w2``
  row-parallel — one psum per FFN;
- tied embedding / LM head: vocab-sharded (the top-k sampling reduction runs
  over the sharded vocab axis; XLA lowers it to a per-shard top-k + an
  all-gather of k candidates per shard);
- KV caches: sharded over the KV-head axis (tp) and the batch axis (dp);
- codebook/fast embeddings and norms: replicated (small, gather-heavy).

The fast transformer uses the same rules as the slow one.  ``tp`` must divide
``n_local_heads`` (GQA KV heads) and the FFN hidden dim.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from fish_tts_tpu.config import DualARConfig
from fish_tts_tpu.utils.quantize import is_quantized

Params = dict[str, Any]


def _layer_stack_specs(qk_norm: bool, qkv_bias: bool, o_bias: bool) -> Params:
    """PartitionSpecs for one stacked transformer block-set.
    Leading axis is the layer axis (never sharded)."""
    specs: Params = {
        "wqkv": P(None, None, "tp"),
        "wo": P(None, "tp", None),
        "w1": P(None, None, "tp"),
        "w3": P(None, None, "tp"),
        "w2": P(None, "tp", None),
        "attention_norm": P(None, None),
        "ffn_norm": P(None, None),
    }
    if qkv_bias:
        specs["wqkv_b"] = P(None, "tp")
    if o_bias:
        specs["wo_b"] = P(None, None)
    if qk_norm:
        specs["q_norm"] = P(None, None)
        specs["k_norm"] = P(None, None)
    return specs


def param_specs(cfg: DualARConfig) -> Params:
    """PartitionSpec pytree matching ``dual_ar.init_params`` structure."""
    specs: Params = {
        "embeddings": P("tp", None),  # vocab-sharded tied head
        "codebook_embeddings": P(None, None),
        "layers": _layer_stack_specs(
            cfg.attention_qk_norm, cfg.attention_qkv_bias, cfg.attention_o_bias
        ),
        "norm": P(None),
        "fast_embeddings": P(None, None),
        "fast_layers": _layer_stack_specs(
            cfg.fast_attention_qk_norm,
            cfg.fast_attention_qkv_bias,
            cfg.fast_attention_o_bias,
        ),
        "fast_norm": P(None),
        "fast_output": P(None, "tp"),
    }
    if not cfg.tie_word_embeddings:
        specs["output"] = P(None, "tp")
    if cfg.fast_dim != cfg.dim:
        specs["fast_project_in"] = {"w": P(None, None), "b": P(None)}
    return specs


def state_specs(dp_batch: bool = True) -> Params:
    """PartitionSpecs for the decode-state pytree (engine/decode.py):
    KV cache (L, B, Hkv, S, Dh) sharded over (dp batch, tp KV heads).

    ``dp_batch=False`` replicates the batch axis instead — required when the
    mesh's dp extent does not divide the batch size (e.g. single-stream
    ``generate_long`` on a dp>1 mesh, where the one stream simply does not
    use the dp rows).
    """
    b = "dp" if dp_batch else None
    kv = P(None, b, "tp", None, None)
    return {
        "kv": {"k": kv, "v": kv},
        "frame": P(b, None),
        "pos": P(b),
        "prev": P(b, None, None),
        "step": P(b),  # per-slot (B,) counter, like pos/done
        "done": P(b),
    }


def rope_specs() -> Params:
    return {"slow": P(None, None, None), "fast": P(None, None, None)}


def expand_quant_specs(specs: Params, params: Params) -> Params:
    """Adapt a plain-weight spec tree to the actual (possibly int8) params.

    Weight-only quantization (utils/quantize.py) replaces a weight leaf with
    ``{"q": int8 same-shape, "s": f32 scale}`` where the scale keeps the
    quantized (contraction) axis at size 1.  The int8 tensor inherits the
    plain weight's spec verbatim; the scale inherits it with every size-1
    axis unsharded (a length-1 axis cannot be split over a mesh axis).
    """

    def walk(spec, param):
        if is_quantized(param):
            s = param["s"]
            s_spec = P(*[
                None if s.shape[i] == 1 else (spec[i] if i < len(spec) else None)
                for i in range(s.ndim)
            ])
            return {"q": spec, "s": s_spec}
        if isinstance(param, dict):
            return {k: walk(spec[k] if isinstance(spec, dict) else spec, v)
                    for k, v in param.items()}
        return spec

    return {k: walk(specs[k], v) for k, v in params.items()}


def _put(tree: Params, specs: Params, mesh: Mesh) -> Params:
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs
    )


def _validate_divisible(params: Params, specs: Params, mesh: Mesh) -> None:
    """Every mesh-sharded array dim must be divisible by its axis extent —
    checked up front with the param's name, instead of the raw
    ``device_put`` ValueError deep inside :func:`_put`."""
    from jax import tree_util as jtu

    def check(path, x, spec):
        for i, ax in enumerate(spec):
            if ax is None:
                continue
            if x.shape[i] % mesh.shape[ax]:
                raise ValueError(
                    f"{ax}={mesh.shape[ax]} must divide axis {i} "
                    f"(size {x.shape[i]}) of param {jtu.keystr(path)}"
                )

    jtu.tree_map_with_path(check, params, specs)


def shard_params(params: Params, cfg: DualARConfig, mesh: Mesh) -> Params:
    """Place LM params (bf16 or weight-only int8) on the mesh with TP
    shardings."""
    tp = mesh.shape["tp"]
    # Head-granularity checks first: a fused-QKV dim divisible by tp could
    # still split mid-head, which would be numerically wrong rather than a
    # placement error.  Both transformer stacks are TP-sharded.
    for name, heads, inter in (
        ("", cfg.n_local_heads, cfg.intermediate_size),
        ("fast_", cfg.fast_n_local_heads, cfg.fast_intermediate_size),
    ):
        if heads % tp != 0:
            raise ValueError(
                f"tp={tp} must divide {name}n_local_heads={heads}"
            )
        if inter % tp != 0:
            raise ValueError(
                f"tp={tp} must divide {name}intermediate_size={inter}"
            )
    prepared = [k for k in params if k.startswith("_")]
    if prepared:
        raise ValueError(
            f"params carry fused-kernel layouts {prepared}; the Pallas "
            "kernels are single-device — shard before slow_stack.prepare_head"
        )
    specs = expand_quant_specs(param_specs(cfg), params)
    # catches the remaining sharded dims (vocab-sharded embeddings/heads)
    _validate_divisible(params, specs, mesh)
    return _put(params, specs, mesh)


def shard_state(state: Params, mesh: Mesh, dp_batch: bool | None = None) -> Params:
    """Place the decode state on the mesh.  ``dp_batch=None`` autodetects:
    the batch axis is dp-sharded iff the mesh dp extent divides the batch
    size (each dp row then holds batch/dp streams)."""
    if dp_batch is None:
        dp_batch = state["pos"].shape[0] % mesh.shape["dp"] == 0
    return _put(state, state_specs(dp_batch), mesh)


def shard_rope(rope: Params, mesh: Mesh) -> Params:
    return _put(rope, rope_specs(), mesh)


def replicate(tree: Params, mesh: Mesh) -> Params:
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree
    )
