"""Checkpoint conversion and native storage.

One-time converters from the reference's torch pickles to our pytrees:

- ``convert_lm_state_dict``: ``model.pth`` -> DualAR params, replicating the
  reference load transforms (/root/reference/fish_tts/models/llama.py:477-498):
  optional ``state_dict`` unwrap, ``model.`` prefix strip, ``audio_*`` key
  drop, legacy ``wq/wk/wv -> wqkv`` fusion (llama.py:222-227), non-strict.
- ``convert_vocoder_state_dict``: ``codec.pth`` -> codec params, replicating
  the ``generator.`` prefix strip (synthesizer.py:277-284) and folding torch
  weight-norm parametrizations (both the legacy ``weight_g/weight_v`` naming
  and the new ``parametrizations.weight.original0/1``) into plain kernels.
- ``save_params``/``load_params``: native storage as safetensors with
  ``/``-joined pytree paths — no torch needed at inference time.

Torch linear weights are ``(out, in)``; ours are ``(in, out)`` so matmuls hit
the MXU without transposes — every linear is transposed here, convs keep
torch layout ``(O, I, K)`` / ``(I, O, K)``.
"""

from __future__ import annotations

import fnmatch
import logging
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Callable, Mapping

import numpy as np

from fish_tts_tpu.config import DualARConfig, VocoderConfig

logger = logging.getLogger(__name__)

Params = dict[str, Any]

# Checkpoint keys the conversion intentionally never consumes.  The reference
# loads with strict=False and silently drops these; we drop them *loudly*:
# anything unconsumed that does NOT match a pattern here is reported (see
# ``CoverageReport``), so a typo'd key path cannot slip through as a
# silently-unloaded weight.
#
# LM: multimodal ``audio_*`` projections the reference strips explicitly
# (llama.py:494-496), plus derived buffers (RoPE tables, causal mask, KV
# caches — persistent=False in the reference, but tolerated in case a
# checkpoint was saved with them).
LM_EXPECTED_DROPS: tuple[str, ...] = (
    "audio_*",
    "*freqs_cis",
    "*causal_mask",
    "*.k_cache",
    "*.v_cache",
)
# Vocoder: the per-stage decoder transformers declared by
# ``decoder_transformer_layers`` — the reference's DecoderBlock accepts
# ``n_t_layer`` but never builds them (vocoder.py:578-599), so their
# checkpoint weights never load.  Matched by content since the upstream
# module layout that produced them is not observable from the reference.
VOCODER_EXPECTED_DROPS: tuple[str, ...] = (
    "decoder.*attention*",
    "decoder.*feed_forward*",
    "decoder.*norm*",
    "decoder.*layer_scale*",
    "decoder.*input_proj*",
    "decoder.*output_proj*",
    # Persistent derived buffers of the reference Transformer (RoPE table and
    # causal mask, vocoder.py:253-293) — recomputed from config here, never
    # loaded as weights.
    "*.freqs_cis",
    "*.causal_mask",
)


@dataclass(frozen=True)
class CoverageReport:
    """Key-coverage audit of one state-dict conversion.

    ``unconsumed`` keys are present in the checkpoint, not read by the
    converter, and not matched by the expected-drop whitelist — each one is a
    weight that silently failed to reach the model and deserves a look.
    """

    total: int
    consumed: int
    expected_dropped: tuple[str, ...]
    unconsumed: tuple[str, ...]

    @property
    def ok(self) -> bool:
        return not self.unconsumed

    def summary(self) -> str:
        lines = [
            f"{self.consumed}/{self.total} checkpoint keys consumed, "
            f"{len(self.expected_dropped)} expected drops, "
            f"{len(self.unconsumed)} UNCONSUMED"
        ]
        for k in self.expected_dropped:
            lines.append(f"  dropped (expected): {k}")
        for k in self.unconsumed:
            lines.append(f"  UNCONSUMED: {k}")
        return "\n".join(lines)


# ---------------------------------------------------------------------------
# Generic helpers
# ---------------------------------------------------------------------------


def _to_np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach()
        if t.dtype.__str__() == "torch.bfloat16":
            t = t.float()
        return t.cpu().numpy()
    return np.asarray(t)


def _fold_wn_np(v: np.ndarray, g: np.ndarray) -> np.ndarray:
    norm = np.sqrt((v.astype(np.float64) ** 2).sum(axis=tuple(range(1, v.ndim)), keepdims=True))
    return (g.astype(np.float64) * v / norm).astype(np.float32)


class _SD:
    """State-dict view with weight-norm-aware conv/linear accessors.

    Every read is recorded in ``used`` so :meth:`coverage` can report which
    checkpoint keys the conversion never touched; a read of a *missing* key
    raises immediately with the closest existing keys named.
    """

    def __init__(self, sd: Mapping[str, Any]):
        self.sd = {k: v for k, v in sd.items()}
        self.used: set[str] = set()

    def has(self, key: str) -> bool:
        return key in self.sd

    def get(self, key: str) -> np.ndarray:
        if key not in self.sd:
            import difflib

            close = difflib.get_close_matches(key, self.sd.keys(), n=3, cutoff=0.5)
            hint = f"; closest present keys: {close}" if close else ""
            raise KeyError(
                f"checkpoint key {key!r} not found (expected by the "
                f"converter){hint}"
            )
        self.used.add(key)
        return _to_np(self.sd[key])

    def coverage(self, expected_drops: tuple[str, ...]) -> CoverageReport:
        """Audit consumed vs present keys (see module docstring)."""
        leftover = sorted(set(self.sd) - self.used)
        dropped = tuple(
            k for k in leftover
            if any(fnmatch.fnmatch(k, p) for p in expected_drops)
        )
        unconsumed = tuple(k for k in leftover if k not in set(dropped))
        return CoverageReport(
            total=len(self.sd),
            consumed=len(self.used),
            expected_dropped=dropped,
            unconsumed=unconsumed,
        )

    def conv(self, prefix: str) -> dict[str, np.ndarray]:
        """Conv kernel+bias at ``prefix`` with weight norm folded."""
        for gk, vk in (
            (f"{prefix}.parametrizations.weight.original0", f"{prefix}.parametrizations.weight.original1"),
            (f"{prefix}.weight_g", f"{prefix}.weight_v"),
        ):
            if self.has(gk):
                w = _fold_wn_np(self.get(vk), self.get(gk))
                break
        else:
            w = self.get(f"{prefix}.weight")
        out = {"w": w}
        if self.has(f"{prefix}.bias"):
            out["b"] = self.get(f"{prefix}.bias")
        return out

    def linear(self, prefix: str, bias: bool | None = None) -> dict[str, np.ndarray]:
        """Linear at ``prefix``, transposed to (in, out)."""
        out = {"w": np.ascontiguousarray(self.get(f"{prefix}.weight").T)}
        if bias is None:
            bias = self.has(f"{prefix}.bias")
        if bias:
            out["b"] = self.get(f"{prefix}.bias")
        return out

    def weight_t(self, key: str) -> np.ndarray:
        return np.ascontiguousarray(self.get(key).T)


# ---------------------------------------------------------------------------
# LM conversion
# ---------------------------------------------------------------------------


def _normalize_lm_keys(raw: Mapping[str, Any]) -> dict[str, Any]:
    """Reference-equivalent key cleanup (llama.py:484-496).

    The reference also drops ``audio_*`` keys here; we keep them so the
    coverage audit can report them as *expected* drops instead of making
    them invisible.
    """
    sd = dict(raw)
    if "state_dict" in sd:
        sd = dict(sd["state_dict"])
    # Conscious fix of a reference quirk: the reference keys the strip off
    # the FIRST dict entry and replaces "model." anywhere in the key
    # (llama.py:487-491) — one stray metadata entry ordered first disables
    # the strip, and a mid-path "model." gets corrupted.  Anchored per-key
    # stripping behaves identically on real checkpoints.
    if any(k.startswith("model.") for k in sd):
        sd = {
            (k[len("model."):] if k.startswith("model.") else k): v
            for k, v in sd.items()
        }
    return sd


def _fuse_wqkv(sd: dict[str, Any]) -> dict[str, Any]:
    """Legacy checkpoints store wq/wk/wv separately (llama.py:222-227)."""
    import numpy as _np

    out = dict(sd)
    prefixes = {
        k[: -len("wq.weight")] for k in sd if k.endswith("wq.weight")
    }
    for p in prefixes:
        wq, wk, wv = (_to_np(out.pop(p + f"w{n}.weight")) for n in "qkv")
        out[p + "wqkv.weight"] = _np.concatenate([wq, wk, wv], axis=0)
    return out


def _stack_layers(
    sd: _SD, n_layers: int, prefix: str, cfg_has_qk_norm: bool, qkv_bias: bool, o_bias: bool
) -> Params:
    """Per-layer torch keys -> stacked (L, ...) arrays for lax.scan."""

    def stacked(fn: Callable[[int], np.ndarray]) -> np.ndarray:
        return np.stack([fn(i) for i in range(n_layers)], axis=0)

    p: Params = {
        "wqkv": stacked(lambda i: sd.weight_t(f"{prefix}.{i}.attention.wqkv.weight")),
        "wo": stacked(lambda i: sd.weight_t(f"{prefix}.{i}.attention.wo.weight")),
        "w1": stacked(lambda i: sd.weight_t(f"{prefix}.{i}.feed_forward.w1.weight")),
        "w3": stacked(lambda i: sd.weight_t(f"{prefix}.{i}.feed_forward.w3.weight")),
        "w2": stacked(lambda i: sd.weight_t(f"{prefix}.{i}.feed_forward.w2.weight")),
        "attention_norm": stacked(lambda i: sd.get(f"{prefix}.{i}.attention_norm.weight")),
        "ffn_norm": stacked(lambda i: sd.get(f"{prefix}.{i}.ffn_norm.weight")),
    }
    if qkv_bias:
        p["wqkv_b"] = stacked(lambda i: sd.get(f"{prefix}.{i}.attention.wqkv.bias"))
    if o_bias:
        p["wo_b"] = stacked(lambda i: sd.get(f"{prefix}.{i}.attention.wo.bias"))
    if cfg_has_qk_norm:
        p["q_norm"] = stacked(lambda i: sd.get(f"{prefix}.{i}.attention.q_norm.weight"))
        p["k_norm"] = stacked(lambda i: sd.get(f"{prefix}.{i}.attention.k_norm.weight"))
    return p


def convert_lm_state_dict(
    raw: Mapping[str, Any],
    cfg: DualARConfig,
    *,
    report_out: list[CoverageReport] | None = None,
) -> Params:
    """torch ``model.pth`` state dict -> DualAR params pytree (numpy leaves).

    Key coverage is audited: a missing expected key raises (with the closest
    present keys named), and keys the conversion never consumed are warned
    about — ``audio_*`` excepted, the reference's own intentional drop
    (llama.py:494-496).  Pass ``report_out`` to also collect the
    :class:`CoverageReport`.
    """
    sd = _SD(_fuse_wqkv(_normalize_lm_keys(raw)))

    params: Params = {
        "embeddings": sd.get("embeddings.weight"),
        "codebook_embeddings": sd.get("codebook_embeddings.weight"),
        "layers": _stack_layers(
            sd, cfg.n_layer, "layers",
            cfg.attention_qk_norm, cfg.attention_qkv_bias, cfg.attention_o_bias,
        ),
        "norm": sd.get("norm.weight"),
        "fast_embeddings": sd.get("fast_embeddings.weight"),
        "fast_layers": _stack_layers(
            sd, cfg.n_fast_layer, "fast_layers",
            cfg.fast_attention_qk_norm, cfg.fast_attention_qkv_bias,
            cfg.fast_attention_o_bias,
        ),
        "fast_norm": sd.get("fast_norm.weight"),
        "fast_output": sd.weight_t("fast_output.weight"),
    }
    if not cfg.tie_word_embeddings:
        params["output"] = sd.weight_t("output.weight")
    if cfg.fast_dim != cfg.dim and sd.has("fast_project_in.weight"):
        params["fast_project_in"] = sd.linear("fast_project_in")
    _audit(sd, LM_EXPECTED_DROPS, "LM", report_out)
    return params


def _audit(
    sd: _SD,
    expected_drops: tuple[str, ...],
    what: str,
    report_out: list[CoverageReport] | None,
) -> None:
    rep = sd.coverage(expected_drops)
    if report_out is not None:
        report_out.append(rep)
    if rep.expected_dropped:
        logger.info(
            "%s conversion dropped %d expected key(s): %s",
            what, len(rep.expected_dropped), ", ".join(rep.expected_dropped),
        )
    if not rep.ok:
        logger.warning(
            "%s conversion left %d checkpoint key(s) UNCONSUMED — these "
            "weights did not reach the model:\n  %s",
            what, len(rep.unconsumed), "\n  ".join(rep.unconsumed),
        )


# ---------------------------------------------------------------------------
# Vocoder conversion
# ---------------------------------------------------------------------------


def _wlt_from_sd(sd: _SD, prefix: str, n_layers: int) -> Params:
    def stacked(fmt: str) -> np.ndarray:
        return np.stack([sd.get(fmt.format(i=i)) for i in range(n_layers)], axis=0)

    def stacked_t(fmt: str) -> np.ndarray:
        return np.stack(
            [np.ascontiguousarray(sd.get(fmt.format(i=i)).T) for i in range(n_layers)],
            axis=0,
        )

    p: Params = {
        "layers": {
            "wqkv": stacked_t(prefix + ".layers.{i}.attention.wqkv.weight"),
            "wo": stacked_t(prefix + ".layers.{i}.attention.wo.weight"),
            "w1": stacked_t(prefix + ".layers.{i}.feed_forward.w1.weight"),
            "w3": stacked_t(prefix + ".layers.{i}.feed_forward.w3.weight"),
            "w2": stacked_t(prefix + ".layers.{i}.feed_forward.w2.weight"),
            "attention_norm": stacked(prefix + ".layers.{i}.attention_norm.weight"),
            "ffn_norm": stacked(prefix + ".layers.{i}.ffn_norm.weight"),
            "attn_scale": stacked(prefix + ".layers.{i}.attention_layer_scale.gamma"),
            "ffn_scale": stacked(prefix + ".layers.{i}.ffn_layer_scale.gamma"),
        },
        "norm": sd.get(f"{prefix}.norm.weight"),
    }
    if sd.has(f"{prefix}.input_proj.weight"):
        p["input_proj"] = sd.linear(f"{prefix}.input_proj")
        p["output_proj"] = sd.linear(f"{prefix}.output_proj")
    if sd.has(prefix + ".layers.0.attention.rel_pos_embeddings"):
        # conformer variant: the table loads (it is a real nn.Parameter in
        # the checkpoint) even though no forward reads it — reference quirk,
        # vocoder.py:174-180 vs 183-217.
        p["layers"]["rel_pos_embeddings"] = stacked(
            prefix + ".layers.{i}.attention.rel_pos_embeddings"
        )
    return p


def _residual_unit_from_sd(sd: _SD, prefix: str) -> Params:
    return {
        "snake1": sd.get(f"{prefix}.block.0.alpha"),
        "conv1": sd.conv(f"{prefix}.block.1.conv")
        if sd.has(f"{prefix}.block.1.conv.bias")
        else sd.conv(f"{prefix}.block.1"),
        "snake2": sd.get(f"{prefix}.block.2.alpha"),
        "conv2": sd.conv(f"{prefix}.block.3.conv")
        if sd.has(f"{prefix}.block.3.conv.bias")
        else sd.conv(f"{prefix}.block.3"),
    }


def _convnext_from_sd(sd: _SD, prefix: str) -> Params:
    return {
        "dwconv": sd.conv(f"{prefix}.dwconv.conv"),
        "norm_w": sd.get(f"{prefix}.norm.weight"),
        "norm_b": sd.get(f"{prefix}.norm.bias"),
        "pw1": sd.linear(f"{prefix}.pwconv1"),
        "pw2": sd.linear(f"{prefix}.pwconv2"),
        "gamma": sd.get(f"{prefix}.gamma"),
    }


def _vq_from_sd(sd: _SD, prefix: str) -> Params:
    return {
        "in_proj": sd.conv(f"{prefix}.in_proj"),
        "out_proj": sd.conv(f"{prefix}.out_proj"),
        "codebook": sd.get(f"{prefix}.codebook.weight"),
    }


def convert_vocoder_state_dict(
    raw: Mapping[str, Any],
    cfg: VocoderConfig,
    *,
    report_out: list[CoverageReport] | None = None,
) -> Params:
    """torch ``codec.pth`` state dict -> codec params pytree (numpy leaves).

    Coverage-audited like :func:`convert_lm_state_dict`; the expected drops
    here are the decoder-side transformer weights the reference silently
    never loads (``DecoderBlock`` ignores ``n_t_layer``, vocoder.py:578-599).
    """
    sd_raw = dict(raw)
    if "state_dict" in sd_raw:
        sd_raw = dict(sd_raw["state_dict"])
    # Conscious fix of a reference quirk: the reference triggers on the bare
    # substring "generator" then filters on "generator." (synthesizer.py:277-282),
    # so a non-prefixed checkpoint containing e.g. "generator_ema" would lose
    # every real key.  Anchored prefix handling is identical on real
    # checkpoints (keys are either all "generator."-prefixed or none are).
    if any(k.startswith("generator.") for k in sd_raw):
        sd_raw = {
            k[len("generator."):]: v
            for k, v in sd_raw.items()
            if k.startswith("generator.")
        }
    sd = _SD(sd_raw)

    # --- encoder: Sequential indices (vocoder.py:542-575):
    #   0 stem conv, 1..N blocks, N+1 Snake, N+2 final conv
    n_stages = len(cfg.encoder_rates)
    enc: Params = {"stem": sd.conv("encoder.block.0.conv"), "blocks": []}
    for b in range(n_stages):
        base = f"encoder.block.{b + 1}.block"
        block: Params = {
            "units": [
                _residual_unit_from_sd(sd, f"{base}.{u}") for u in range(3)
            ],
            "snake": sd.get(f"{base}.3.alpha"),
            "down": sd.conv(f"{base}.4.conv"),
        }
        n_t = cfg.encoder_transformer_layers[b]
        if n_t > 0:
            block["wlt"] = _wlt_from_sd(sd, f"{base}.5", n_t)
        enc["blocks"].append(block)
    enc["final_snake"] = sd.get(f"encoder.block.{n_stages + 1}.alpha")
    enc["final_conv"] = sd.conv(f"encoder.block.{n_stages + 2}.conv")

    # --- quantizer (vocoder.py:683-814)
    tq_layers = cfg.quantizer_transformer.n_layer
    quant: Params = {
        "downsample": [
            {
                "conv": sd.conv(f"quantizer.downsample.{i}.0.conv"),
                "convnext": _convnext_from_sd(sd, f"quantizer.downsample.{i}.1"),
            }
            for i in range(len(cfg.downsample_factor))
        ],
        "pre": _wlt_from_sd(sd, "quantizer.pre_module", tq_layers),
        "post": _wlt_from_sd(sd, "quantizer.post_module", tq_layers),
        "semantic": _vq_from_sd(sd, "quantizer.semantic_quantizer.quantizers.0"),
        "residual": [
            _vq_from_sd(sd, f"quantizer.quantizer.quantizers.{i}")
            for i in range(cfg.n_residual_codebooks)
        ],
        "upsample": [
            {
                "tconv": sd.conv(f"quantizer.upsample.{i}.0.conv"),
                "convnext": _convnext_from_sd(sd, f"quantizer.upsample.{i}.1"),
            }
            for i in range(len(cfg.downsample_factor))
        ],
    }

    # --- decoder: Sequential indices (vocoder.py:605-640):
    #   0 stem, 1..N blocks, N+1 Snake, N+2 conv, N+3 Tanh
    n_dec = len(cfg.decoder_rates)
    dec: Params = {"stem": sd.conv("decoder.model.0.conv"), "blocks": []}
    for b in range(n_dec):
        base = f"decoder.model.{b + 1}.block"
        dec["blocks"].append(
            {
                "snake": sd.get(f"{base}.0.alpha"),
                "up": sd.conv(f"{base}.1.conv"),
                "units": [
                    _residual_unit_from_sd(sd, f"{base}.{u}") for u in range(2, 5)
                ],
            }
        )
    dec["final_snake"] = sd.get(f"decoder.model.{n_dec + 1}.alpha")
    dec["final_conv"] = sd.conv(f"decoder.model.{n_dec + 2}.conv")

    _audit(sd, VOCODER_EXPECTED_DROPS, "Vocoder", report_out)
    return {"encoder": enc, "quantizer": quant, "decoder": dec}


# ---------------------------------------------------------------------------
# Native storage (safetensors, torch-free at load time)
# ---------------------------------------------------------------------------


def flatten_params(params: Params, prefix: str = "") -> dict[str, np.ndarray]:
    flat: dict[str, np.ndarray] = {}
    if isinstance(params, dict):
        for k, v in params.items():
            flat.update(flatten_params(v, f"{prefix}{k}/"))
    elif isinstance(params, (list, tuple)):
        for i, v in enumerate(params):
            flat.update(flatten_params(v, f"{prefix}{i}/"))
    else:
        flat[prefix[:-1]] = np.asarray(params)
    return flat


def unflatten_params(flat: Mapping[str, np.ndarray]) -> Params:
    root: Params = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def save_params(path: str | Path, params: Params, dtype: str = "bf16") -> None:
    """Save a pytree as safetensors.

    ``dtype="bf16"`` stores float32 weight leaves as bfloat16 (via ml_dtypes;
    safetensors has a native BF16 dtype) — half the bytes on disk and through
    the host at load time, matching the precision the reference torch
    checkpoints ship in.  1-D leaves (norm gains, biases) keep float32.
    Pass ``dtype="fp32"`` for a lossless dump.
    """
    from safetensors.numpy import save_file

    if dtype not in ("bf16", "fp32"):
        raise ValueError(f"dtype={dtype!r}: expected 'bf16' or 'fp32'")
    flat = flatten_params(params)
    if dtype == "bf16":
        import ml_dtypes

        flat = {
            k: (v.astype(ml_dtypes.bfloat16)
                if v.dtype == np.float32 and v.ndim > 1 else v)
            for k, v in flat.items()
        }
    save_file({k: np.ascontiguousarray(v) for k, v in flat.items()}, str(path))


def load_params(path: str | Path) -> Params:
    from safetensors.numpy import load_file

    return unflatten_params(load_file(str(path)))


# ---------------------------------------------------------------------------
# Torch pickle loading (conversion time only)
# ---------------------------------------------------------------------------


def load_torch_pickle(path: str | Path) -> Mapping[str, Any]:
    import torch

    return torch.load(str(path), map_location="cpu", mmap=True, weights_only=True)


def convert_checkpoint_dir(
    model_dir: str | Path, out_dir: str | Path, cfg: DualARConfig | None = None,
    lm_dtype: str = "bf16", vocoder_dtype: str = "fp32",
    vocoder_cfg: VocoderConfig | None = None,
) -> dict[str, CoverageReport]:
    """Convert a reference checkpoint dir (config.json + model.pth +
    codec.pth + tokenizer.tiktoken) into our native format.

    Returns the key-coverage reports per converted file (``{"lm": ...,
    "vocoder": ...}``) so callers can surface unconsumed checkpoint keys."""
    import shutil

    model_dir, out_dir = Path(model_dir), Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    if cfg is None:
        cfg = DualARConfig.from_json(model_dir)
    if vocoder_cfg is None:
        vocoder_cfg = VocoderConfig()

    reports: dict[str, CoverageReport] = {}
    out: list[CoverageReport] = []
    lm = convert_lm_state_dict(
        load_torch_pickle(model_dir / "model.pth"), cfg, report_out=out
    )
    reports["lm"] = out[0]
    # model.pth ships bf16, so bf16 storage is a lossless round trip
    save_params(out_dir / "lm.safetensors", lm, dtype=lm_dtype)

    codec_path = model_dir / "codec.pth"
    if codec_path.exists():
        import torch

        try:
            raw = torch.load(str(codec_path), map_location="cpu", weights_only=True)
        except Exception:
            # codec.pth checkpoints in the wild sometimes pickle non-tensor
            # state; fall back to full unpickling only if the safe load fails.
            raw = torch.load(str(codec_path), map_location="cpu", weights_only=False)
        out = []
        voc = convert_vocoder_state_dict(raw, vocoder_cfg, report_out=out)
        reports["vocoder"] = out[0]
        # codec.pth weights are fp32 — keep them lossless by default
        save_params(out_dir / "vocoder.safetensors", voc, dtype=vocoder_dtype)
        # persist the codec wiring so non-default configs round-trip
        vocoder_cfg.to_json(out_dir / "vocoder_config.json")

    for name in ("config.json", "tokenizer.tiktoken", "special_tokens.json"):
        src = model_dir / name
        if src.exists():
            shutil.copy(src, out_dir / name)
    return reports
