"""Object-style compatibility surface over the functional model core.

The reference exposes classes from ``fish_tts.models``
(/root/reference/fish_tts/models/__init__.py:19-34): ``DualARTransformer``,
``DAC``, ``DownsampleResidualVectorQuantize``, ``WindowLimitedTransformer``,
plus ``init_model``/``generate_long``.  Our core is functional (pytrees +
pure functions — the jit/shard-friendly design), so these classes are thin
stateful handles that bundle ``(config, params)`` and delegate to the
functional implementations.  Code written against the reference's
``from fish_tts.models import ...`` surface ports by changing the package
name; code written natively against fish_tts_tpu should keep using the
functional modules directly.
"""

from __future__ import annotations

from pathlib import Path
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from fish_tts_tpu.config import (
    DualARConfig,
    VocoderConfig,
    VocoderTransformerConfig,
)

Params = dict


class DualARTransformer:
    """Stateful handle over the functional DualAR LM
    (reference ``DualARTransformer``, llama.py:503-591).

    Bundles ``(config, params, tokenizer)``; forward methods delegate to
    :mod:`fish_tts_tpu.models.dual_ar`.  For production decoding use
    :class:`fish_tts_tpu.engine.generate.GenerationEngine`, which owns the
    jitted prefill/decode programs.
    """

    def __init__(self, config: DualARConfig, params: Params, tokenizer=None):
        self.config = config
        self.params = params
        self.tokenizer = tokenizer
        from fish_tts_tpu.models import dual_ar

        self._m = dual_ar
        self.rope = dual_ar.make_rope_tables(config)

    @classmethod
    def from_pretrained(cls, path: str | Path) -> "DualARTransformer":
        """Load config + tokenizer + LM weights from a checkpoint dir
        (reference llama.py:466-500; accepts our safetensors or the
        reference's model.pth)."""
        from fish_tts_tpu.models.tokenizer import FishTokenizer
        from fish_tts_tpu.utils import checkpoint as ckpt

        d = Path(path)
        cfg = DualARConfig.from_json(d)
        tokenizer = FishTokenizer.from_pretrained(d)
        if (d / "lm.safetensors").exists():
            params = ckpt.load_params(d / "lm.safetensors")
        elif (d / "model.pth").exists():
            params = ckpt.convert_lm_state_dict(
                ckpt.load_torch_pickle(d / "model.pth"), cfg
            )
        else:
            raise FileNotFoundError(f"No LM weights in {d}")
        return cls(cfg, params, tokenizer)

    def token_ids(self):
        from fish_tts_tpu.models.dual_ar import TokenIds

        tk = self.tokenizer
        if tk is None:
            raise ValueError("No tokenizer attached")
        return TokenIds(
            semantic_begin=tk.semantic_begin_id,
            semantic_end=tk.semantic_end_id,
            im_end=tk.im_end_id,
        )

    def embed(self, inp: jnp.ndarray) -> jnp.ndarray:
        """Token + codebook embedding (reference llama.py:409-429)."""
        return self._m.embed_inputs(self.params, self.config, self.token_ids(), inp)

    def forward_generate(
        self, inp: jnp.ndarray, positions: jnp.ndarray, kv_cache, cache_bias,
        block_bias, read_len=None,
    ):
        """Slow forward writing the KV cache (reference llama.py:400-453).
        Returns (hidden, new_kv_cache); take logits via :meth:`lm_logits`."""
        return self._m.slow_forward(
            self.params, self.config, self.token_ids(), self.rope, inp,
            positions, kv_cache, cache_bias, block_bias, read_len=read_len,
        )

    def forward_generate_fast(self, x: jnp.ndarray, pos, fast_cache):
        """One fast-transformer step (reference llama.py:561-580).

        ``x`` is the SLOW hidden (dim-width): the ``fast_project_in``
        bridge for fast_dim != dim checkpoints is applied here — the
        reference applies it inside ``forward_generate`` (llama.py:584-591),
        but this surface keeps :meth:`forward_generate`'s hidden raw so
        :meth:`lm_logits` (tied head at dim) can consume it directly."""
        x = self._m.project_fast_in(self.params, x)
        return self._m.fast_step(
            self.params, self.config, self.rope, x, pos, fast_cache
        )

    def lm_logits(self, hidden: jnp.ndarray) -> jnp.ndarray:
        return self._m.lm_logits(self.params, self.config, hidden)

    def setup_caches(self, batch: int, max_seq_len: int | None = None):
        """Allocate a fresh KV cache (reference setup_caches, llama.py:544-559
        — functional here: the cache is returned, not stored)."""
        dtype = self.params["norm"].dtype
        return self._m.init_kv_cache(self.config, batch, max_seq_len, dtype)


class WindowLimitedTransformer:
    """Sliding-window causal transformer on channels-first input
    (reference vocoder.py:296-354)."""

    def __init__(self, config: VocoderTransformerConfig, params: Params,
                 window: int):
        self.config = config
        self.params = params
        self.window = window

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from fish_tts_tpu.models.vocoder import _wlt_forward

        return _wlt_forward(self.params, self.config, self.window, x)


class DownsampleResidualVectorQuantize:
    """Grouped semantic+residual RVQ with conv down/upsampling
    (reference vocoder.py:683-814)."""

    def __init__(self, config: VocoderConfig, params: Params):
        self.config = config
        self.params = params  # the "quantizer" sub-tree

    def encode(self, z: jnp.ndarray) -> jnp.ndarray:
        """latent (B, C, T) -> codes (B, 1+R, T/downsample)."""
        from fish_tts_tpu.models.vocoder import quantizer_encode

        return quantizer_encode(self.params, self.config, z)

    def decode(self, indices: jnp.ndarray) -> jnp.ndarray:
        """codes (B, 1+R, T') -> latent (B, C, T'*downsample)
        (reference decode clamps out-of-range codes, vocoder.py:800-807)."""
        from fish_tts_tpu.models.vocoder import quantizer_decode

        return quantizer_decode(self.params, self.config, indices)

    # reference name (from_codes on the inner RVQs feeds decode)
    from_codes = decode


class DAC:
    """Top-level codec handle (reference ``DAC``, vocoder.py:824-928):
    44.1 kHz audio <-> (1+9, N) code matrices at 2048 samples/frame."""

    def __init__(self, config: VocoderConfig | None = None,
                 params: Params | None = None):
        self.config = config or VocoderConfig()
        self.params = params
        # always set, so a params-less handle fails with a clear error on
        # use rather than an AttributeError on access
        self.quantizer = (
            DownsampleResidualVectorQuantize(self.config, params["quantizer"])
            if params is not None else None
        )

    @classmethod
    def from_pretrained(cls, path: str | Path,
                        config: VocoderConfig | None = None) -> "DAC":
        """Load codec weights (our vocoder.safetensors or the reference's
        codec.pth with the ``generator.`` prefix strip,
        reference synthesizer.py:272-284)."""
        from fish_tts_tpu.utils import checkpoint as ckpt

        cfg = config or VocoderConfig()
        d = Path(path)
        f = d / "vocoder.safetensors" if d.is_dir() else d
        if f.suffix == ".safetensors" and f.exists():
            params = ckpt.load_params(f)
        else:
            f = d / "codec.pth" if d.is_dir() else d
            params = ckpt.convert_vocoder_state_dict(
                ckpt.load_torch_pickle(f), cfg
            )
        return cls(cfg, params)

    @property
    def sample_rate(self) -> int:
        return self.config.sample_rate

    @property
    def frame_length(self) -> int:
        return self.config.frame_length

    def encode(self, audio: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """audio (B, 1, T) -> (codes (B, 1+R, N), feature_lengths (B,))
        with N = ceil(T / frame_length) (reference vocoder.py:885-904)."""
        from fish_tts_tpu.models.vocoder import dac_encode

        T = audio.shape[-1]
        n = -(-T // self.config.frame_length)
        codes = dac_encode(self.params, self.config, audio)
        lengths = jnp.full((audio.shape[0],), n, jnp.int32)
        return codes, lengths

    def decode(self, indices: jnp.ndarray,
               feature_lengths=None) -> tuple[jnp.ndarray, jnp.ndarray]:
        """codes (B, 1+R, N) -> (audio (B, 1, N*frame_length),
        audio_lengths (B,)) (reference vocoder.py:906-912)."""
        from fish_tts_tpu.models.vocoder import dac_decode

        audio = dac_decode(self.params, self.config, indices)
        if feature_lengths is None:
            feature_lengths = jnp.full(
                (indices.shape[0],), indices.shape[-1], jnp.int32
            )
        return audio, feature_lengths * self.config.frame_length


def init_model(
    checkpoint_path: str | Path,
    device: str = "tpu",
    precision: str = "bf16",
    compile: bool = True,  # noqa: A002 - reference signature (inference.py:387)
):
    """Build a ready-to-decode engine from a checkpoint dir (reference
    ``init_model``, inference.py:387-414).  Returns ``(engine, decode_fn)``
    where ``decode_fn`` is the engine's generate_long bound method — the
    analog of the reference's compiled ``decode_one_token`` (the jitted
    programs live inside the engine; ``compile=False`` has no meaning under
    XLA and is accepted for signature parity)."""
    from fish_tts_tpu.engine.generate import GenerationEngine
    from fish_tts_tpu.models.dual_ar import cast_params
    from fish_tts_tpu.utils.quantize import quantize_lm_params

    model = DualARTransformer.from_pretrained(checkpoint_path)
    params = model.params
    if precision in ("bf16", "int8"):
        params = cast_params(params, jnp.bfloat16)
    elif precision == "fp16":
        params = cast_params(params, jnp.float16)
    elif precision == "fp32":
        params = cast_params(params, jnp.float32)
    else:
        raise ValueError(
            f"Unknown precision {precision!r}; "
            "expected one of bf16, int8, fp16, fp32"
        )
    if precision == "int8":
        params = quantize_lm_params(params)
    engine = GenerationEngine(params, model.config, model.tokenizer)
    return engine, engine.generate_long


def generate_long(
    *,
    model,
    tokenizer=None,
    text: str,
    num_samples: int = 1,
    max_new_tokens: int = 0,
    top_p: float = 0.8,
    repetition_penalty: float = 1.1,
    temperature: float = 0.8,
    prompt_text: list[str] | str | None = None,
    prompt_tokens: list[np.ndarray] | np.ndarray | None = None,
    streaming: bool = False,
    **_ignored,
) -> Iterator:
    """Module-level ``generate_long`` with the reference's keyword surface
    (inference.py:741-846).  ``model`` is a
    :class:`~fish_tts_tpu.engine.generate.GenerationEngine` (the object
    ``init_model`` returns); ``tokenizer``/``decode_one_token`` kwargs are
    accepted and unused (the engine owns both)."""
    if prompt_text is not None and not isinstance(prompt_text, list):
        prompt_text = [prompt_text]
    if prompt_tokens is not None and not isinstance(prompt_tokens, list):
        prompt_tokens = [prompt_tokens]
    yield from model.generate_long(
        text,
        num_samples=num_samples,
        max_new_tokens=max_new_tokens,
        top_p=top_p,
        repetition_penalty=repetition_penalty,
        temperature=temperature,
        prompt_text=prompt_text,
        prompt_tokens=prompt_tokens,
        streaming=streaming,
    )
