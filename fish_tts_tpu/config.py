"""Model and engine configuration for fish-tts-tpu.

Frozen dataclasses mirroring the reference checkpoint contract
(/root/reference/fish_tts/models/llama.py:31-123 ``BaseModelArgs``/``DualARModelArgs``
and /root/reference/fish_tts/models/vocoder.py:43-66 ``VocoderModelArgs``), re-designed
for a JAX/XLA build: everything is hashable + static so configs can be closed over by
``jax.jit`` without retracing, and engine-level knobs (length bucketing, sampling top-k
truncation, mesh axes) that have no reference equivalent live in ``EngineConfig``.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass
from pathlib import Path


def find_multiple(n: int, k: int) -> int:
    """Round ``n`` up to the nearest multiple of ``k``."""
    if n % k == 0:
        return n
    return n + k - (n % k)


@dataclass(frozen=True)
class DualARConfig:
    """Configuration of the DualAR text-to-semantic transformer.

    Field semantics follow the reference checkpoint ``config.json`` contract
    (reference llama.py:31-123): ``fast_*`` fields default to their slow
    counterparts, ``intermediate_size`` defaults to the SwiGLU 2/3*4d rule
    rounded to a multiple of 256, and ``n_local_heads`` (GQA KV heads)
    defaults to ``n_head``.
    """

    model_type: str = "dual_ar"
    vocab_size: int = 32000
    n_layer: int = 32
    n_head: int = 32
    dim: int = 4096
    intermediate_size: int | None = None
    n_local_heads: int = -1
    head_dim: int = 64
    rope_base: float = 10000.0
    norm_eps: float = 1e-5
    max_seq_len: int = 2048
    dropout: float = 0.0
    tie_word_embeddings: bool = True
    attention_qkv_bias: bool = False
    attention_o_bias: bool = False
    attention_qk_norm: bool = False

    # Codebook configs
    codebook_size: int = 160
    num_codebooks: int = 4
    scale_codebook_embeddings: bool = False

    # Fast (codebook) transformer overrides
    n_fast_layer: int = 4
    fast_dim: int | None = None
    fast_n_head: int | None = None
    fast_n_local_heads: int | None = None
    fast_head_dim: int | None = None
    fast_intermediate_size: int | None = None
    fast_attention_qkv_bias: bool | None = None
    fast_attention_qk_norm: bool | None = None
    fast_attention_o_bias: bool | None = None

    # The residual codebooks decode over the first ``residual_codebook_size``
    # logits of the fast head (reference inference.py:134 slices logits[..., :1024]).
    residual_codebook_size: int = 1024

    def __post_init__(self):
        # frozen dataclass: use object.__setattr__ for derived defaults.
        if self.n_local_heads == -1:
            object.__setattr__(self, "n_local_heads", self.n_head)
        if self.intermediate_size is None:
            hidden = int(2 * (4 * self.dim) / 3)
            object.__setattr__(self, "intermediate_size", find_multiple(hidden, 256))
        if self.head_dim is None:
            object.__setattr__(self, "head_dim", self.dim // self.n_head)
        for name, fallback in (
            ("fast_dim", self.dim),
            ("fast_n_head", self.n_head),
            ("fast_n_local_heads", self.n_local_heads),
            ("fast_head_dim", self.head_dim),
            ("fast_intermediate_size", self.intermediate_size),
            ("fast_attention_qkv_bias", self.attention_qkv_bias),
            ("fast_attention_qk_norm", self.attention_qk_norm),
            ("fast_attention_o_bias", self.attention_o_bias),
        ):
            if getattr(self, name) is None:
                object.__setattr__(self, name, fallback)

    @property
    def fast_config(self) -> "DualARConfig":
        """A view of this config with the fast-transformer dims in the slow slots."""
        return dataclasses.replace(
            self,
            dim=self.fast_dim,
            n_head=self.fast_n_head,
            n_local_heads=self.fast_n_local_heads,
            head_dim=self.fast_head_dim,
            intermediate_size=self.fast_intermediate_size,
            attention_qkv_bias=self.fast_attention_qkv_bias,
            attention_qk_norm=self.fast_attention_qk_norm,
            attention_o_bias=self.fast_attention_o_bias,
        )

    @staticmethod
    def from_json(path: str | Path) -> "DualARConfig":
        """Load from a checkpoint directory or config.json (reference llama.py:74-86)."""
        path = Path(path)
        if path.is_dir():
            path = path / "config.json"
        with open(path, "r", encoding="utf-8") as f:
            data = json.load(f)
        if data.get("model_type") != "dual_ar":
            raise ValueError(f"Unknown model type: {data.get('model_type')}")
        known = {f.name for f in dataclasses.fields(DualARConfig)}
        return DualARConfig(**{k: v for k, v in data.items() if k in known})


@dataclass(frozen=True)
class VocoderTransformerConfig:
    """Config for the vocoder-internal transformers (reference vocoder.py:43-66).

    ``pos_embed_type``: ``"rope"`` (default, the shipped wiring) or
    ``"conformer"``.  Reference quirk, replicated exactly: the conformer
    variant allocates learned ``rel_pos_embeddings`` of shape
    ``(2*max_relative_position+1, head_dim)`` (vocoder.py:174-180) but its
    forward never reads them (vocoder.py:183-217 applies rotary only under
    ``"rope"`` and otherwise runs position-free attention) — so
    ``"conformer"`` means NoPE attention plus a dead parameter that still
    loads from checkpoints.
    """

    block_size: int = 2048
    n_layer: int = 8
    n_head: int = 8
    dim: int = 512
    intermediate_size: int = 1536
    n_local_heads: int = -1
    head_dim: int = 64
    rope_base: float = 10000.0
    norm_eps: float = 1e-5
    channels_first: bool = True
    pos_embed_type: str = "rope"  # "rope" | "conformer" (vocoder.py:57)
    max_relative_position: int = 128  # conformer table half-width (vocoder.py:58)

    def __post_init__(self):
        if self.n_local_heads == -1:
            object.__setattr__(self, "n_local_heads", self.n_head)


@dataclass(frozen=True)
class VocoderConfig:
    """Config of the DAC-style codec (wiring per reference synthesizer.py:199-269).

    All convs are causal (reference DAC is constructed with causal=True,
    synthesizer.py:259).  The decoder-side per-stage transformers declared by
    ``decoder_transformer_layers`` are intentionally ignored, replicating the
    reference quirk where ``DecoderBlock`` drops ``n_t_layer`` (vocoder.py:578-599)
    so those checkpoint weights never load.
    """

    sample_rate: int = 44100
    encoder_dim: int = 64
    encoder_rates: tuple[int, ...] = (2, 4, 8, 8)
    decoder_dim: int = 1536
    decoder_rates: tuple[int, ...] = (8, 8, 4, 2)
    latent_dim: int | None = None
    encoder_transformer_layers: tuple[int, ...] = (0, 0, 0, 4)
    decoder_transformer_layers: tuple[int, ...] = (4, 0, 0, 0)  # dropped (quirk)

    # Quantizer (DownsampleResidualVectorQuantize, synthesizer.py:232-242)
    quantizer_input_dim: int = 1024
    n_residual_codebooks: int = 9
    residual_codebook_size: int = 1024
    semantic_codebook_size: int = 4096
    codebook_dim: int = 8
    downsample_factor: tuple[int, ...] = (2, 2)

    # Pre/post WindowLimitedTransformer around the quantizer
    # (window 128, dim 1024, 8 layers, 16 heads — synthesizer.py:215-230)
    quantizer_transformer: VocoderTransformerConfig = VocoderTransformerConfig(
        block_size=4096, n_layer=8, n_head=16, dim=1024, intermediate_size=3072
    )
    quantizer_window: int = 128
    # Encoder last-stage WLT (window 512, dim scales with stage — vocoder.py:513-524)
    encoder_window: int = 512

    def __post_init__(self):
        if self.latent_dim is None:
            object.__setattr__(
                self, "latent_dim", self.encoder_dim * (2 ** len(self.encoder_rates))
            )

    @property
    def hop_length(self) -> int:
        h = 1
        for r in self.encoder_rates:
            h *= r
        return h

    @property
    def downsample(self) -> int:
        d = 1
        for f in self.downsample_factor:
            d *= f
        return d

    @property
    def frame_length(self) -> int:
        """Audio samples per semantic token (reference vocoder.py:871-872)."""
        return self.hop_length * self.downsample

    @property
    def num_codebooks(self) -> int:
        """Total code rows the vocoder consumes (1 semantic + residual)."""
        return 1 + self.n_residual_codebooks

    def to_json(self, path: str | Path) -> None:
        """Persist alongside ``vocoder.safetensors`` so non-default codec
        wiring round-trips through the native checkpoint format (the
        reference hard-codes its wiring in code, synthesizer.py:199-269)."""
        with open(path, "w", encoding="utf-8") as f:
            json.dump(dataclasses.asdict(self), f, indent=2)

    @staticmethod
    def from_json(path: str | Path) -> "VocoderConfig":
        """Load from a checkpoint directory or ``vocoder_config.json``."""
        path = Path(path)
        if path.is_dir():
            path = path / "vocoder_config.json"
        with open(path, "r", encoding="utf-8") as f:
            data = json.load(f)
        t = data.pop("quantizer_transformer", None)
        known = {f.name for f in dataclasses.fields(VocoderConfig)}
        kw = {
            k: tuple(v) if isinstance(v, list) else v
            for k, v in data.items() if k in known
        }
        if t is not None:
            known_t = {
                f.name for f in dataclasses.fields(VocoderTransformerConfig)
            }
            kw["quantizer_transformer"] = VocoderTransformerConfig(
                **{k: v for k, v in t.items() if k in known_t}
            )
        return VocoderConfig(**kw)


@dataclass(frozen=True)
class EngineConfig:
    """TPU generation-engine knobs (no reference equivalent; green-field).

    - ``prompt_buckets``: prompt lengths are right-padded to the smallest bucket
      to keep XLA compilation counts low (reference recompiles per shape via
      Inductor; we pre-bucket instead).
    - ``decode_chunk``: frames decoded per jitted device call.  The host checks
      the EOS flag once per chunk instead of once per token (the reference syncs
      every step, inference.py:210).
    - ``sample_top_k``: slow-token nucleus selection strategy.  -1 (default)
      is the sort-free threshold path: *exact* full-vocab top-p (bisection
      for the nucleus boundary, engine/sampling.top_p_threshold_mask) at a
      fraction of the cost of sorting 155k logits.  0 is the exact full
      sort; k > 0 truncates the candidate set to the top-k logits (exact
      cumulative probabilities, nucleus members beyond rank k unreachable).
    - ``approx_top_k``: route the candidate search through
      ``lax.approx_max_k`` (recall_target=0.99) instead of exact
      ``lax.top_k``.  Off by default: the approximation can drop nucleus
      candidates, so it is opt-in for serving setups that have validated the
      quality trade (tests/test_sampling.py covers the recall behavior).
    """

    prompt_buckets: tuple[int, ...] = (64, 128, 256, 512, 1024, 2048)
    decode_chunk: int = 20
    first_chunk: int = 10
    # Frames per device call for NON-streaming single-stream generation.
    # Streaming is latency-driven (decode_chunk keeps vocoder inputs small);
    # batch-mode synthesize only needs the codes at the end, so large chunks
    # cut the number of device->host fetches (each pays a dispatch round
    # trip, ~30 ms over a tunneled device — the dominant e2e-RTF cost at 20
    # frames/fetch).  Post-EOS scan steps inside a large chunk are skipped
    # on device (decode_chunk early_exit).
    batch_chunk: int = 100
    sample_top_k: int = -1
    approx_top_k: bool = False
    # Static upper bound granularity on the live KV prefix: attention reads
    # stream only ceil(pos/step)*step cache rows instead of max_seq_len.
    # Each distinct bucket is one extra XLA variant per chunk size; a long
    # generation compiles each bucket once as it crosses the boundary
    # (~13 s on v5e for the Pallas decode step) and the persistent XLA
    # cache makes that a once-per-machine cost.
    # 256 (down from 512): serving-shaped requests (~250 live tokens) read
    # only the rows they have — measured +14.6% on the B=16 decode chunk
    # (6.56 -> 5.60 ms/frame, 2440 -> 2855 aggregate tok/s, v5e, pos=130,
    # same session; scripts/ab_kvbucket.py).  Buckets stay multiples of
    # the slow-stack kernel's cache-block sizes at every batch (256 = the
    # B=16 RB), so no bucket falls off the kernel path.
    kv_bucket_step: int = 256
    # Fused Pallas fast-codebook decoder (ops/fast_decoder.py): used on TPU
    # for single-stream decode with int8 params; ignored otherwise.
    fast_kernel: bool = True
    # Repetition-penalty window (reference hard-codes 16, inference.py:187);
    # sizes the circular frame buffer in the decode state.
    rep_penalty_window: int = 16
    # Parallelism: tp shards the LM weights/heads over the mesh minor axis,
    # dp shards the batch of generate_batch streams.  tp_size * dp_size
    # devices are used; both 1 = single-device (no mesh built at all).
    tp_size: int = 1
    dp_size: int = 1


# Assumed shapes of the fishaudio/openaudio-s1-mini checkpoint this framework
# targets (reference downloads it from HF at synthesizer.py:145-157; constants
# cross-checked against the reference test lineage, tests/test_config.py:27-32:
# dim 1024 / n_layer 28 / num_codebooks 10 / codebook_size 4096 / vocab 155776).
# When real weights are present, config.json overrides all of this.
S1_MINI_CONFIG = DualARConfig(
    vocab_size=155776,
    n_layer=28,
    n_head=16,
    n_local_heads=8,
    dim=1024,
    head_dim=64,
    intermediate_size=4096,
    max_seq_len=4096,
    num_codebooks=10,
    codebook_size=4096,
    n_fast_layer=4,
    fast_dim=1024,
    tie_word_embeddings=True,
)

# Tiny config for hermetic CPU tests.
TINY_CONFIG = DualARConfig(
    vocab_size=512,
    n_layer=2,
    n_head=4,
    n_local_heads=2,
    dim=64,
    head_dim=16,
    intermediate_size=128,
    max_seq_len=128,
    num_codebooks=4,
    codebook_size=48,
    residual_codebook_size=24,
    n_fast_layer=2,
    fast_dim=64,
)

TINY_VOCODER_CONFIG = VocoderConfig(
    encoder_dim=4,
    encoder_rates=(2, 4, 8, 8),
    decoder_dim=64,
    decoder_rates=(8, 8, 4, 2),
    encoder_transformer_layers=(0, 0, 0, 1),
    quantizer_input_dim=64,
    n_residual_codebooks=3,
    residual_codebook_size=24,
    semantic_codebook_size=48,
    codebook_dim=4,
    quantizer_transformer=VocoderTransformerConfig(
        block_size=256, n_layer=1, n_head=2, dim=64, intermediate_size=128, head_dim=32
    ),
)
