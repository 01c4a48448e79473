"""fish-tts-tpu synthesizer: the public API layer.

API-compatible with the reference ``FishTTS``
(/root/reference/fish_tts/synthesizer.py): ``get_instance``/``reset_instance``
singleton, ``VoiceProfile`` with bit-compatible ``.npy`` save/load,
``synthesize``/``synthesize_stream``, ``encode_reference``, and the
``set/add/clear/get_references`` prefill cache — with the TPU-native upgrades:

- references set via ``set_references`` are prefilled into a **reusable KV
  prefix** on device; the reference re-encodes and re-prefills the whole
  reference prompt on every call (inference.py:779-795), we do it once.
- ``synthesize_stream`` pipelines LM decode and vocoder decode through JAX
  **async dispatch** instead of the reference's thread + bounded queues
  (synthesizer.py:508-527): the vocoder call for chunk *k* is enqueued on the
  device before the host blocks on chunk *k+1*'s tokens, so the device queue
  stays full without any host threading.
- compilation is bucketized (prompt lengths, chunk sizes, vocoder lengths) so
  warmup compiles a small closed set of programs — the analog of the
  reference's Inductor disk cache bootstrap (synthesizer.py:24-38) is
  ``utils/compile_cache.py``'s persistent XLA cache.
"""

from __future__ import annotations

import logging
import threading
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Iterator, Literal

import numpy as np

logger = logging.getLogger(__name__)

# Singleton instance (reference synthesizer.py:42-44)
_instance: "FishTTS | None" = None
_instance_lock = threading.Lock()

# Vocoder length buckets for chunked/batch decode (frames).
_VOCODER_BUCKETS = (10, 20, 40, 80, 160, 320, 640, 1280, 2048)


def _vocoder_bucket(n: int) -> int:
    """Smallest decode bucket >= n frames.  Beyond the static list the
    buckets keep doubling, so arbitrarily long non-streaming synthesize
    calls compile at most O(log n) vocoder variants instead of one per
    exact length."""
    for b in _VOCODER_BUCKETS:
        if b >= n:
            return b
    b = _VOCODER_BUCKETS[-1]
    while b < n:
        b *= 2
    return b


@dataclass
class VoiceProfile:
    """Voice profile containing encoded reference audio codes.

    Bit-compatible with the reference profile format
    (synthesizer.py:47-65): ``codes`` is ``(num_codebooks, seq_len)`` int64,
    row 0 the semantic codebook; ``.npy`` round-trips unchanged (the shipped
    ``gura_voice.npy`` loads directly).
    """

    codes: np.ndarray
    text: str = ""
    name: str = ""

    def save(self, path: str | Path) -> None:
        np.save(path, self.codes)

    @classmethod
    def load(cls, path: str | Path, text: str = "", name: str = "") -> "VoiceProfile":
        codes = np.load(path)
        if not name:
            name = Path(path).stem
        return cls(codes=codes, text=text, name=name)


class _StreamVocoder:
    """Per-stream stateful vocoder decode (models/vocoder_stream.py).

    Carries the exact conv/attention state across chunks, so each streamed
    chunk decodes only its own ``n`` frames — no context recompute, and the
    concatenated audio equals the jointly-decoded waveform.  One instance
    per audio stream.
    """

    def __init__(self, tts: "FishTTS"):
        if tts._vocoder_params is None:
            raise RuntimeError("Vocoder not loaded")
        self._tts = tts
        # one jitted call: eager init would dispatch ~30 small zeros
        # allocations, each paying a device round trip on tunneled platforms
        # (directly on the TTFA path — a fresh instance per stream)
        self._state = tts._stream_init_fn()(tts._vocoder_params)

    def decode_async(self, codes: np.ndarray):
        """Dispatch one chunk (K, n) without blocking; returns
        (device_audio, n)."""
        import jax.numpy as jnp

        tts = self._tts
        fn = tts._stream_decode_fn()
        self._state, audio = fn(
            tts._vocoder_params, self._state,
            jnp.asarray(codes.astype(np.int32)[None]),
        )
        return audio, codes.shape[-1]


class _PoolStreamBatch:
    """Lockstep pool vocoder for ``synthesize_batch_stream``'s stateful
    mode: every flushing stream's chunk decodes in ONE device program per
    round and the PCM is fetched in one transfer (a per-stream B=1
    dispatch+fetch costs ~42 ms on tunneled platforms, ~8 ms of it
    compute).

    Width invariant (holds because the batched LM generator keeps live
    streams in lockstep — same frames per round, same flush thresholds):
    all non-final flushes in a round share one width, and any narrower
    flush is a stream's FINAL flush (it hit EOS mid-chunk or drained at
    generator end).  Final flushes zero-pad to the round width — the
    decode path is causal so the emitted prefix is exact, and the padded
    state advance is past the stream's end, never read again (asserted).
    """

    def __init__(self, tts: "FishTTS", batch: int):
        if tts._vocoder_params is None:
            raise RuntimeError("Vocoder not loaded")
        self._tts = tts
        self._B = batch
        init, self._dec = tts._pool_vocoder_fns(batch)
        self._state = init(tts._vocoder_params)
        self._finished: set[int] = set()

    def decode_round(self, entries: list[tuple[int, np.ndarray]]):
        """Decode [(stream, (K, m) codes), ...] in one program; returns the
        device int16 PCM (forced by the caller after any further
        dispatches; the transfer is started here so it overlaps them)."""
        import jax.numpy as jnp

        W = max(c.shape[1] for _, c in entries)
        K = entries[0][1].shape[0]
        codes = np.zeros((self._B, K, W), np.int32)
        active = np.zeros((self._B,), bool)
        for b, c in entries:
            assert b not in self._finished, "flush after final (padded) flush"
            if c.shape[1] < W:
                self._finished.add(b)
            codes[b, :, : c.shape[1]] = c
            active[b] = True
        self._state, pcm = self._dec(
            self._tts._vocoder_params, self._state, jnp.asarray(codes),
            jnp.asarray(active), jnp.zeros((self._B,), bool),
        )
        try:
            pcm.copy_to_host_async()
        except Exception:  # noqa: BLE001 — optional fast path only
            pass
        return pcm


class _ContextBuffer:
    """Rolling code history for context-streamed vocoder decode.

    ``take(codes)`` returns ``(decode_input, ctx)``: the chunk with up to
    ``context_frames`` preceding frames prepended (``ctx`` of them), and
    records the chunk as future context.  One instance per stream; shared by
    synthesize_stream and synthesize_batch_stream so the boundary behavior
    cannot diverge.
    """

    def __init__(self, context_frames: int):
        self.context_frames = context_frames
        self._history: list[np.ndarray] = []
        self._n = 0

    def take(self, codes: np.ndarray) -> tuple[np.ndarray, int]:
        ctx = 0
        if self.context_frames > 0 and self._n > 0:
            ctx_codes = np.concatenate(self._history, axis=1)
            ctx_codes = ctx_codes[:, -self.context_frames:]
            ctx = ctx_codes.shape[1]
            codes = np.concatenate([ctx_codes, codes], axis=1)
        self._history.append(codes[:, ctx:])
        self._n += codes.shape[1] - ctx
        # keep only what future context windows can use
        while len(self._history) > 1 and (
            self._n - self._history[0].shape[1] >= self.context_frames
        ):
            self._n -= self._history[0].shape[1]
            self._history.pop(0)
        return codes, ctx


@dataclass
class _PrefillCache:
    """Reference store consulted when ``references=None``
    (reference synthesizer.py:68-74)."""

    prompt_text: list[str] = field(default_factory=list)
    prompt_tokens: list[np.ndarray] = field(default_factory=list)
    profiles: list[VoiceProfile] = field(default_factory=list)


class FishTTS:
    """TTS synthesizer: DualAR transformer + DAC vocoder on TPU.

    Example:
        synth = FishTTS(model_dir="/path/to/openaudio-s1-mini")
        audio = synth.synthesize("Hello world!")

        profile = synth.encode_reference(wav_bytes, "reference text")
        audio = synth.synthesize("Nice to meet you", references=[profile])
    """

    def __init__(
        self,
        model_dir: str | Path | None = None,
        device: Literal["tpu", "cpu", "cuda"] = "tpu",
        precision: Literal["bf16", "fp16", "fp32", "int8"] = "bf16",
        warmup: bool = True,
        *,
        engine_config=None,
        _testing_bundle=None,
    ):
        import jax
        import jax.numpy as jnp

        from fish_tts_tpu.utils.compile_cache import setup_compile_cache

        setup_compile_cache()

        self.device = device
        self._precision = precision
        self._is_warmed_up = False
        self._prefill_cache = _PrefillCache()
        self._prefill_lock = threading.Lock()

        # "int8" = bf16 activations with weight-only int8 LM matmuls
        # (utils/quantize.py) — halves decode HBM traffic on TPU.
        self._int8 = precision == "int8"
        if precision in ("bf16", "int8"):
            self._dtype = jnp.bfloat16
        elif precision == "fp16":
            self._dtype = jnp.float16
        else:
            self._dtype = jnp.float32

        if device == "cpu":
            # jax_platforms only takes effect before the process's first
            # backend initialization; after that the update is a silent
            # no-op and this "cpu" instance would dispatch to the
            # accelerator.  Fail loudly instead of mis-placing compute.
            try:
                from jax._src import xla_bridge

                initialized = xla_bridge.backends_are_initialized()
            except Exception:  # private API moved: fall back to the update
                initialized = False
            if initialized and jax.default_backend() != "cpu":
                raise RuntimeError(
                    "device='cpu' requested but the JAX backend is already "
                    f"initialized on '{jax.default_backend()}'; construct "
                    "the CPU instance first (or in its own process), or "
                    "set JAX_PLATFORMS=cpu before any JAX use."
                )
            jax.config.update("jax_platforms", "cpu")

        if _testing_bundle is not None:
            # Hermetic path: (cfg, params, tokenizer, vocoder_cfg, vocoder_params)
            (self._cfg, params, self._tokenizer,
             self._vocoder_cfg, self._vocoder_params) = _testing_bundle
        else:
            self._model_dir = self._ensure_model(model_dir)
            (self._cfg, params, self._tokenizer,
             self._vocoder_cfg, self._vocoder_params) = self._load_models()

        from fish_tts_tpu.engine.generate import GenerationEngine
        from fish_tts_tpu.models.dual_ar import cast_params

        params = cast_params(params, self._dtype)
        if self._int8:
            from fish_tts_tpu.utils.quantize import quantize_lm_params

            params = quantize_lm_params(params)
        if self._vocoder_params is not None:
            from fish_tts_tpu.models.dual_ar import cast_params as _cp

            self._vocoder_params = _cp(self._vocoder_params, self._dtype)

        self._engine = GenerationEngine(
            params, self._cfg, self._tokenizer, engine_cfg=engine_config
        )
        if self._vocoder_cfg is not None:
            # RTF/audio_s metrics follow the LOADED codec's frame rate, not
            # the default 44100/2048 (frame_length is config-derived)
            self._engine.metrics.audio_tokens_per_sec = (
                self._vocoder_cfg.sample_rate / self._vocoder_cfg.frame_length
            )
        self._vocoder_jit_cache: dict[int, object] = {}
        self._encode_jit = None

        from fish_tts_tpu.utils.profiling import hbm_bytes_in_use

        hbm = hbm_bytes_in_use()
        if hbm:  # TPU analog of the reference VRAM log (synthesizer.py:184-186)
            logger.info("Device memory in use: %.2f GB", hbm / 2**30)

        if warmup:
            self._run_warmup()

    # ------------------------------------------------------------------
    # Loading
    # ------------------------------------------------------------------

    def _ensure_model(self, model_dir: str | Path | None) -> Path:
        """Locate model files (reference synthesizer.py:140-157)."""
        if model_dir is not None:
            return Path(model_dir)
        cache_dir = Path.home() / ".cache" / "fish-tts-tpu" / "models"
        repo_id = "fishaudio/openaudio-s1-mini"
        local = cache_dir / repo_id.replace("/", "--")
        if local.exists():
            return local
        try:
            from huggingface_hub import snapshot_download

            logger.info("Downloading model from %s", repo_id)
            return Path(
                snapshot_download(repo_id=repo_id, local_dir=str(local))
            )
        except Exception as e:  # pragma: no cover - network-dependent
            raise RuntimeError(
                f"Model not found locally and download failed ({e}). "
                f"Pass model_dir= pointing at a checkpoint directory."
            ) from e

    def _load_models(self):
        """Load LM + tokenizer + vocoder from a checkpoint dir.

        Accepts either our native format (lm.safetensors/vocoder.safetensors)
        or the reference torch pickles (model.pth/codec.pth), converting the
        latter on the fly (key transforms per llama.py:477-498 and
        synthesizer.py:272-284).
        """
        from fish_tts_tpu.config import DualARConfig, VocoderConfig
        from fish_tts_tpu.models.tokenizer import FishTokenizer
        from fish_tts_tpu.utils import checkpoint as ckpt

        d = self._model_dir
        t0 = time.perf_counter()
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
        logger.info("Transformer loaded in %.1fs", time.perf_counter() - t0)

        # native format may carry the codec wiring; default otherwise (the
        # reference hard-codes it, synthesizer.py:199-269)
        if (d / "vocoder_config.json").exists():
            vocoder_cfg = VocoderConfig.from_json(d)
        else:
            vocoder_cfg = VocoderConfig()
        vocoder_params = None
        if (d / "vocoder.safetensors").exists():
            vocoder_params = ckpt.load_params(d / "vocoder.safetensors")
        elif (d / "codec.pth").exists():
            import torch

            try:
                raw = torch.load(
                    str(d / "codec.pth"), map_location="cpu", weights_only=True
                )
            except Exception:
                logger.warning(
                    "codec.pth is not loadable with weights_only=True; "
                    "falling back to full unpickling — only do this for "
                    "checkpoints you trust"
                )
                raw = torch.load(
                    str(d / "codec.pth"), map_location="cpu", weights_only=False
                )
            vocoder_params = ckpt.convert_vocoder_state_dict(raw, vocoder_cfg)
        else:
            logger.warning("codec weights not found, vocoder not loaded")

        return cfg, params, tokenizer, vocoder_cfg, vocoder_params

    # ------------------------------------------------------------------
    # Warmup (reference synthesizer.py:295-323)
    # ------------------------------------------------------------------

    def _run_warmup(self) -> None:
        logger.info("Running warmup (first run triggers XLA compilation)...")
        t0 = time.perf_counter()
        try:
            for response in self._engine.generate_long(
                "Hello.", max_new_tokens=50, temperature=0.7, top_p=0.8,
                repetition_penalty=1.1,
            ):
                if response.action == "next":
                    break
            if self._vocoder_params is not None:
                # non-streaming decode buckets a short synthesize hits
                for bucket in _VOCODER_BUCKETS[:2]:
                    dummy = np.zeros(
                        (self._vocoder_cfg.num_codebooks, bucket), np.int64
                    )
                    self._decode_codes(dummy)
                # stateful streaming chunk shapes (first flush 10, then 20)
                sv = _StreamVocoder(self)
                for n in (10, 20):
                    audio, _ = sv.decode_async(
                        np.zeros((self._vocoder_cfg.num_codebooks, n), np.int64)
                    )
                np.asarray(audio)
            self._is_warmed_up = True
            logger.info(
                "Warmup complete in %.1fs (compilation cached)",
                time.perf_counter() - t0,
            )
        except Exception as e:
            logger.warning("Warmup failed: %s", e)

    # ------------------------------------------------------------------
    # Reference management (reference synthesizer.py:363-429)
    # ------------------------------------------------------------------

    def set_references(self, profiles: list[VoiceProfile]) -> None:
        """Set voice profiles; prefills them into a reusable device KV prefix."""
        with self._prefill_lock:
            self._prefill_cache = _PrefillCache(
                prompt_text=[p.text for p in profiles],
                prompt_tokens=[np.asarray(p.codes) for p in profiles],
                profiles=list(profiles),
            )
            self._engine.set_prefix(
                self._prefill_cache.prompt_text, self._prefill_cache.prompt_tokens
            )
            logger.info("Set %d reference(s)", len(profiles))

    def add_reference(self, profile: VoiceProfile) -> None:
        with self._prefill_lock:
            self._prefill_cache.profiles.append(profile)
            self._prefill_cache.prompt_text.append(profile.text)
            self._prefill_cache.prompt_tokens.append(np.asarray(profile.codes))
            self._engine.set_prefix(
                self._prefill_cache.prompt_text, self._prefill_cache.prompt_tokens
            )
            logger.info(
                "Added reference '%s', total: %d",
                profile.name, len(self._prefill_cache.profiles),
            )

    def clear_references(self) -> None:
        with self._prefill_lock:
            self._prefill_cache = _PrefillCache()
            self._engine.clear_prefix()
            logger.info("Cleared all references")

    def get_references(self) -> list[VoiceProfile]:
        with self._prefill_lock:
            return list(self._prefill_cache.profiles)

    @property
    def num_references(self) -> int:
        with self._prefill_lock:
            return len(self._prefill_cache.profiles)

    def _get_prompt_data(
        self, references: list[VoiceProfile] | None
    ) -> tuple[list[str], list[np.ndarray], bool]:
        """(texts, codes, use_cached_prefix) — cached prefix only applies when
        the caller did not pass explicit references."""
        if references is not None:
            return (
                [p.text for p in references],
                [np.asarray(p.codes) for p in references],
                False,
            )
        with self._prefill_lock:
            if self._engine.has_prefix:
                return [], [], True
            return (
                list(self._prefill_cache.prompt_text),
                list(self._prefill_cache.prompt_tokens),
                False,
            )

    # ------------------------------------------------------------------
    # Synthesis (reference synthesizer.py:431-584)
    # ------------------------------------------------------------------

    def synthesize(
        self,
        text: str,
        references: list[VoiceProfile] | None = None,
        temperature: float = 0.7,
        top_p: float = 0.8,
        repetition_penalty: float = 1.1,
        max_tokens: int = 2048,
    ) -> bytes:
        """Synthesize speech from text.  Returns WAV bytes."""
        prompt_text, prompt_tokens, use_prefix = self._get_prompt_data(references)

        codes_list = []
        for response in self._engine.generate_long(
            text,
            max_new_tokens=max_tokens,
            temperature=temperature,
            top_p=top_p,
            repetition_penalty=repetition_penalty,
            prompt_text=prompt_text,
            prompt_tokens=prompt_tokens,
            use_prefix_cache=use_prefix,
        ):
            if response.action == "sample":
                codes_list.append(response.codes)
            elif response.action == "next":
                break

        if not codes_list or sum(c.shape[1] for c in codes_list) == 0:
            raise RuntimeError("No audio generated")

        codes = np.concatenate(codes_list, axis=1)
        return self._decode_to_wav(codes)

    def synthesize_batch(
        self,
        texts: list[str],
        references: list[VoiceProfile] | None = None,
        temperature: float | list[float] = 0.7,
        top_p: float | list[float] = 0.8,
        repetition_penalty: float | list[float] = 1.1,
        max_tokens: int = 2048,
    ) -> list[bytes]:
        """Batched multi-utterance synthesis: decode all texts in one batched
        device program (one model pass per token serves every stream), then
        vocoder-decode each.  Returns one WAV per text.  Sampling params take
        a shared scalar or one value per text.

        Green-field capability — the reference hard-codes batch size 1
        (inference.py:314, 676).
        """
        prompt_text, prompt_tokens, use_prefix = self._get_prompt_data(references)
        codes_list = self._engine.generate_batch(
            texts,
            max_new_tokens=max_tokens,
            temperature=temperature,
            top_p=top_p,
            repetition_penalty=repetition_penalty,
            prompt_text=prompt_text,
            prompt_tokens=prompt_tokens,
            use_prefix_cache=use_prefix,
        )
        if not codes_list:
            return []
        if all(c.shape[1] == 0 for c in codes_list):
            raise RuntimeError("No audio generated")
        out = []
        for codes in codes_list:
            if codes.shape[1] == 0:
                # one stream EOS'd immediately (e.g. im_end on the prefill
                # frame): return an empty-but-valid WAV for it rather than
                # discarding every other stream's finished audio
                from fish_tts_tpu.utils.audio import to_wav_bytes

                out.append(to_wav_bytes(np.zeros(0, np.float32)))
            else:
                out.append(self._decode_to_wav(codes))
        return out

    def synthesize_batch_stream(
        self,
        texts: list[str],
        references: list[VoiceProfile] | None = None,
        chunk_tokens: int = 20,
        min_first_chunk: int = 10,
        context_frames: int = 32,
        temperature: float | list[float] = 0.7,
        top_p: float | list[float] = 0.8,
        repetition_penalty: float | list[float] = 1.1,
        max_tokens: int = 2048,
        vocoder_mode: Literal["stateful", "context"] = "stateful",
    ) -> Iterator[list[bytes | None]]:
        """Streaming batched synthesis: all texts decode concurrently in one
        batched device program, and each yielded item is a list with one raw
        int16 PCM chunk per text (``None`` where that stream had nothing to
        flush this round).  Per-stream flush thresholds and ``vocoder_mode``
        semantics match :meth:`synthesize_stream` (one stateful vocoder
        state per stream); sampling params accept one value per text (see
        :meth:`synthesize_batch`).

        Green-field: the reference has neither batching nor multi-stream
        streaming.
        """
        prompt_text, prompt_tokens, use_prefix = self._get_prompt_data(references)
        B = len(texts)
        bufs: list[list[np.ndarray]] = [[] for _ in range(B)]
        totals = [0] * B
        firsts = [True] * B

        if vocoder_mode == "stateful":
            pool = _PoolStreamBatch(self, B)

            def flush(b):
                codes = np.concatenate(bufs[b], axis=1)
                bufs[b] = []
                totals[b] = 0
                return b, codes  # deferred into the round's pool program

            def emit(handles):
                entries = [h for h in handles if h is not None]
                pcm = pool.decode_round(entries)  # ONE program, int16 out
                with self._engine.metrics.span("vocoder"):
                    arr = np.asarray(pcm)  # ONE fetch
                fl = self._vocoder_cfg.frame_length
                out: list[bytes | None] = [None] * B
                for b, c in entries:
                    out[b] = arr[b, 0, : c.shape[1] * fl].tobytes()
                return out
        else:
            ctxs = [_ContextBuffer(context_frames) for _ in range(B)]

            def flush(b):
                codes, ctx = ctxs[b].take(np.concatenate(bufs[b], axis=1))
                bufs[b] = []
                totals[b] = 0
                audio, n = self._decode_codes_async(codes)
                return audio, n - ctx, ctx

            def emit(handles):
                # every flushing stream's decode was dispatched before any
                # is forced, so the device overlaps them
                return [
                    self._force_pcm(*h) if h is not None else None
                    for h in handles
                ]

        for chunk in self._engine.generate_batch_stream(
            texts,
            max_new_tokens=max_tokens,
            temperature=temperature,
            top_p=top_p,
            repetition_penalty=repetition_penalty,
            prompt_text=prompt_text,
            prompt_tokens=prompt_tokens,
            use_prefix_cache=use_prefix,
        ):
            handles: list = [None] * B
            for b, codes in enumerate(chunk):
                if codes is None:
                    continue
                bufs[b].append(codes)
                totals[b] += codes.shape[1]
                threshold = min_first_chunk if firsts[b] else chunk_tokens
                if totals[b] >= threshold:
                    handles[b] = flush(b)
                    firsts[b] = False
            if any(h is not None for h in handles):
                yield emit(handles)

        handles = [flush(b) if bufs[b] else None for b in range(B)]
        if any(h is not None for h in handles):
            yield emit(handles)

    def synthesize_stream(
        self,
        text: str,
        references: list[VoiceProfile] | None = None,
        chunk_tokens: int = 20,
        min_first_chunk: int = 10,
        context_frames: int = 32,
        temperature: float = 0.7,
        top_p: float = 0.8,
        repetition_penalty: float = 1.1,
        max_tokens: int = 2048,
        vocoder_mode: Literal["stateful", "context"] = "stateful",
    ) -> Iterator[bytes]:
        """Streaming synthesis with async-dispatch pipelining.

        Yields raw int16 PCM chunks (44.1 kHz mono).  Chunk thresholds match
        the reference (synthesizer.py:497-498): first flush at
        ``min_first_chunk`` tokens, then every ``chunk_tokens``.

        Pipelining: each flushed chunk's vocoder decode is *dispatched* to the
        device immediately but only *forced* after the next LM chunk has been
        requested — the device works on the vocoder chunk while the host sets
        up the next decode step, replacing the reference's decoder thread
        (synthesizer.py:513-527).

        ``vocoder_mode``:

        - ``"stateful"`` (default): the vocoder carries its exact
          conv-tail / windowed-KV state across chunks
          (models/vocoder_stream.py) — each chunk decodes only its own
          frames and the concatenated audio equals the jointly-decoded
          waveform.  ``context_frames`` is ignored.
        - ``"context"``: the round-3 scheme — re-decode ``context_frames``
          of history per chunk and trim the overlap (~2.6x redundant
          steady-state vocoder compute; equal audio for sufficient context).
          The reference decodes every chunk independently
          (synthesizer.py:513-527), which is ``context_frames=0`` here —
          audibly clicky at chunk boundaries.

        All sampling parameters are explicit keywords — unknown kwargs raise
        ``TypeError``.  The reference's stale ``pipeline=`` tolerance
        (its ``**kwargs`` swallow, synthesizer.py:489) is deliberately NOT
        replicated: a typo'd parameter silently getting its default is a
        worse outcome than a loud error.
        """
        prompt_text, prompt_tokens, use_prefix = self._get_prompt_data(references)

        buffer: list[np.ndarray] = []
        total = 0
        is_first = True
        in_flight = None  # device array of the previous chunk's audio

        if vocoder_mode == "stateful":
            sv = _StreamVocoder(self)

            def flush(buffer):
                audio, n = sv.decode_async(np.concatenate(buffer, axis=1))
                return audio, n, 0
        else:
            ctx_buf = _ContextBuffer(context_frames)

            def flush(buffer):
                codes, ctx = ctx_buf.take(np.concatenate(buffer, axis=1))
                audio, n = self._decode_codes_async(codes)
                return audio, n - ctx, ctx

        for response in self._engine.generate_long(
            text,
            max_new_tokens=max_tokens,
            temperature=temperature,
            top_p=top_p,
            repetition_penalty=repetition_penalty,
            prompt_text=prompt_text,
            prompt_tokens=prompt_tokens,
            streaming=True,
            use_prefix_cache=use_prefix,
        ):
            if response.action == "sample":
                buffer.append(response.codes)
                total += response.codes.shape[1]
                threshold = min_first_chunk if is_first else chunk_tokens
                if total >= threshold:
                    handle = flush(buffer)
                    buffer = []
                    total = 0
                    if is_first:
                        # first audio is latency-critical: force it now
                        # instead of holding it for pipeline overlap
                        yield self._force_pcm(*handle)
                    else:
                        if in_flight is not None:
                            yield self._force_pcm(*in_flight)
                        in_flight = handle
                    is_first = False
            elif response.action == "next":
                if buffer:
                    if in_flight is not None:
                        yield self._force_pcm(*in_flight)
                    in_flight = flush(buffer)
                break

        if in_flight is not None:
            yield self._force_pcm(*in_flight)

    def synthesize_long(
        self,
        text: str,
        references: list[VoiceProfile] | None = None,
        temperature: float = 0.7,
        top_p: float = 0.8,
        repetition_penalty: float = 1.1,
        max_chars: int = 200,
        carry_frames: int = 64,
        max_tokens_per_chunk: int = 2048,
    ) -> bytes:
        """Long-form synthesis past one context window.  Returns WAV bytes.

        The reference (and :meth:`synthesize`) is bounded by the model
        context: prompts beyond ``max_seq_len - 2048`` raise
        (inference.py:794-795) and one call cannot produce more than 2048
        frames (~95 s).  This green-field entry point splits ``text`` into
        sentence-aware chunks (:func:`fish_tts_tpu.utils.text.split_text`)
        and synthesizes them sequentially, inlining the previous chunk's
        text + trailing ``carry_frames`` generated codes as an extra
        reference pair so voice and prosody carry across chunk boundaries
        (the upstream Fish-Speech "iterative prompt" pattern).

        ``max_chars`` bounds each chunk's text; ``carry_frames`` bounds the
        rolling audio context (~3 s at 64 frames).  Both must leave the
        combined prompt (references + carry + chunk text) inside
        ``max_seq_len - reserve`` or the engine raises ``ValueError``.
        """
        pcm = bytearray()
        for chunk in self.synthesize_long_stream(
            text, references=references, temperature=temperature,
            top_p=top_p, repetition_penalty=repetition_penalty,
            max_chars=max_chars, carry_frames=carry_frames,
            max_tokens_per_chunk=max_tokens_per_chunk,
        ):
            pcm.extend(chunk)
        if not pcm:
            raise RuntimeError("No audio generated")
        from fish_tts_tpu.utils.audio import to_wav_bytes

        samples = np.frombuffer(bytes(pcm), np.int16).astype(np.float32)
        return to_wav_bytes(samples / 32767.0)

    def synthesize_long_stream(
        self,
        text: str,
        references: list[VoiceProfile] | None = None,
        chunk_tokens: int = 20,
        min_first_chunk: int = 10,
        temperature: float = 0.7,
        top_p: float = 0.8,
        repetition_penalty: float = 1.1,
        max_chars: int = 200,
        carry_frames: int = 64,
        max_tokens_per_chunk: int = 2048,
    ) -> Iterator[bytes]:
        """Streaming :meth:`synthesize_long`: yields raw int16 PCM chunks
        (44.1 kHz mono) continuously across ALL text chunks — first audio
        after ``min_first_chunk`` frames of the first chunk, exactly like
        :meth:`synthesize_stream`, however long the input text.

        Voice continuity: chunk ``i > 0`` synthesizes with the base
        references plus ``(chunk[i-1] text, its trailing carry_frames
        codes)`` as one extra reference pair.  The first chunk uses the
        session prefix cache when no explicit references are passed; later
        chunks re-prefill explicitly (the carry pair changes every chunk).
        Each text chunk restarts the stateful vocoder — chunk boundaries
        are sentence boundaries, so the joins land in natural pauses.
        """
        from fish_tts_tpu.utils.text import split_text

        chunks = split_text(text, max_chars)
        if references is not None:
            base = list(references)
        else:
            base = self.get_references()
        prev: VoiceProfile | None = None
        for i, chunk_text in enumerate(chunks):
            if prev is None:
                # None -> _get_prompt_data may use the cached device prefix
                refs = references
            else:
                refs = base + [prev]
            prompt_text, prompt_tokens, use_prefix = \
                self._get_prompt_data(refs)
            sv = _StreamVocoder(self)
            buffer: list[np.ndarray] = []
            collected: list[np.ndarray] = []
            total = 0
            is_first = i == 0
            in_flight = None
            for response in self._engine.generate_long(
                chunk_text,
                max_new_tokens=max_tokens_per_chunk,
                temperature=temperature,
                top_p=top_p,
                repetition_penalty=repetition_penalty,
                prompt_text=prompt_text,
                prompt_tokens=prompt_tokens,
                streaming=True,
                use_prefix_cache=use_prefix,
            ):
                if response.action == "sample":
                    buffer.append(response.codes)
                    collected.append(response.codes)
                    total += response.codes.shape[1]
                    if total >= (min_first_chunk if is_first
                                 else chunk_tokens):
                        audio, n = sv.decode_async(
                            np.concatenate(buffer, axis=1))
                        buffer, total = [], 0
                        if is_first:  # latency-critical: force it now
                            yield self._force_pcm(audio, n, 0)
                        else:
                            if in_flight is not None:
                                yield self._force_pcm(*in_flight)
                            in_flight = (audio, n, 0)
                        is_first = False
                elif response.action == "next":
                    break
            if buffer:
                if in_flight is not None:
                    yield self._force_pcm(*in_flight)
                in_flight = (*sv.decode_async(
                    np.concatenate(buffer, axis=1)), 0)
            if in_flight is not None:
                yield self._force_pcm(*in_flight)
            if collected and carry_frames > 0:
                # carry_frames=0 disables carry (prev stays None and later
                # chunks use the base references alone); without the guard
                # ``[:, -0:]`` would inline the ENTIRE previous chunk
                codes = np.concatenate(collected, axis=1)
                # streaming yields the EOS frame too (inference.py:271-274);
                # drop it from the carry like the reference's batch path
                # strips it from returned codes (inference.py:839)
                if codes.shape[1] > 1:
                    codes = codes[:, :-1]
                prev = VoiceProfile(
                    codes=codes[:, -carry_frames:].astype(np.int64),
                    text=chunk_text, name="_carry",
                )

    def serve(self, slots: int = 8, vocoder_device=None,
              max_queue: int = 0,
              warmup: bool | None = None) -> "ServeSession":
        """Continuous-batching audio serving: a session whose requests JOIN
        the running decode pool (``engine.serve.ContinuousBatcher``) and
        stream raw PCM per request through ONE pool-wide batched stateful
        vocoder (one device program + one PCM fetch per round — see
        :class:`ServeSession`).  Green-field — the reference is strictly
        one-request-at-a-time (batch hard-coded 1, inference.py:314, 676).

        >>> sess = tts.serve(slots=8)
        >>> rid = sess.submit("hello", max_new_tokens=400)
        >>> for ev in sess.run():
        ...     play(ev.request_id, ev.pcm)   # raw int16 PCM @ 44.1 kHz

        Requests submitted while ``run()``/``step()`` is being driven are
        admitted into free slots between decode chunks.  Voice references
        are session-level: the profile set via :meth:`set_references` when a
        request is *admitted* conditions it (per-request voices would need
        per-slot prefixes — not supported).

        ``vocoder_device``: an optional second ``jax.Device`` for
        disaggregated serving — the pool vocoder's params and state live
        there, and its decode rounds run concurrently with the LM device's
        instead of serializing behind them on one chip.

        ``max_queue``: backpressure bound on queued (unadmitted) requests;
        0 = unbounded.  ``submit`` raises ``engine.serve.QueueFull`` at the
        bound.  ``session.stats()`` reports queue depth, p50/p95 queue wait
        and TTFT over recent completions.

        ``warmup``: compile the pool programs now (one drained tiny
        request, :meth:`ServeSession.warmup`) instead of on the first real
        request's TTFT.  Default (``None``) follows the instance's warmup
        setting.
        """
        if self._vocoder_params is None:
            raise RuntimeError(
                "Audio serving requires the vocoder; this instance loaded "
                "without one (LM codes only)."
            )
        sess = ServeSession(self, slots=slots, vocoder_device=vocoder_device,
                            max_queue=max_queue)
        if warmup if warmup is not None else self._is_warmed_up:
            sess.warmup()
        return sess

    # ------------------------------------------------------------------
    # Vocoder plumbing
    # ------------------------------------------------------------------

    def _vocoder_decode_fn(self):
        """Jitted vocoder decode (jit re-specializes per padded bucket shape).

        Params are an explicit argument, never a closure: closed-over device
        arrays get embedded as HLO constants, which bloats the executable
        (and overflows remote-compile transports) for 100M+-param codecs.
        """
        if "decode" not in self._vocoder_jit_cache:
            import jax

            from fish_tts_tpu.models import vocoder as voc

            cfg = self._vocoder_cfg
            self._vocoder_jit_cache["decode"] = jax.jit(
                lambda p, c: voc.dac_decode(p, cfg, c)
            )
        fn = self._vocoder_jit_cache["decode"]
        return lambda c: fn(self._vocoder_params, c)

    def _stream_init_fn(self):
        """Jitted fresh streaming-vocoder state (B=1)."""
        if "stream_init" not in self._vocoder_jit_cache:
            import jax

            from fish_tts_tpu.models import vocoder_stream as vs

            cfg = self._vocoder_cfg
            self._vocoder_jit_cache["stream_init"] = jax.jit(
                lambda p: vs.init_decode_state(p, cfg, batch=1)
            )
        return self._vocoder_jit_cache["stream_init"]

    def _stream_decode_fn(self):
        """Jitted stateful streaming decode (one function; XLA compiles per
        chunk length — streaming lengths are the 10/20 thresholds plus one
        final partial, so the variant set stays small)."""
        if "stream_decode" not in self._vocoder_jit_cache:
            import jax

            from fish_tts_tpu.models import vocoder_stream as vs

            cfg = self._vocoder_cfg
            self._vocoder_jit_cache["stream_decode"] = jax.jit(
                lambda p, st, c: vs.decode_chunk(p, cfg, st, c),
                donate_argnums=(1,),
            )
        return self._vocoder_jit_cache["stream_decode"]

    def _pool_vocoder_fns(self, batch: int):
        """Jitted (init, decode) pair for the slot-pool streaming vocoder
        (ServeSession): one batched state aligned with the LM slot pool.

        The decode returns **int16 PCM**, not float audio: the device->host
        audio fetch is the serving round's second-largest wall phase
        (~81 ms of a ~182 ms round at 16 slots on the tunneled v5e —
        scripts/profile_serving.py), so the ``*32767 -> int16`` conversion
        runs inside the program and the transfer shrinks 2x vs bf16 / 4x vs
        f32.  Bit-exact vs the host-side ``to_pcm_bytes`` float path: the
        decoder ends in tanh so samples are strictly inside (-1, 1) —
        ``x*32767`` can never overflow int16 — and XLA's float->int convert
        truncates toward zero exactly like numpy's ``astype(int16)``
        (pinned by tests/test_serve.py::test_pool_pcm_matches_host_path).
        """
        key = ("pool", batch)
        if key not in self._vocoder_jit_cache:
            import jax
            import jax.numpy as jnp

            from fish_tts_tpu.models import vocoder_stream as vs

            cfg = self._vocoder_cfg

            def _decode_pcm(p, st, c, a, r):
                st, audio = vs.decode_chunk_pool(p, cfg, st, c, a, r)
                pcm = (audio.astype(jnp.float32) * 32767).astype(jnp.int16)
                return st, pcm

            self._vocoder_jit_cache[key] = (
                jax.jit(lambda p: vs.init_decode_state(p, cfg, batch=batch)),
                jax.jit(_decode_pcm, donate_argnums=(1,)),
            )
        return self._vocoder_jit_cache[key]

    def _decode_codes_async(self, codes: np.ndarray):
        """Dispatch vocoder decode without blocking.  Returns (device_audio,
        n_frames) to be forced later."""
        import jax.numpy as jnp

        if self._vocoder_params is None:
            raise RuntimeError("Vocoder not loaded")
        n = codes.shape[-1]
        bucket = _vocoder_bucket(n)
        padded = np.zeros((1, codes.shape[0], bucket), np.int32)
        padded[0, :, :n] = codes
        audio = self._vocoder_decode_fn()(jnp.asarray(padded))
        return audio, n

    def _force_pcm(self, audio, n_frames: int, skip_frames: int = 0) -> bytes:
        """Force a dispatched vocoder decode to int16 PCM, dropping
        ``skip_frames`` of (context) audio from the front."""
        from fish_tts_tpu.utils.audio import to_pcm_bytes

        with self._engine.metrics.span("vocoder"):
            arr = np.asarray(audio, dtype=np.float32)[0, 0]
        fl = self._vocoder_cfg.frame_length
        arr = arr[skip_frames * fl: (skip_frames + n_frames) * fl]
        return to_pcm_bytes(arr)

    def _decode_codes(self, codes: np.ndarray) -> np.ndarray:
        """codes (K, n) -> float32 audio (reference _decode_codes,
        synthesizer.py:597-611)."""
        with self._engine.metrics.span("vocoder"):
            audio, n = self._decode_codes_async(codes)
            arr = np.asarray(audio, dtype=np.float32)[0, 0]
        return arr[: n * self._vocoder_cfg.frame_length]

    def _decode_to_wav(self, codes: np.ndarray) -> bytes:
        from fish_tts_tpu.utils.audio import to_wav_bytes

        return to_wav_bytes(self._decode_codes(codes))

    def _decode_to_pcm(self, codes: np.ndarray) -> bytes:
        from fish_tts_tpu.utils.audio import to_pcm_bytes

        return to_pcm_bytes(self._decode_codes(codes))

    # ------------------------------------------------------------------
    # Reference encoding (reference synthesizer.py:325-357)
    # ------------------------------------------------------------------

    def encode_reference(self, audio_bytes: bytes, text: str) -> VoiceProfile:
        """Encode reference WAV audio into a voice profile."""
        import jax
        import jax.numpy as jnp

        from fish_tts_tpu.models import vocoder as voc
        from fish_tts_tpu.utils.audio import read_wav

        if self._vocoder_params is None:
            raise RuntimeError("Vocoder not loaded")

        audio = read_wav(audio_bytes)
        if self._encode_jit is None:
            cfg = self._vocoder_cfg
            self._encode_jit = jax.jit(lambda p, a: voc.dac_encode(p, cfg, a))
        # Pad audio to a frame multiple on the host so the jitted encode sees
        # a bounded set of shapes (frame buckets).
        fl = self._vocoder_cfg.frame_length
        n_frames = max(1, -(-len(audio) // fl))
        bucket = _vocoder_bucket(n_frames)
        padded = np.zeros((1, 1, bucket * fl), np.float32)
        padded[0, 0, : len(audio)] = audio
        indices = self._encode_jit(self._vocoder_params, jnp.asarray(padded))
        codes = np.asarray(indices)[0, :, :n_frames].astype(np.int64)
        return VoiceProfile(codes=codes, text=text)

    # ------------------------------------------------------------------

    @property
    def metrics(self):
        """Engine metrics registry (prefill/decode/vocoder spans, tokens)."""
        return self._engine.metrics

    def get_metrics(self) -> dict:
        """Structured timing/throughput summary plus device memory usage."""
        from fish_tts_tpu.utils.profiling import hbm_bytes_in_use

        out = self._engine.metrics.summary()
        hbm = hbm_bytes_in_use()
        if hbm:
            out["hbm_gb"] = round(hbm / 2**30, 2)
        return out

    @property
    def sample_rate(self) -> int:
        return 44100

    @property
    def precision(self) -> str:
        return self._precision


@dataclass
class AudioEvent:
    """One serving-round audio outcome for one request."""

    request_id: int
    pcm: bytes  # raw int16 PCM @ 44.1 kHz mono (b"" on a frame-less finish)
    done: bool
    frames_total: int  # cumulative LM frames emitted for this request


class _LongChain:
    """Serving-side long-form request: one external id, a chain of LM
    requests (one per text chunk), one continuous audio stream.

    Segment ``i > 0`` is prompted with the base references plus
    ``(chunk[i-1], its trailing carry_frames codes)`` — the same rolling
    continuity context as :meth:`FishTTS.synthesize_long` — unless the
    engine holds a session-level prefix (then the prefix IS the voice and
    successors submit plain text).  The pool vocoder state is carried
    across segments (same audio stream, no reset), so the joins are
    click-free."""

    __slots__ = ("chunks", "idx", "cur", "base_texts", "base_codes",
                 "carry_frames", "kw", "seed", "deadline", "tail",
                 "frames_offset", "aliases", "pending", "pending_kw")

    def __init__(self, chunks, base_texts, base_codes, carry_frames,
                 kw, seed, deadline):
        self.chunks = chunks
        self.idx = 1  # next chunk to submit
        self.cur = -1  # current internal request id
        self.base_texts = base_texts
        self.base_codes = base_codes
        self.carry_frames = carry_frames
        self.kw = kw  # sampling/priority kwargs for successor prepares
        self.seed = seed
        self.deadline = deadline  # absolute time.monotonic(); 0 = none
        self.tail: np.ndarray | None = None  # current segment's code tail
        self.frames_offset = 0  # frames finished in previous segments
        self.aliases: list[int] = []  # successor internal ids
        # prepared-but-unenqueued successor, kept across QueueFull retries
        # (the carry context was consumed by take_carry at prepare time)
        self.pending = None
        # built-but-unprepared successor kwargs (prepare itself fail-fasts
        # with QueueFull at the bound): the carry context lives in here
        self.pending_kw = None

    def feed(self, codes: np.ndarray) -> None:
        """Accumulate the current segment's trailing codes (one spare frame
        so the EOS frame can be dropped at segment end)."""
        keep = self.carry_frames + 1
        tail = codes if self.tail is None \
            else np.concatenate([self.tail, codes], axis=1)
        self.tail = tail[:, -keep:]

    def take_carry(self) -> np.ndarray | None:
        """Finished segment's carry codes (EOS frame dropped, like the
        reference's batch path strips it — inference.py:839)."""
        tail = self.tail
        self.tail = None
        # carry_frames=0 means carry disabled — and ``[:, -0:]`` below
        # would return the WHOLE tail (the EOS frame) instead of nothing
        if self.carry_frames <= 0 or tail is None or tail.shape[1] == 0:
            return None
        if tail.shape[1] > 1:
            tail = tail[:, :-1]
        return tail[:, -self.carry_frames:].astype(np.int64)


class _SlotAudioStream:
    """One request's audio stream within the pool vocoder."""

    __slots__ = ("rid", "bufs", "buffered", "needs_reset", "lm_done",
                 "frames_total")

    def __init__(self, rid: int):
        self.rid = rid
        self.bufs: list[np.ndarray] = []  # FIFO of (K, m) code chunks
        self.buffered = 0
        self.needs_reset = True  # first flush restarts the slot's stream
        self.lm_done = False
        self.frames_total = 0

    def take(self, m: int) -> np.ndarray:
        """Pop the oldest ``m`` buffered frames."""
        out, need = [], m
        while need:
            head = self.bufs[0]
            if head.shape[1] <= need:
                out.append(self.bufs.pop(0))
                need -= head.shape[1]
            else:
                out.append(head[:, :need])
                self.bufs[0] = head[:, need:]
                need = 0
        self.buffered -= m
        return out[0] if len(out) == 1 else np.concatenate(out, axis=1)


class ServeSession:
    """Audio-level continuous batching (created via :meth:`FishTTS.serve`).

    LM side: one :class:`~fish_tts_tpu.engine.serve.ContinuousBatcher` slot
    pool — requests admit into the running batched decode between chunks.
    Audio side: ONE pool-wide batched stateful vocoder
    (``vocoder_stream.decode_chunk_pool``) with as many lanes as LM slots,
    allocated from a free pool per audio stream (NOT keyed by the LM slot:
    a long-form chain keeps its lane across segments while its LM slots are
    recycled) — every flushing request's chunk decodes in a
    single device program per round and all PCM is fetched in a single
    device->host transfer.  Per-request B=1 vocoder dispatches cost ~42 ms
    each on a tunneled platform (~8 ms of it compute); at 16 slots that is
    ~670 ms/round of round-trips — the pool program does the same work in
    one ~135 ms dispatch, and its audio is forced one round late so the
    fetch overlaps device work.

    Flushes are fixed-width (the engine's ``decode_chunk`` frames): each
    live stream emits exactly that many frames per round in steady state
    (PCM chunks of ``decode_chunk * frame_length`` samples); a request's
    ragged final chunk is zero-padded into the same program — the decode
    path is causal, so the emitted prefix is exact and the host truncates.
    Streamed PCM includes the EOS frame, matching ``synthesize_stream``
    (the reference streaming quirk, inference.py:271-274).
    """

    def __init__(self, tts: FishTTS, slots: int = 8, vocoder_device=None,
                 max_queue: int = 0):
        import jax

        from fish_tts_tpu.engine.serve import ContinuousBatcher

        self._tts = tts
        self._srv = ContinuousBatcher(tts._engine, slots=slots,
                                      max_queue=max_queue)
        self._slots = slots
        self._n = self._srv.chunk  # pool flush width == LM chunk frames
        # Disaggregated serving: with a second device, the pool vocoder's
        # params/state live there and its programs run concurrently with
        # the LM chip's decode rounds instead of serializing behind them —
        # audio serving then runs at the LM-only rate.  Committed inputs
        # pin the jitted programs to that device.
        self._vdev = vocoder_device
        self._vparams = tts._vocoder_params
        if vocoder_device is not None:
            self._vparams = jax.device_put(tts._vocoder_params,
                                           vocoder_device)
        init, self._decode = tts._pool_vocoder_fns(slots)
        self._state = init(self._vparams)
        self._streams: dict[int, _SlotAudioStream] = {}
        # per-slot FIFO of audio streams: [0] is flushing, the rest wait
        # (a successor admitted while its predecessor's tail drains)
        self._slot_q: list[list[_SlotAudioStream]] = [[] for _ in range(slots)]
        self._cancel_lock = threading.Lock()
        self._cancel_pending: set[int] = set()
        self._cancel_drop: dict[int, int] = {}  # rid -> rounds left to drop
        # long-form chains: external id -> _LongChain; internal successor
        # request id -> external id (both under _cancel_lock: submit/cancel
        # run on handler threads, step on the driver thread)
        self._chains: dict[int, _LongChain] = {}
        self._alias: dict[int, int] = {}
        # chains whose next segment hit QueueFull: retried each round
        # (driver thread only)
        self._chain_retry: dict[int, _LongChain] = {}
        # one in-flight pool decode: (device_audio | None, emit list) —
        # forced NEXT round so the PCM fetch overlaps device work
        self._pending = None

    def submit(
        self,
        text: str,
        *,
        max_new_tokens: int = 2048,
        temperature: float = 0.7,
        top_p: float = 0.8,
        repetition_penalty: float = 1.1,
        seed: int | None = None,
        references: "list[VoiceProfile] | None" = None,
        priority: int = 0,
        timeout_s: float = 0.0,
        long: bool = False,
        max_chars: int = 200,
        carry_frames: int = 64,
    ) -> int:
        """Queue a request; returns its id.  Thread-safe.  ``seed`` pins the
        request's sampling to its solo-run stream (engine.serve.submit).

        ``references``: per-request voice profiles, inlined into this
        request's prompt — co-tenant requests can each speak with a
        different voice.  Incompatible with a session-level cached prefix
        (``set_references``/``add_reference`` on the FishTTS instance).

        ``long``: long-form mode for texts past one context window — the
        text splits into sentence-aware chunks (``max_chars`` each) and the
        chunks decode as a CHAIN of pool requests under this one id, each
        prompted with its predecessor's text + trailing ``carry_frames``
        codes for voice continuity (see :meth:`FishTTS.synthesize_long`).
        The consumer sees one continuous PCM stream with one final done
        event; ``timeout_s`` bounds the whole chain; ``seed`` derives one
        sub-seed per chunk.  Co-tenant requests interleave with every
        segment like with any other request."""
        return self.enqueue(self.prepare(
            text, max_new_tokens=max_new_tokens, temperature=temperature,
            top_p=top_p, repetition_penalty=repetition_penalty, seed=seed,
            references=references, priority=priority, timeout_s=timeout_s,
            long=long, max_chars=max_chars, carry_frames=carry_frames,
        ))

    def prepare(self, text: str, *, references=None, long=False,
                max_chars=200, carry_frames=64, **kw):
        """Expensive host-side request preparation (tokenize/prompt/keys)
        without touching scheduler state; pair with :meth:`enqueue`.  Lets
        callers (e.g. the HTTP driver) keep their own locks narrow."""
        base_texts = [r.text for r in references] if references else []
        base_codes = [np.asarray(r.codes) for r in references] \
            if references else []
        if not long:
            if references:
                kw["prompt_text"] = base_texts
                kw["prompt_tokens"] = base_codes
            return self._srv.prepare(text, **kw)
        from fish_tts_tpu.utils.text import split_text

        chunks = split_text(text, int(max_chars))
        if not chunks:
            raise ValueError("long request has no synthesizable text")
        kw0 = dict(kw)
        if references:
            kw0["prompt_text"] = base_texts
            kw0["prompt_tokens"] = base_codes
        req = self._srv.prepare(chunks[0], **kw0)
        if len(chunks) > 1:
            timeout_s = float(kw.get("timeout_s", 0.0))
            # successor prepares rebuild prompts from these (timeout_s is
            # recomputed per segment from the absolute deadline)
            chain_kw = {k: v for k, v in kw.items()
                        if k not in ("seed", "timeout_s")}
            req._long_chain = _LongChain(
                chunks, base_texts, base_codes, int(carry_frames),
                chain_kw, kw.get("seed"),
                (time.monotonic() + timeout_s) if timeout_s else 0.0,
            )
        return req

    def enqueue(self, req) -> int:
        """Queue a prepared request (cheap, thread-safe); returns its id."""
        chain = getattr(req, "_long_chain", None)
        rid = self._srv.enqueue(req)
        if chain is not None:
            chain.cur = rid
            with self._cancel_lock:
                self._chains[rid] = chain
        return rid

    def cancel(self, request_id: int) -> None:
        """Abort a request (thread-safe; applied at the next round).  The LM
        slot stops decoding, buffered codes are dropped, and no further
        audio events are emitted for the id — audio already delivered (or
        already dispatched to the vocoder this round) is the only audio the
        consumer ever sees.  Cancelling a long request's external id aborts
        its whole chain."""
        with self._cancel_lock:
            chain = self._chains.pop(request_id, None)
            if chain is not None:
                for a in chain.aliases:
                    self._alias.pop(a, None)
                # a racing in-flight event for a successor would resolve to
                # its raw internal id once the alias is gone — mark those
                # ids cancelled too so it cannot seed a zombie stream
                self._cancel_pending.update(chain.aliases)
            self._cancel_pending.add(request_id)
        self._srv.cancel(
            chain.cur if chain is not None and chain.cur >= 0
            else request_id
        )

    def _chain_next(self, eid: int, chain: _LongChain) -> str:
        """Submit a long request's next segment (driver thread, called when
        the current segment's final LM event lands or on a backpressure
        retry round).  Returns ``"ok"`` (successor enqueued), ``"retry"``
        (queue momentarily full — the prepared request is kept on the chain
        and re-enqueued next round), or ``"end"`` (deadline passed, prompt
        no longer fits, or cancelled — the stream finishes with the audio
        produced so far)."""
        from fish_tts_tpu.engine.serve import QueueFull

        now = time.monotonic()
        if chain.deadline and now >= chain.deadline:
            return "end"
        idx = chain.idx
        req = chain.pending
        if req is None:
            kw = chain.pending_kw
            if kw is None:
                kw = dict(chain.kw)
                if chain.seed is not None:
                    kw["seed"] = chain.seed + idx
                carry = chain.take_carry()
                if not self._tts._engine.has_prefix:
                    # rolling continuity context; with a session prefix the
                    # prefix itself is the voice and successors submit plain
                    # text.  When a segment yielded no carry (e.g. EOS on
                    # its first frame) the base references must still be
                    # passed — dropping them would switch the rest of the
                    # chain to the default voice.
                    if carry is not None:
                        kw["prompt_text"] = (
                            chain.base_texts + [chain.chunks[idx - 1]])
                        kw["prompt_tokens"] = chain.base_codes + [carry]
                    elif chain.base_texts:
                        kw["prompt_text"] = list(chain.base_texts)
                        kw["prompt_tokens"] = list(chain.base_codes)
            if chain.deadline:
                # refreshed per attempt so the prepared request's absolute
                # deadline stays the CHAIN deadline across retry rounds
                kw["timeout_s"] = chain.deadline - now
            try:
                req = self._srv.prepare(chain.chunks[idx], **kw)
            except QueueFull:
                # prepare fail-fasts at the queue bound; the consumed carry
                # context lives in kw, so keep it for the next round
                chain.pending_kw = kw
                return "retry"
            except ValueError as e:
                logger.warning(
                    "long request %d: chain ended early at chunk %d/%d: %s",
                    eid, idx, len(chain.chunks), e,
                )
                return "end"
            chain.pending_kw = None
        # enqueue + registration atomically vs cancel(): a cancel that
        # lands after this block pops the chain and cancels ``cur`` =
        # the successor; one that landed before is seen here and the
        # chain ends instead of spawning an orphan segment
        with self._cancel_lock:
            if self._chains.get(eid) is not chain:
                return "end"  # cancelled at the segment boundary
            try:
                nid = self._srv.enqueue(req)
            except QueueFull:
                # transient backpressure is NOT a chain failure: keep the
                # prepared request (its carry context is already consumed
                # from the chain) and try again next scheduler round
                chain.pending = req
                return "retry"
            chain.pending = None
            chain.idx += 1
            chain.cur = nid
            chain.aliases.append(nid)
            self._alias[nid] = eid
        return "ok"

    def reset(self) -> None:
        """Rebuild the session after a failed ``step()`` (see
        ``ContinuousBatcher.reset``): both the LM pool state and the pool
        vocoder state are donated into their device programs, so a runtime
        failure mid-round can leave deleted buffers behind.  All live
        requests are dropped (the driver has already ended their consumer
        streams); new requests then serve normally."""
        self._srv.reset()
        init, _ = self._tts._pool_vocoder_fns(self._slots)
        self._state = init(self._vparams)
        self._streams.clear()
        self._slot_q = [[] for _ in range(self._slots)]
        self._pending = None
        self._chain_retry.clear()
        with self._cancel_lock:
            self._chains.clear()
            self._alias.clear()
            self._cancel_pending.clear()
            self._cancel_drop.clear()

    def _pick_lane(self) -> int:
        """Vocoder lane for a NEW audio stream.  Lanes are a resource pool
        independent of LM slots: a long-form chain keeps its lane (and the
        vocoder state carried in it) for its whole multi-segment life, long
        after its first LM slot was recycled — assigning by LM slot would
        queue an unrelated new stream behind the entire chain.  Prefer a
        free lane; under genuine oversubscription queue behind the lane
        with the least pending work."""
        best, best_key = 0, None
        for s, q in enumerate(self._slot_q):
            if not q:
                return s
            # avoid lanes whose occupant has unbounded future work: a live
            # chain stream outlasts any single request (reading _chains
            # off-lock is fine — it only tunes this heuristic)
            live_chain = any(
                not st.lm_done and st.rid in self._chains for st in q
            )
            live = any(not st.lm_done for st in q)
            key = (live_chain, live, len(q), sum(st.buffered for st in q))
            if best_key is None or key < best_key:
                best, best_key = s, key
        return best

    def stats(self) -> dict:
        """Serving stats from the LM scheduler: queue depth, live slots,
        p50/p95 queue wait and consumer-visible TTFT over recent
        completions (``engine.serve.ContinuousBatcher.stats``)."""
        return self._srv.stats()

    def step(self) -> list[AudioEvent]:
        """One scheduler round; returns the previous round's audio events
        (audio is forced one round late for fetch/compute overlap)."""
        import jax.numpy as jnp

        with self._cancel_lock:
            cancelled, self._cancel_pending = self._cancel_pending, set()
        for rid in cancelled:
            st = self._streams.pop(rid, None)
            if st is not None:
                for q in self._slot_q:
                    if st in q:
                        q.remove(st)
                        break
            # LM events and already-dispatched audio for this id may still
            # land for a couple of rounds (the pipeline is two rounds
            # deep); drop them by id instead of re-creating the stream
            self._cancel_drop[rid] = 4
        for rid in [r for r, n in self._cancel_drop.items() if n <= 1]:
            del self._cancel_drop[rid]
        for rid in self._cancel_drop:
            self._cancel_drop[rid] -= 1
        instant_done: list[AudioEvent] = []
        # chains blocked on queue backpressure: try their next segment again
        for eid in list(self._chain_retry):
            chain = self._chain_retry[eid]
            r = self._chain_next(eid, chain)
            if r == "retry":
                continue
            del self._chain_retry[eid]
            if r == "end":
                with self._cancel_lock:
                    self._chains.pop(eid, None)
                    for a in chain.aliases:
                        self._alias.pop(a, None)
                st = self._streams.get(eid)
                if st is not None:
                    st.lm_done = True  # drain the tail, then emit done
                elif eid not in self._cancel_drop:
                    instant_done.append(
                        AudioEvent(eid, b"", True, chain.frames_offset))
        for ev in self._srv.step():
            with self._cancel_lock:
                eid = self._alias.get(ev.request_id, ev.request_id)
                chain = self._chains.get(eid)
            if eid in self._cancel_drop:
                continue
            done = ev.done
            frames_total = ev.frames_total
            if chain is not None:
                frames_total += chain.frames_offset
                if ev.codes.shape[1]:
                    chain.feed(ev.codes)
                if done:
                    # chain onward unless this segment FAILED (expiry /
                    # rejection events carry slot=-1) or was the last
                    if ev.slot != -1 and chain.idx < len(chain.chunks):
                        r = self._chain_next(eid, chain)
                    else:
                        r = "end"
                    if r != "end":
                        done = False
                        chain.frames_offset = frames_total
                        if r == "retry":
                            self._chain_retry[eid] = chain
                    else:
                        with self._cancel_lock:
                            self._chains.pop(eid, None)
                            for a in chain.aliases:
                                self._alias.pop(a, None)
            st = self._streams.get(eid)
            if st is None:
                if done and not ev.codes.shape[1]:
                    # frame-less finish for a stream we never saw (e.g. a
                    # deadline expiry while still queued, slot=-1): emit
                    # the end-of-stream directly, never touch the slot
                    # queues
                    instant_done.append(
                        AudioEvent(eid, b"", True, frames_total))
                    continue
                st = _SlotAudioStream(eid)
                self._streams[eid] = st
                self._slot_q[self._pick_lane()].append(st)
            if ev.codes.shape[1]:
                st.bufs.append(ev.codes)
                st.buffered += ev.codes.shape[1]
            st.lm_done |= done
            st.frames_total = frames_total

        n = self._n
        codes = np.zeros((self._slots, self._tts._cfg.num_codebooks, n),
                         np.int32)
        active = np.zeros((self._slots,), bool)
        reset = np.zeros((self._slots,), bool)
        emits: list[tuple[int, _SlotAudioStream, int, bool]] = []
        for s in range(self._slots):
            q = self._slot_q[s]
            if not q:
                continue
            st = q[0]
            if st.lm_done and not st.buffered:  # frame-less finish
                emits.append((s, st, 0, True))
                q.pop(0)
                del self._streams[st.rid]
            elif st.buffered >= n or (st.lm_done and st.buffered):
                m = min(n, st.buffered)
                codes[s, :, :m] = st.take(m)
                active[s] = True
                reset[s] = st.needs_reset
                st.needs_reset = False
                done = st.lm_done and not st.buffered
                emits.append((s, st, m, done))
                if done:
                    q.pop(0)
                    del self._streams[st.rid]
        audio = None
        if active.any():
            if self._vdev is not None:
                import jax

                codes, active, reset = (
                    jax.device_put(a, self._vdev)
                    for a in (codes, active, reset)
                )
            self._state, audio = self._decode(
                self._vparams, self._state, jnp.asarray(codes),
                jnp.asarray(active), jnp.asarray(reset),
            )
            # begin the device->host PCM transfer NOW: by the time next
            # round's _emit forces it, the copy has overlapped this round's
            # bookkeeping and next round's LM-chunk wait (the transfer was
            # ~45% of the round's wall when fetched synchronously —
            # scripts/profile_serving.py)
            try:
                audio.copy_to_host_async()
            except Exception:  # noqa: BLE001 — optional fast path only
                pass
        nxt = (audio, emits) if (audio is not None or emits) else None
        out = self._emit(*self._pending) if self._pending is not None else []
        self._pending = nxt
        return instant_done + out

    def _emit(self, audio, emits) -> list[AudioEvent]:
        fl = self._tts._vocoder_cfg.frame_length
        arr = None
        if audio is not None:
            with self._tts._engine.metrics.span("vocoder"):
                arr = np.asarray(audio)  # int16 PCM; ONE (async-begun) fetch
        return [
            AudioEvent(
                st.rid,
                arr[s, 0, : m * fl].tobytes() if m else b"",
                done, st.frames_total,
            )
            for s, st, m, done in emits
            if st.rid not in self._cancel_drop
        ]

    @property
    def busy(self) -> bool:
        return (
            self._srv.busy
            or self._pending is not None
            or any(self._slot_q)
            or bool(self._chain_retry)
        )

    def run(self) -> Iterator[AudioEvent]:
        """Drive the session until the queue and all slots drain."""
        while self.busy:
            yield from self.step()

    def warmup(self) -> None:
        """Compile the pool programs before the first real request.

        Engine warmup (``FishTTS(warmup=True)``) covers only the
        single-stream programs; the pool's admission, batched decode round
        and slot-pool vocoder programs would otherwise compile on the FIRST
        request's critical path (tens of seconds on remote-compile
        platforms — enough to blow a request ``timeout_s``).  Drains one
        tiny request through the session; all pool programs are shaped by
        the slot count, not the request, so this covers steady state."""
        t0 = time.perf_counter()
        self.submit("Warm up.", max_new_tokens=2 * self._n, seed=0)
        for _ in self.run():
            pass  # discard the warmup request's audio
        logger.info("Serve pool warmup (%d slots) in %.1fs",
                    self._slots, time.perf_counter() - t0)


def get_instance(
    model_dir: str | Path | None = None,
    device: Literal["tpu", "cpu", "cuda"] = "tpu",
    precision: Literal["bf16", "fp16", "fp32", "int8"] = "bf16",
    warmup: bool = True,
    engine_config=None,
) -> FishTTS:
    """Get or create the singleton FishTTS instance (reference
    synthesizer.py:661-710: double-checked lock, one model per process)."""
    global _instance
    if _instance is not None:
        return _instance
    with _instance_lock:
        if _instance is not None:
            return _instance
        logger.info("Creating singleton FishTTS instance...")
        _instance = FishTTS(
            model_dir=model_dir, device=device, precision=precision,
            warmup=warmup, engine_config=engine_config,
        )
        return _instance


def reset_instance() -> None:
    """Reset the singleton instance (reference synthesizer.py:713-719)."""
    global _instance
    with _instance_lock:
        if _instance is not None:
            logger.info("Resetting singleton FishTTS instance")
            _instance = None
