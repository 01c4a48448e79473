"""Numeric cross-validation of the JAX DualAR LM against the reference torch
implementation (/root/reference/fish_tts/models/llama.py).

The reference model is loaded read-only via importlib with a stub ``fish_tts``
package (its tokenizer import is only needed for type references), built at a
tiny config, and its ``state_dict()`` is run through our checkpoint converter
— exactly the path real checkpoints take.  Then:

- whole-prompt ``forward_generate`` (prefill): logits + hidden parity,
- single-step ``forward_generate`` at the next position: parity,
- the full ``forward_generate_fast`` codebook loop with a fixed code
  sequence: per-step logits parity.

All in fp32 (both sides keep the deliberate bf16 RoPE table quirk).
"""

from __future__ import annotations

import importlib.util
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from fish_tts_tpu.config import DualARConfig
from fish_tts_tpu.models import dual_ar
from fish_tts_tpu.models.dual_ar import TokenIds
from fish_tts_tpu.utils.checkpoint import convert_lm_state_dict

SEM_BEGIN, SEM_END = 400, 447
IDS = TokenIds(semantic_begin=SEM_BEGIN, semantic_end=SEM_END, im_end=5)
NEG = float(np.finfo(np.float32).min)


def _load_reference_llama():
    """Import the reference llama module with a stub fish_tts package."""
    if "fish_tts.models.llama" in sys.modules:
        return sys.modules["fish_tts.models.llama"]
    pkg = types.ModuleType("fish_tts")
    pkg.__path__ = []
    models = types.ModuleType("fish_tts.models")
    models.__path__ = []
    tok_mod = types.ModuleType("fish_tts.models.tokenizer")

    class FishTokenizer:  # reference llama.py only type-references this
        pass

    tok_mod.FishTokenizer = FishTokenizer
    sys.modules["fish_tts"] = pkg
    sys.modules["fish_tts.models"] = models
    sys.modules["fish_tts.models.tokenizer"] = tok_mod
    spec = importlib.util.spec_from_file_location(
        "fish_tts.models.llama", "/root/reference/fish_tts/models/llama.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["fish_tts.models.llama"] = mod
    spec.loader.exec_module(mod)
    return mod


class _StubTokenizer:
    """The minimal surface DualARTransformer uses from its tokenizer."""

    semantic_begin_id = SEM_BEGIN
    semantic_end_id = SEM_END
    semantic_id_to_token_id = {i: SEM_BEGIN + i for i in range(48)}

    def get_token_id(self, token):
        return 5


CFG = DualARConfig(
    vocab_size=512,
    n_layer=2,
    n_head=4,
    n_local_heads=2,
    dim=64,
    head_dim=16,
    intermediate_size=128,
    max_seq_len=64,
    num_codebooks=4,
    codebook_size=48,
    residual_codebook_size=24,
    n_fast_layer=2,
    fast_dim=64,
)


@pytest.fixture(scope="module")
def models():
    """(torch model with caches, jax params) sharing identical weights."""
    llama = _load_reference_llama()
    args = llama.DualARModelArgs(
        vocab_size=CFG.vocab_size,
        n_layer=CFG.n_layer,
        n_head=CFG.n_head,
        n_local_heads=CFG.n_local_heads,
        dim=CFG.dim,
        head_dim=CFG.head_dim,
        intermediate_size=CFG.intermediate_size,
        max_seq_len=CFG.max_seq_len,
        codebook_size=CFG.codebook_size,
        num_codebooks=CFG.num_codebooks,
        n_fast_layer=CFG.n_fast_layer,
        fast_dim=CFG.fast_dim,
        tie_word_embeddings=True,
    )
    torch.manual_seed(0)
    tmodel = llama.DualARTransformer(args, tokenizer=_StubTokenizer())
    tmodel = tmodel.float().eval()
    tmodel.setup_caches(1, CFG.max_seq_len, dtype=torch.float32)

    params = convert_lm_state_dict(tmodel.state_dict(), CFG)
    params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.float32), params)
    return tmodel, params


def _prompt(T: int, seed: int = 0) -> np.ndarray:
    """(1, 1+K, T) with a text prefix and a semantic-token tail."""
    rng = np.random.RandomState(seed)
    p = np.zeros((1, 1 + CFG.num_codebooks, T), np.int64)
    p[0, 0] = rng.randint(0, 300, T)
    sem = T // 2
    p[0, 0, sem:] = rng.randint(SEM_BEGIN, SEM_END + 1, T - sem)
    p[0, 1] = rng.randint(0, CFG.codebook_size, T)
    p[0, 2:] = rng.randint(0, CFG.residual_codebook_size, (CFG.num_codebooks - 1, T))
    return p


def _jax_slow_forward(params, prompt_np, positions_np, kv, offset):
    """Our slow forward at the given absolute positions (prefill or step)."""
    rope = dual_ar.make_rope_tables(CFG)
    prompt = jnp.asarray(prompt_np.astype(np.int32))
    B, _, T = prompt.shape
    S = kv["k"].shape[3]
    positions = jnp.asarray(positions_np.astype(np.int32))[None]  # (1, T)
    k_pos = jnp.arange(S, dtype=jnp.int32)
    cache_bias = jnp.broadcast_to(
        jnp.where(k_pos < offset, 0.0, NEG)[None, None, None, :].astype(jnp.float32),
        (B, 1, T, S),
    )
    t_idx = jnp.arange(T, dtype=jnp.int32)
    block_bias = jnp.where(t_idx[None, :] <= t_idx[:, None], 0.0, NEG)[
        None, None
    ].astype(jnp.float32)
    hidden, kv = dual_ar.slow_forward(
        params, CFG, IDS, rope, prompt, positions, kv, cache_bias, block_bias
    )
    logits = dual_ar.lm_logits(params, CFG, hidden)
    return hidden, logits, kv


def test_prefill_logits_and_hidden_match(models):
    tmodel, params = models
    T = 12
    prompt = _prompt(T)

    with torch.no_grad():
        res = tmodel.forward_generate(
            torch.from_numpy(prompt), torch.arange(T)
        )
    t_logits = res.logits.numpy()[0, -1]  # (V,) last position
    t_hidden = res.hidden_states.numpy()[0, -1]  # (D,) pre-norm + fast bridge

    kv = dual_ar.init_kv_cache(CFG, 1, dtype=jnp.float32)
    hidden, logits, _ = _jax_slow_forward(params, prompt, np.arange(T), kv, 0)
    j_hidden = np.asarray(dual_ar.project_fast_in(params, hidden))[0, -1]
    j_logits = np.asarray(logits)[0, -1]

    np.testing.assert_allclose(j_hidden, t_hidden, rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(j_logits, t_logits, rtol=1e-4, atol=2e-5)


def test_single_step_logits_match_after_prefill(models):
    tmodel, params = models
    T = 10
    prompt = _prompt(T, seed=1)
    next_frame = _prompt(1, seed=2)  # one more column

    with torch.no_grad():
        tmodel.forward_generate(torch.from_numpy(prompt), torch.arange(T))
        res = tmodel.forward_generate(
            torch.from_numpy(next_frame), torch.tensor([T])
        )
    t_logits = res.logits.numpy()[0, -1]

    kv = dual_ar.init_kv_cache(CFG, 1, dtype=jnp.float32)
    _, _, kv = _jax_slow_forward(params, prompt, np.arange(T), kv, 0)
    _, logits, _ = _jax_slow_forward(params, next_frame, np.array([T]), kv, T)
    j_logits = np.asarray(logits)[0, -1]

    np.testing.assert_allclose(j_logits, t_logits, rtol=1e-4, atol=2e-5)


def test_fast_codebook_loop_matches(models):
    """Full decode_one_token_ar fast loop (inference.py:116-149): position-0
    write with discarded output, then per-codebook logits with a fixed code
    path fed to both implementations."""
    tmodel, params = models
    T = 8
    prompt = _prompt(T, seed=3)

    with torch.no_grad():
        res = tmodel.forward_generate(torch.from_numpy(prompt), torch.arange(T))
        hidden_t = res.hidden_states[:, -1:]  # (1, 1, D)

        # reference zeros the fast cache before each frame (inference.py:116-119)
        for layer in tmodel.fast_layers:
            layer.attention.kv_cache.k_cache.fill_(0)
            layer.attention.kv_cache.v_cache.fill_(0)
        tmodel.forward_generate_fast(hidden_t, torch.tensor([0]))

        codes = [7, 3, 19]  # fixed residual-codebook path
        t_logits_steps = []
        emb = tmodel.fast_embeddings(torch.tensor([[codes[0]]]))
        for cb in range(1, CFG.num_codebooks):
            lg = tmodel.forward_generate_fast(emb, torch.tensor([cb]))
            t_logits_steps.append(lg.numpy()[0, -1])
            emb = tmodel.fast_embeddings(torch.tensor([[codes[cb % len(codes)]]]))

    # JAX side
    kv = dual_ar.init_kv_cache(CFG, 1, dtype=jnp.float32)
    hidden, _, _ = _jax_slow_forward(params, prompt, np.arange(T), kv, 0)
    hidden_last = hidden[:, -1:]
    rope = dual_ar.make_rope_tables(CFG)
    h_fast = dual_ar.project_fast_in(params, hidden_last)
    cache = dual_ar.new_fast_cache(params, CFG, 1)
    _, cache = dual_ar.fast_step(params, CFG, rope, h_fast, jnp.int32(0), cache)

    emb = params["fast_embeddings"][jnp.asarray([[codes[0]]])]
    for cb in range(1, CFG.num_codebooks):
        lg, cache = dual_ar.fast_step(params, CFG, rope, emb, jnp.int32(cb), cache)
        np.testing.assert_allclose(
            np.asarray(lg)[0, -1], t_logits_steps[cb - 1], rtol=1e-4, atol=2e-5
        )
        emb = params["fast_embeddings"][jnp.asarray([[codes[cb % len(codes)]]])]


def test_scale_codebook_embeddings_variant(models):
    """The 1/sqrt(K+1) scaling branch (llama.py:425-429) also matches."""
    llama = _load_reference_llama()
    cfg = DualARConfig(
        vocab_size=512, n_layer=1, n_head=4, n_local_heads=2, dim=64,
        head_dim=16, intermediate_size=128, max_seq_len=32, num_codebooks=4,
        codebook_size=48, residual_codebook_size=24, n_fast_layer=1,
        fast_dim=64, scale_codebook_embeddings=True,
    )
    args = llama.DualARModelArgs(
        vocab_size=cfg.vocab_size, n_layer=cfg.n_layer, n_head=cfg.n_head,
        n_local_heads=cfg.n_local_heads, dim=cfg.dim, head_dim=cfg.head_dim,
        intermediate_size=cfg.intermediate_size, max_seq_len=cfg.max_seq_len,
        codebook_size=cfg.codebook_size, num_codebooks=cfg.num_codebooks,
        n_fast_layer=cfg.n_fast_layer, fast_dim=cfg.fast_dim,
        tie_word_embeddings=True, scale_codebook_embeddings=True,
    )
    torch.manual_seed(1)
    tmodel = llama.DualARTransformer(args, tokenizer=_StubTokenizer())
    tmodel = tmodel.float().eval()
    tmodel.setup_caches(1, cfg.max_seq_len, dtype=torch.float32)
    params = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.float32),
        convert_lm_state_dict(tmodel.state_dict(), cfg),
    )

    T = 6
    rng = np.random.RandomState(9)
    prompt = np.zeros((1, 1 + cfg.num_codebooks, T), np.int64)
    prompt[0, 0] = rng.randint(SEM_BEGIN, SEM_END + 1, T)
    prompt[0, 1:] = rng.randint(0, 24, (cfg.num_codebooks, T))

    with torch.no_grad():
        res = tmodel.forward_generate(torch.from_numpy(prompt), torch.arange(T))
    t_logits = res.logits.numpy()[0, -1]

    rope = dual_ar.make_rope_tables(cfg)
    kv = dual_ar.init_kv_cache(cfg, 1, dtype=jnp.float32)
    S = kv["k"].shape[3]
    k_pos = jnp.arange(S, dtype=jnp.int32)
    cache_bias = jnp.broadcast_to(
        jnp.where(k_pos < 0, 0.0, NEG)[None, None, None, :].astype(jnp.float32),
        (1, 1, T, S),
    )
    t_idx = jnp.arange(T, dtype=jnp.int32)
    block_bias = jnp.where(t_idx[None, :] <= t_idx[:, None], 0.0, NEG)[
        None, None
    ].astype(jnp.float32)
    hidden, _ = dual_ar.slow_forward(
        params, cfg, IDS, rope, jnp.asarray(prompt.astype(np.int32)),
        jnp.arange(T, dtype=jnp.int32)[None], kv, cache_bias, block_bias,
    )
    j_logits = np.asarray(dual_ar.lm_logits(params, cfg, hidden))[0, -1]
    np.testing.assert_allclose(j_logits, t_logits, rtol=1e-4, atol=2e-5)


# ---------------------------------------------------------------------------
# Production-scale shape parity: the tiny-config tests above pin the math;
# this pins the S1-mini GEOMETRY (dim 1024, 28 slow + 4 fast layers, vocab
# 155776, 10 codebooks, GQA 16/8 heads) against the same reference module
# with random weights on CPU — the environment has no egress, so real
# checkpoint weights cannot be downloaded; this is the closest executable
# proof that production-scale numerics and shape handling match (reference
# load contract: llama.py:466-500, synthesizer.py:272-284).
# ---------------------------------------------------------------------------

S1_SHAPE_CFG = DualARConfig(
    vocab_size=155776,
    n_layer=28,
    n_head=16,
    n_local_heads=8,
    dim=1024,
    head_dim=64,
    intermediate_size=4096,
    max_seq_len=32,      # cache sizing only — not a numerics shape
    num_codebooks=10,
    codebook_size=4096,
    n_fast_layer=4,
    fast_dim=1024,
    tie_word_embeddings=True,
)


def test_full_s1_shapes_one_frame_parity():
    """One prefill + one full fast-codebook frame at S1-mini shapes: logits
    and hidden parity vs the reference torch model (fp32 both sides)."""
    llama = _load_reference_llama()
    cfg = S1_SHAPE_CFG
    args = llama.DualARModelArgs(
        vocab_size=cfg.vocab_size,
        n_layer=cfg.n_layer,
        n_head=cfg.n_head,
        n_local_heads=cfg.n_local_heads,
        dim=cfg.dim,
        head_dim=cfg.head_dim,
        intermediate_size=cfg.intermediate_size,
        max_seq_len=cfg.max_seq_len,
        codebook_size=cfg.codebook_size,
        num_codebooks=cfg.num_codebooks,
        n_fast_layer=cfg.n_fast_layer,
        fast_dim=cfg.fast_dim,
        tie_word_embeddings=True,
    )
    torch.manual_seed(0)
    tmodel = llama.DualARTransformer(args, tokenizer=_StubTokenizer())
    tmodel = tmodel.float().eval()
    tmodel.setup_caches(1, cfg.max_seq_len, dtype=torch.float32)

    params = convert_lm_state_dict(tmodel.state_dict(), cfg)
    params = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.float32), params)

    T = 8
    rng = np.random.RandomState(7)
    prompt = np.zeros((1, 1 + cfg.num_codebooks, T), np.int64)
    prompt[0, 0] = rng.randint(0, 150000, T)
    prompt[0, 1] = rng.randint(0, cfg.codebook_size, T)
    prompt[0, 2:] = rng.randint(
        0, cfg.residual_codebook_size, (cfg.num_codebooks - 1, T))

    with torch.no_grad():
        res = tmodel.forward_generate(
            torch.from_numpy(prompt), torch.arange(T))
        t_logits = res.logits.numpy()[0, -1]
        t_hidden = res.hidden_states.numpy()[0, -1]

    rope = dual_ar.make_rope_tables(cfg)
    kv = dual_ar.init_kv_cache(cfg, 1, dtype=jnp.float32)
    S = kv["k"].shape[3]
    positions = jnp.arange(T, dtype=jnp.int32)[None]
    cache_bias = jnp.broadcast_to(
        jnp.full((S,), NEG, jnp.float32)[None, None, None, :], (1, 1, T, S))
    t_idx = jnp.arange(T, dtype=jnp.int32)
    block_bias = jnp.where(
        t_idx[None, :] <= t_idx[:, None], 0.0, NEG)[None, None].astype(
        jnp.float32)
    hidden, kv = dual_ar.slow_forward(
        params, cfg, IDS, rope, jnp.asarray(prompt.astype(np.int32)),
        positions, kv, cache_bias, block_bias)
    logits = dual_ar.lm_logits(params, cfg, hidden)
    j_hidden = np.asarray(dual_ar.project_fast_in(params, hidden))[0, -1]
    j_logits = np.asarray(logits)[0, -1]

    # 28 fp32 layers of divergence headroom: rel-tolerance on the spread
    span = np.abs(t_logits).max()
    assert np.abs(j_logits - t_logits).max() <= 2e-4 * span
    hspan = np.abs(t_hidden).max()
    assert np.abs(j_hidden - t_hidden).max() <= 2e-4 * hspan

    # one full fast frame with a fixed code path
    with torch.no_grad():
        hidden_t = res.hidden_states[:, -1:]
        for layer in tmodel.fast_layers:
            layer.attention.kv_cache.k_cache.fill_(0)
            layer.attention.kv_cache.v_cache.fill_(0)
        tmodel.forward_generate_fast(hidden_t, torch.tensor([0]))
        codes = [7, 901, 333]
        t_steps = []
        emb = tmodel.fast_embeddings(torch.tensor([[codes[0]]]))
        for cb in range(1, cfg.num_codebooks):
            lg = tmodel.forward_generate_fast(emb, torch.tensor([cb]))
            t_steps.append(lg.numpy()[0, -1])
            emb = tmodel.fast_embeddings(
                torch.tensor([[codes[cb % len(codes)]]]))

    h_fast = dual_ar.project_fast_in(params, hidden[:, -1:])
    cache = dual_ar.new_fast_cache(params, cfg, 1)
    _, cache = dual_ar.fast_step(
        params, cfg, rope, h_fast, jnp.int32(0), cache)
    emb = params["fast_embeddings"][jnp.asarray([[codes[0]]])]
    for cb in range(1, cfg.num_codebooks):
        lg, cache = dual_ar.fast_step(
            params, cfg, rope, emb, jnp.int32(cb), cache)
        fspan = np.abs(t_steps[cb - 1]).max()
        assert np.abs(
            np.asarray(lg)[0, -1] - t_steps[cb - 1]
        ).max() <= 2e-4 * fspan, f"fast step {cb} diverged"
        emb = params["fast_embeddings"][
            jnp.asarray([[codes[cb % len(codes)]]])]
