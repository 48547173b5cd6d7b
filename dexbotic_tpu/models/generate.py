"""Autoregressive text generation as one compiled prefill + decode scan.

Replaces the reference's HF GenerationMixin usage (dexbotic_arch.py:415) with
a fixed-length `lax.scan` decode loop over the functional KV cache: greedy
when temperature == 0, categorical sampling otherwise; early tokens after an
EOS are replaced by pad and masked out.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from dexbotic_tpu.models.vlm import VLMConfig, vlm_forward
from dexbotic_tpu.nn.transformer import embed_tokens, init_kv_cache, lm_logits


def generate(
    params,
    cfg: VLMConfig,
    input_ids: jnp.ndarray,  # int[B, S] prompt (right-padded)
    valid: jnp.ndarray,  # bool[B, S]
    images: Optional[jnp.ndarray],
    max_new_tokens: int,
    eos_token_id: int,
    pad_token_id: int = 0,
    temperature: float = 0.0,
    rng: Optional[jax.Array] = None,
    inputs_embeds: Optional[jnp.ndarray] = None,  # pre-spliced prompt embeds
):
    """Returns (tokens int[B, max_new_tokens], logprobs float[B, max_new_tokens]).

    Positions/attention groups continue causally from each row's true prompt
    length, so right-padding does not shift RoPE (the decode-stage mask
    rebuild of dexbotic_arch.py:375-412 falls out of the grp/valid scheme).
    Callers with custom token fusion (e.g. MUVLA's map+obs tokens) pass
    `inputs_embeds` directly (the reference's custom
    prepare_inputs_for_generation, muvla_arch.py:609-682).
    """
    B, S = input_ids.shape
    valid = valid.astype(jnp.int32)
    cache = init_kv_cache(cfg.llm, B, S + max_new_tokens, dtype=jnp.bfloat16)
    hidden, cache = vlm_forward(
        params, cfg, input_ids, valid, images=images, cache=cache,
        update_cache=True, inputs_embeds=inputs_embeds,
    )

    # logits at each row's last valid prompt token
    last_idx = jnp.sum(valid, axis=1) - 1
    last_hidden = jnp.take_along_axis(hidden, last_idx[:, None, None], axis=1)[:, 0]
    prompt_len = jnp.sum(valid, axis=1)  # [B]

    if rng is None:
        rng = jax.random.PRNGKey(0)

    def sample(logits, r):
        logits = logits.astype(jnp.float32)
        if temperature and temperature > 0:
            tok = jax.random.categorical(r, logits / temperature, axis=-1)
        else:
            tok = jnp.argmax(logits, axis=-1)
        logp = jax.nn.log_softmax(logits, axis=-1)
        return tok.astype(jnp.int32), jnp.take_along_axis(logp, tok[:, None], axis=-1)[:, 0]

    def step(carry, r):
        cache, prev_hidden, done, t = carry
        logits = lm_logits(params["llm"], cfg.llm, prev_hidden)
        tok, logp = sample(logits, r)
        tok = jnp.where(done, pad_token_id, tok)
        new_done = done | (tok == eos_token_id)

        emb = embed_tokens(params["llm"], cfg.llm, tok[:, None], dtype=prev_hidden.dtype)
        pos = (prompt_len + t)[:, None]
        grp = pos + 1
        step_valid = jnp.where(done, 0, 1)[:, None].astype(jnp.int32)
        hidden, cache = vlm_forward(
            params, cfg, tok[:, None], step_valid, inputs_embeds=emb,
            positions=pos, grp=grp, cache=cache, update_cache=True,
        )
        return (cache, hidden[:, 0], new_done, t + 1), (tok, logp)

    rngs = jax.random.split(rng, max_new_tokens)
    done0 = jnp.zeros((B,), bool)
    (_, _, _, _), (tokens, logps) = jax.lax.scan(
        step, (cache, last_hidden, done0, jnp.asarray(0, jnp.int32)), rngs
    )
    return tokens.T, logps.T  # [B, T]
