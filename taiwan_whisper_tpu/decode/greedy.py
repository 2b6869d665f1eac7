"""KV-cached greedy / sampled decoding as a single `lax.while_loop`.

TPU-native replacement for the teacher-inference engine the reference buys
from CTranslate2 (pseudo-labelling/initial_inference.py:64-90) and from HF
`generate` (training/run_pseudo_labelling.py:918): one jit-compiled program
per (batch, max_len) shape — prompt prefill in one pass, then a while_loop
that early-exits when every sequence has emitted <|endoftext|>.

Temperature sampling is included because sequential long-form decoding
requires the (0.0 -> 1.0) temperature-fallback ladder
(training/run_eval.py:659-676).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..models import whisper as M
from ..models.config import DtypePolicy, WhisperConfig
from .rules import DecodeRules, apply_rules, greedy_rules_argmax


@dataclasses.dataclass
class DecodeResult:
    """tokens includes the prefix; positions past the first <|endoftext|>
    are filled with eot. lengths counts sampled tokens excluding eot."""

    tokens: jnp.ndarray  # [B, max_len] int32
    lengths: jnp.ndarray  # [B] int32
    sum_logprobs: jnp.ndarray  # [B] fp32 (sampled tokens incl. eot)
    no_speech_probs: jnp.ndarray  # [B] fp32


jax.tree_util.register_dataclass(
    DecodeResult,
    data_fields=["tokens", "lengths", "sum_logprobs", "no_speech_probs"],
    meta_fields=[],
)


def greedy_decode(
    params,
    enc_out: jnp.ndarray,  # [B, T_enc, d]
    prefix: jnp.ndarray,  # [B, P] int32: (prompt +) sot sequence
    config: WhisperConfig,
    rules: DecodeRules,
    policy: DtypePolicy = DtypePolicy(),
    *,
    max_len: Optional[int] = None,
    temperature: float = 0.0,
    rng: Optional[jax.Array] = None,
    sot_index: int = 0,  # position of <|startoftranscript|> in prefix
    valid_from: Optional[jnp.ndarray] = None,  # [B] for left-padded prompts
    quantize_cross_kv=0,  # 0/False off; True/8 int8; 4 int4; "fp8" e4m3;
    # "8x8" int8 storage + int8 x int8 MXU dots (accuracy-gated opt-in)
    scan_unroll: int = 0,  # decoder layer-scan unroll; 0 = auto (PERF.md:
    # full unroll for shallow decoders measured -28% step time on chip)
) -> DecodeResult:
    """Greedy (temperature==0) or sampled decode of a batch of utterances."""
    b, p_len = prefix.shape
    max_len = max_len or config.max_target_positions
    assert p_len < max_len
    if scan_unroll == 0:
        # FULL unroll removes the stacked-layer dynamic slicing and lets
        # XLA fuse across layer boundaries. Round-5 grid at large-v2 b16
        # int8: u1 171 / u4 114 / u8 107 / u16 102 / u32 249 audio-s/s —
        # full unroll is 2.2x the old auto(4); b32 reaches 288. The only
        # exception: very large batch x deep decoder programs crash the
        # TPU remote-compile helper (b48 u32, reproducible), so huge
        # batches fall back to unroll 1 (measured 2nd-best at b16).
        scan_unroll = (config.decoder_layers
                       if config.decoder_layers <= 8 or b <= 32 else 1)
    eot = rules.eot
    ts_begin = rules.timestamp_begin

    suppress = jnp.asarray(rules.suppress_mask())
    begin_suppress = jnp.asarray(rules.begin_suppress_mask())

    # quantization fused into the per-layer precompute scan: avoids an
    # O(full-KV) fp32 temp that OOMs v5e at large-v2 shapes (PERF.md r3)
    int8_dots = quantize_cross_kv == "8x8"
    cross_kv = M.precompute_cross_kv(
        params, enc_out, config, policy,
        quantize=(quantize_cross_kv
                  if quantize_cross_kv in (4, "fp8") else 8)
        if quantize_cross_kv else 0,
    )
    cache = M.init_cache(config, b, max_len, dtype=policy.compute_dtype)
    logits0, cache, sot_logits = M.prefill(
        params, cross_kv, cache, prefix, config, policy,
        valid_from=valid_from, aux_index=sot_index, int8_dots=int8_dots,
    )
    # P(<|nospeech|>) read at the <|startoftranscript|> position, the
    # no-speech detection signal of long-form decoding (Whisper paper §4.5).
    no_speech_probs = jax.nn.softmax(sot_logits, axis=-1)[:, rules.no_speech]

    tokens = jnp.full((b, max_len), eot, jnp.int32)
    tokens = jax.lax.dynamic_update_slice(tokens, prefix, (0, 0))

    if rng is None:
        rng = jax.random.PRNGKey(0)

    state = dict(
        cache=cache,
        logits=logits0,
        tokens=tokens,
        cur=jnp.int32(p_len),
        last_ts=jnp.zeros((b,), jnp.int32),
        finished=jnp.zeros((b,), bool),
        sum_logprobs=jnp.zeros((b,), jnp.float32),
        lengths=jnp.zeros((b,), jnp.int32),
        rng=rng,
    )

    def cond(s):
        return jnp.logical_and(s["cur"] < max_len, ~jnp.all(s["finished"]))

    def body(s):
        i = s["cur"]
        step = i - p_len
        last = jax.lax.dynamic_index_in_dim(s["tokens"], i - 1, axis=1, keepdims=False)
        penult = jax.lax.dynamic_index_in_dim(
            s["tokens"], jnp.maximum(i - 2, 0), axis=1, keepdims=False
        )
        rng, sub = jax.random.split(s["rng"])
        if temperature == 0.0:
            # fused rules+argmax+logprob: ~3 passes over [B, V] instead of
            # ~8 (PERF.md step-sequencing lever)
            nxt, logprob = greedy_rules_argmax(
                s["logits"],
                step=step,
                last_token=last,
                penult_token=penult,
                last_timestamp=s["last_ts"],
                rules=rules,
                suppress=suppress,
                begin_suppress=begin_suppress,
            )
        else:
            masked = apply_rules(
                s["logits"],
                step=step,
                last_token=last,
                penult_token=penult,
                last_timestamp=s["last_ts"],
                rules=rules,
                suppress=suppress,
                begin_suppress=begin_suppress,
            )
            nxt = jax.random.categorical(sub, masked / temperature, axis=-1).astype(
                jnp.int32
            )
            # logprob of the sampled token without materialising a second
            # [B, V] fp32 log_softmax: gather the chosen logit, subtract lse
            chosen = jnp.take_along_axis(masked, nxt[:, None], axis=-1)[:, 0]
            logprob = chosen - jax.nn.logsumexp(masked, axis=-1)
        active = ~s["finished"]
        nxt = jnp.where(active, nxt, eot)
        sum_logprobs = s["sum_logprobs"] + jnp.where(active, logprob, 0.0)
        lengths = s["lengths"] + jnp.where(
            jnp.logical_and(active, nxt != eot), 1, 0
        ).astype(jnp.int32)
        last_ts = jnp.where(
            jnp.logical_and(active, nxt >= ts_begin), nxt, s["last_ts"]
        )
        tokens = jax.lax.dynamic_update_slice(s["tokens"], nxt[:, None], (0, i))
        finished = jnp.logical_or(s["finished"], nxt == eot)
        logits, cache = M.decode_step(
            params, cross_kv, s["cache"], nxt, i, config, policy,
            valid_from=valid_from, unroll=scan_unroll, int8_dots=int8_dots,
        )
        return dict(
            cache=cache,
            logits=logits,
            tokens=tokens,
            cur=i + 1,
            last_ts=last_ts,
            finished=finished,
            sum_logprobs=sum_logprobs,
            lengths=lengths,
            rng=rng,
        )

    s = jax.lax.while_loop(cond, body, state)
    return DecodeResult(
        tokens=s["tokens"],
        lengths=s["lengths"],
        sum_logprobs=s["sum_logprobs"],
        no_speech_probs=no_speech_probs,
    )
