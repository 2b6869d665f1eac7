"""Whisper decoding rules (logits processors) as pure JAX functions.

Token-for-token parity with the HF/OpenAI rule set is where WER/CER parity
lives (SURVEY.md §7.3 ranks it the #1 hard part); the reference delegates all
of it to HF generate / faster-whisper internals (e.g.
training/flax/distil_whisper/modeling_flax_whisper.py:1977-2067 wires
FlaxWhisperTimeStampLogitsProcessor + static forced ids). Here the rules are
a single function over (logits, small decode state), usable inside
`lax.while_loop` for greedy and beam alike.

State needed by the rules is three scalars per sequence — last token,
penultimate token, most recent timestamp — rather than a scan over the token
buffer, exploiting that Whisper timestamps are non-decreasing by induction.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..text.tokenizer import (
    BEGIN_SUPPRESS_TOKENS,
    NON_SPEECH_TOKENS,
    SpecialTokens,
)

NEG_INF = float(np.finfo(np.float32).min)


@dataclasses.dataclass(frozen=True)
class DecodeRules:
    """Static decode-rule configuration, hashable for jit closure."""

    vocab_size: int
    eot: int
    timestamp_begin: int
    no_timestamps: int
    no_speech: int = 50362
    timestamps: bool = True
    max_initial_timestamp_index: Optional[int] = 50  # 1.0 s
    suppress_tokens: tuple = tuple(NON_SPEECH_TOKENS)
    begin_suppress_tokens: tuple = tuple(BEGIN_SUPPRESS_TOKENS)

    @classmethod
    def from_special(
        cls, special: SpecialTokens, timestamps: bool = True, **kw
    ) -> "DecodeRules":
        return cls(
            vocab_size=special.vocab_size,
            eot=special.eot,
            timestamp_begin=special.timestamp_begin,
            no_timestamps=special.no_timestamps,
            no_speech=special.no_speech,
            timestamps=timestamps,
            **kw,
        )

    def suppress_mask(self) -> np.ndarray:
        """[V] bool — True where the token is always suppressed."""
        m = np.zeros((self.vocab_size,), dtype=bool)
        toks = [t for t in self.suppress_tokens if t < self.vocab_size]
        m[toks] = True
        if self.timestamps:
            m[self.no_timestamps] = True
        else:
            m[self.timestamp_begin:] = True
        return m

    def begin_suppress_mask(self) -> np.ndarray:
        m = np.zeros((self.vocab_size,), dtype=bool)
        toks = [t for t in self.begin_suppress_tokens if t < self.vocab_size]
        m[toks] = True
        return m


def apply_rules(
    logits: jnp.ndarray,  # [B, V] fp32
    *,
    step: jnp.ndarray,  # scalar int32: sampling step within the sample (0-based)
    last_token: jnp.ndarray,  # [B] int32 token at position-1 (forced/prev)
    penult_token: jnp.ndarray,  # [B] int32 token at position-2
    last_timestamp: jnp.ndarray,  # [B] int32 most recent timestamp id (0 = none)
    rules: DecodeRules,
    suppress: jnp.ndarray,  # [V] bool from rules.suppress_mask()
    begin_suppress: jnp.ndarray,  # [V] bool
) -> jnp.ndarray:
    """Apply the full Whisper rule stack; returns masked logits [B, V]."""
    v = rules.vocab_size
    ts_begin = rules.timestamp_begin
    token_ids = jax.lax.broadcasted_iota(jnp.int32, (1, v), 1)

    # 1) static suppress list (+ <|notimestamps|> when timestamps are on)
    logits = jnp.where(suppress[None, :], NEG_INF, logits)
    # 2) begin-suppress (" " and <|endoftext|>) at the first sampling step
    logits = jnp.where(
        jnp.logical_and(step == 0, begin_suppress[None, :]), NEG_INF, logits
    )

    if not rules.timestamps:
        return logits

    is_ts_col = token_ids >= ts_begin  # [1, V]

    last_was_ts = jnp.logical_and(step >= 1, last_token >= ts_begin)  # [B]
    penult_was_ts = jnp.logical_or(step < 2, penult_token >= ts_begin)  # [B]

    # 3) pairing rules:
    #    last ts & penult ts   -> a pair just closed: next must be text/eot
    #    last ts & penult text -> pair open: next must be a timestamp or eot
    pair_closed = jnp.logical_and(last_was_ts, penult_was_ts)[:, None]
    pair_open = jnp.logical_and(last_was_ts, ~penult_was_ts)[:, None]
    logits = jnp.where(jnp.logical_and(pair_closed, is_ts_col), NEG_INF, logits)
    logits = jnp.where(
        jnp.logical_and(pair_open, token_ids < rules.eot), NEG_INF, logits
    )

    # 4) timestamps are non-decreasing: suppress ids in [ts_begin, floor)
    #    where floor = last_ts when an open pair may repeat it, else last_ts+1
    have_ts = last_timestamp > 0
    floor = jnp.where(pair_open[:, 0], last_timestamp, last_timestamp + 1)
    below = jnp.logical_and(token_ids >= ts_begin, token_ids < floor[:, None])
    logits = jnp.where(jnp.logical_and(have_ts[:, None], below), NEG_INF, logits)

    # 5) first sampling step must be a timestamp, within the initial window
    at_begin = step == 0
    logits = jnp.where(jnp.logical_and(at_begin, ~is_ts_col), NEG_INF, logits)
    if rules.max_initial_timestamp_index is not None:
        too_late = token_ids > ts_begin + rules.max_initial_timestamp_index
        logits = jnp.where(jnp.logical_and(at_begin, too_late), NEG_INF, logits)

    # 6) if total timestamp probability beats the best text token, force a
    #    timestamp (the probabilistic rule from the Whisper paper §4.5)
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    ts_logprob = jax.nn.logsumexp(
        jnp.where(is_ts_col, logprobs, NEG_INF), axis=-1
    )  # [B]
    max_text = jnp.max(jnp.where(is_ts_col, NEG_INF, logprobs), axis=-1)  # [B]
    force_ts = (ts_logprob > max_text)[:, None]
    logits = jnp.where(jnp.logical_and(force_ts, ~is_ts_col), NEG_INF, logits)
    return logits


def _rule_mask(
    *,
    step,
    last_token,
    penult_token,
    last_timestamp,
    rules: DecodeRules,
    suppress,
    begin_suppress,
    token_ids,  # [1, V] iota
):
    """[B, V] bool — True where rules 1-5 suppress the token. One fused
    elementwise expression instead of a chain of jnp.where passes."""
    ts_begin = rules.timestamp_begin
    is_ts_col = token_ids >= ts_begin  # [1, V]
    at_begin = step == 0

    mask = suppress[None, :] | (at_begin & begin_suppress[None, :])
    if not rules.timestamps:
        return mask

    last_was_ts = jnp.logical_and(step >= 1, last_token >= ts_begin)  # [B]
    penult_was_ts = jnp.logical_or(step < 2, penult_token >= ts_begin)
    pair_closed = (last_was_ts & penult_was_ts)[:, None]
    pair_open = (last_was_ts & ~penult_was_ts)[:, None]
    mask = mask | (pair_closed & is_ts_col)
    mask = mask | (pair_open & (token_ids < rules.eot))

    have_ts = (last_timestamp > 0)[:, None]
    floor = jnp.where(pair_open[:, 0], last_timestamp, last_timestamp + 1)
    mask = mask | (have_ts & is_ts_col & (token_ids < floor[:, None]))

    mask = mask | (at_begin & ~is_ts_col)
    if rules.max_initial_timestamp_index is not None:
        mask = mask | (
            at_begin & (token_ids > ts_begin + rules.max_initial_timestamp_index)
        )
    return mask


def greedy_rules_argmax(
    logits: jnp.ndarray,  # [B, V] fp32
    *,
    step: jnp.ndarray,
    last_token: jnp.ndarray,
    penult_token: jnp.ndarray,
    last_timestamp: jnp.ndarray,
    rules: DecodeRules,
    suppress: jnp.ndarray,
    begin_suppress: jnp.ndarray,
):
    """Fused rules + argmax + normalised logprob for the greedy decode loop.

    Equivalent to ``apply_rules`` followed by argmax and
    ``chosen - logsumexp(masked)``, but in ~3 passes over [B, V] instead of
    ~8 (PERF.md "step-sequencing overhead" lever): rule 6's force-timestamp
    comparison is shift-invariant, so the full log_softmax it nominally
    needs reduces to region-wise (max, argmax, logsumexp) over the MASKED
    logits — text region [0, ts_begin) and timestamp region [ts_begin, V).

    Returns (next_token [B] int32, logprob [B] fp32).
    """
    v = rules.vocab_size
    ts_begin = rules.timestamp_begin
    token_ids = jax.lax.broadcasted_iota(jnp.int32, (1, v), 1)
    mask = _rule_mask(
        step=step, last_token=last_token, penult_token=penult_token,
        last_timestamp=last_timestamp, rules=rules, suppress=suppress,
        begin_suppress=begin_suppress, token_ids=token_ids,
    )
    masked = jnp.where(mask, NEG_INF, logits)  # [B, V]

    if not rules.timestamps:
        nxt = jnp.argmax(masked, axis=-1).astype(jnp.int32)
        chosen = jnp.take_along_axis(masked, nxt[:, None], axis=-1)[:, 0]
        return nxt, chosen - jax.nn.logsumexp(masked, axis=-1)

    is_ts_col = token_ids >= ts_begin  # [1, V]
    text = jnp.where(is_ts_col, NEG_INF, masked)
    tstamp = jnp.where(is_ts_col, masked, NEG_INF)
    # region maxima/argmaxima and logsumexps (XLA fuses the four reductions
    # over one read of `masked`; the sum-exp pass re-reads once more)
    max_text = jnp.max(text, axis=-1)
    arg_text = jnp.argmax(text, axis=-1).astype(jnp.int32)
    max_ts = jnp.max(tstamp, axis=-1)
    arg_ts = jnp.argmax(tstamp, axis=-1).astype(jnp.int32)
    lse_text = max_text + jnp.log(
        jnp.sum(jnp.exp(text - max_text[:, None]), axis=-1)
    )
    lse_ts = max_ts + jnp.log(
        jnp.sum(jnp.exp(tstamp - max_ts[:, None]), axis=-1)
    )
    # rule 6, shift-invariant form: sum of timestamp probs beats best text
    force_ts = lse_ts > max_text
    take_ts = force_ts | (max_ts > max_text)  # argmax tie -> text (lower id)
    nxt = jnp.where(take_ts, arg_ts, arg_text)
    chosen = jnp.where(take_ts, max_ts, max_text)
    lse_all = jnp.logaddexp(lse_text, lse_ts)
    lse = jnp.where(force_ts, lse_ts, lse_all)
    return nxt, chosen - lse
