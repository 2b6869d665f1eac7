"""Speculative (assisted) greedy decoding: student drafts, teacher verifies.

TPU-native counterpart of the reference's assistant-model decoding
(training/run_eval.py:524-545, flax/run_speculative_decoding.py): the
distilled 2-layer student drafts K tokens with cheap cached steps, the
teacher verifies the whole draft with ONE multi-token `extend` pass, and the
longest agreeing prefix plus the teacher's correction token are accepted.
Greedy-exact: the output token stream is identical to teacher-only greedy
decoding with the same rule stack.

Like HF assisted generation (and the reference's usage), batch size is 1 —
ragged per-row acceptance does not batch. Throughput comes from the teacher
doing ~(accepted+1) tokens per forward pass.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp

from ..models import whisper as M
from ..models.config import DtypePolicy, WhisperConfig
from .rules import DecodeRules, apply_rules


@dataclasses.dataclass
class SpecDecodeResult:
    tokens: jnp.ndarray  # [1, max_len]
    length: jnp.ndarray  # scalar: sampled tokens excl. prefix and eot
    draft_accept_rate: jnp.ndarray  # scalar fp32 in [0, 1]
    rounds: jnp.ndarray  # scalar int32: number of teacher passes


jax.tree_util.register_dataclass(
    SpecDecodeResult,
    data_fields=["tokens", "length", "draft_accept_rate", "rounds"],
    meta_fields=[],
)


def speculative_decode(
    teacher_params,
    teacher_config: WhisperConfig,
    student_params,
    student_config: WhisperConfig,
    teacher_enc: jnp.ndarray,  # [1, T, d_teacher]
    student_enc: jnp.ndarray,  # [1, T, d_student] (same array when shared)
    prefix: jnp.ndarray,  # [1, P]
    rules: DecodeRules,
    policy: DtypePolicy = DtypePolicy(),
    *,
    num_draft_tokens: int = 5,
    max_len: Optional[int] = None,
) -> SpecDecodeResult:
    k = num_draft_tokens
    b, p_len = prefix.shape
    assert b == 1, "speculative decoding is per-utterance (batch=1)"
    max_len = max_len or teacher_config.max_target_positions
    eot = rules.eot
    ts_begin = rules.timestamp_begin

    suppress = jnp.asarray(rules.suppress_mask())
    begin_suppress = jnp.asarray(rules.begin_suppress_mask())

    t_cross = M.precompute_cross_kv(teacher_params, teacher_enc, teacher_config, policy)
    s_cross = M.precompute_cross_kv(student_params, student_enc, student_config, policy)
    t_cache = M.init_cache(teacher_config, 1, max_len, policy.compute_dtype)
    s_cache = M.init_cache(student_config, 1, max_len, policy.compute_dtype)

    # prefill both models on the prompt; teacher's last-position logits seed
    # the loop (position p_len-1 predicts position p_len)
    t_logits, t_cache, _ = M.prefill(
        teacher_params, t_cross, t_cache, prefix, teacher_config, policy
    )
    _, s_cache, _ = M.prefill(
        student_params, s_cross, s_cache, prefix, student_config, policy
    )

    tokens = jnp.full((1, max_len), eot, jnp.int32)
    tokens = jax.lax.dynamic_update_slice(tokens, prefix, (0, 0))

    def rule_args(tokens, i, last_ts):
        last = jax.lax.dynamic_index_in_dim(tokens, i - 1, axis=1, keepdims=False)
        penult = jax.lax.dynamic_index_in_dim(
            tokens, jnp.maximum(i - 2, 0), axis=1, keepdims=False
        )
        return dict(
            step=i - p_len, last_token=last, penult_token=penult,
            last_timestamp=last_ts, rules=rules, suppress=suppress,
            begin_suppress=begin_suppress,
        )

    def pick(logits, tokens, i, last_ts):
        masked = apply_rules(logits, **rule_args(tokens, i, last_ts))
        return jnp.argmax(masked, axis=-1).astype(jnp.int32)

    def upd_ts(tok, last_ts):
        return jnp.where(tok >= ts_begin, tok, last_ts)

    state = dict(
        t_cache=t_cache,
        s_cache=s_cache,
        t_logits=t_logits,  # teacher logits predicting position `cur`
        tokens=tokens,
        cur=jnp.int32(p_len),
        last_ts=jnp.zeros((1,), jnp.int32),
        finished=jnp.zeros((), bool),
        accepted=jnp.int32(0),
        drafted=jnp.int32(0),
        rounds=jnp.int32(0),
    )

    def cond(s):
        return jnp.logical_and(s["cur"] < max_len - (k + 1), ~s["finished"])

    def body(s):
        cur = s["cur"]
        tokens = s["tokens"]
        # --- token at `cur` comes from the teacher's current logits --------
        tok0 = pick(s["t_logits"], tokens, cur, s["last_ts"])  # [1]
        tokens = jax.lax.dynamic_update_slice(tokens, tok0[:, None], (0, cur))
        last_ts = upd_ts(tok0, s["last_ts"])

        # --- student drafts k tokens after tok0 ----------------------------
        # student cache is valid below cur; feed tok0 then draft greedily
        s_cache = s["s_cache"]
        draft_tokens = []
        tok = tok0
        d_tokens = tokens
        d_ts = last_ts
        for j in range(k):
            logits, s_cache = M.decode_step(
                student_params, s_cross, s_cache, tok, cur + j,
                student_config, policy,
                unroll=min(student_config.decoder_layers, 8),
            )
            nxt = pick(logits, d_tokens, cur + j + 1, d_ts)
            d_tokens = jax.lax.dynamic_update_slice(
                d_tokens, nxt[:, None], (0, cur + j + 1)
            )
            d_ts = upd_ts(nxt, d_ts)
            draft_tokens.append(nxt)
            tok = nxt
        draft = jnp.concatenate([d[:, None] for d in draft_tokens], axis=1)  # [1,k]

        # --- teacher verifies tok0 + draft in one extend pass --------------
        chunk = jnp.concatenate([tok0[:, None], draft], axis=1)  # [1, k+1]
        t_logits_all, t_cache = M.extend(
            teacher_params, t_cross, s["t_cache"], chunk, cur,
            teacher_config, policy,
        )  # logits[:, j] predicts position cur+j+1

        # teacher's choice at each draft position (with rules)
        t_choice = []
        v_ts = last_ts
        v_tokens = d_tokens
        for j in range(k):
            c = pick(t_logits_all[:, j], v_tokens, cur + j + 1, v_ts)
            t_choice.append(c)
            v_ts = upd_ts(c, v_ts)  # approximates per-prefix ts; exact when accepted
        t_choice_arr = jnp.concatenate([c[:, None] for c in t_choice], axis=1)

        # longest agreeing prefix
        agree = (t_choice_arr == draft)[0]  # [k]
        n_accept = jnp.argmin(
            jnp.concatenate([agree.astype(jnp.int32), jnp.zeros((1,), jnp.int32)])
        )  # first False index == number of accepted drafts

        # final token stream for this round: tok0, draft[:n_accept] are in
        # d_tokens already; positions beyond cur + n_accept are stale
        new_cur = cur + 1 + n_accept
        # rewrite stale positions beyond the accepted prefix with eot
        pos = jnp.arange(max_len)[None, :]
        tokens = jnp.where(pos < new_cur, d_tokens, eot)

        # recompute last_ts over the accepted region only
        acc_ts = last_ts
        for j in range(k):
            tj = draft[:, j]
            acc_ts = jnp.where(j < n_accept, upd_ts(tj, acc_ts), acc_ts)

        # teacher logits that predict position new_cur: index n_accept
        next_logits = t_logits_all[:, n_accept]

        # eot anywhere in the accepted stream (tok0 or accepted drafts)?
        acc_finished = tok0[0] == eot
        for j in range(k):
            acc_finished = jnp.logical_or(
                acc_finished, jnp.logical_and(j < n_accept, draft[0, j] == eot)
            )

        return dict(
            t_cache=t_cache,
            s_cache=s_cache,
            t_logits=next_logits,
            tokens=tokens,
            cur=new_cur,
            last_ts=acc_ts,
            finished=acc_finished,
            accepted=s["accepted"] + n_accept,
            drafted=s["drafted"] + k,
            rounds=s["rounds"] + 1,
        )

    s = jax.lax.while_loop(cond, body, state)

    # tail: if we stopped near max_len without eot, finish with plain steps
    def tail_cond(st):
        return jnp.logical_and(st["cur"] < max_len, ~st["finished"])

    def tail_body(st):
        cur = st["cur"]
        tok = pick(st["t_logits"], st["tokens"], cur, st["last_ts"])
        tokens = jax.lax.dynamic_update_slice(st["tokens"], tok[:, None], (0, cur))
        logits, t_cache = M.decode_step(
            teacher_params, t_cross, st["t_cache"], tok, cur,
            teacher_config, policy,
            unroll=(teacher_config.decoder_layers
                    if teacher_config.decoder_layers <= 8 else 4),
        )
        return dict(
            st,
            t_cache=t_cache,
            t_logits=logits,
            tokens=tokens,
            cur=cur + 1,
            last_ts=upd_ts(tok, st["last_ts"]),
            finished=jnp.logical_or(st["finished"], tok[0] == eot),
        )

    s = jax.lax.while_loop(tail_cond, tail_body, s)

    n_tokens = s["cur"] - p_len
    eot_mask = s["tokens"][0, p_len:] == eot
    length = jnp.where(
        jnp.any(eot_mask), jnp.argmax(eot_mask), n_tokens
    ).astype(jnp.int32)
    # scrub accepted-but-past-eot positions so the buffer matches plain greedy
    pos = jnp.arange(max_len)[None, :]
    clean_tokens = jnp.where(pos < p_len + length, s["tokens"], eot)
    return SpecDecodeResult(
        tokens=clean_tokens,
        length=length,
        draft_accept_rate=s["accepted"] / jnp.maximum(s["drafted"], 1),
        rounds=s["rounds"],
    )
