"""Batched beam search under jit — static [B, K] beam state, cache gather by
beam index, Whisper rule stack applied per beam.

Replaces the beam search the reference buys from CTranslate2
(pseudo-labelling/initial_inference.py:84-90, beam_size via faster-whisper)
and from HF generate (training/run_eval.py num_beams). Semantics replicate
HF's BeamSearchScorer exactly so results are verifiable token-for-token
against the reference's eval path:

* hypothesis score = sum_logprobs / len(sequence)**length_penalty where the
  length INCLUDES the decoder prefix (HF divides by input_ids.shape[-1]);
* an eos candidate only becomes a hypothesis if it ranks in the top K of the
  2K candidates at that step;
* a batch is "done" (early_stopping=False) once it holds K hypotheses and
  the best attainable alive score can no longer beat the worst of them;
  afterwards its hypothesis set is frozen;
* at finalisation, batches that never became done also enter their alive
  beams as hypotheses.

Beam state lives in [B, K] arrays; the SELF-attention cache is flat
[L, B*K, H, Dh, S] and reordered with one gather per step, while the
beam-invariant CROSS K/V is stored once per batch item [L, B, H, Dh, T] and
shared by folding the K beams into the cross-attention query axis
(models/whisper.py::_cross_attention beams=k) — every beam reads the same
dominant HBM stream instead of K copies. On a (data, model) mesh the gather
is batch-local, so a tensor-sharded teacher (BASELINE.json config 4) keeps
beam bookkeeping replicated while logits stay model-sharded.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import whisper as M
from ..models.config import DtypePolicy, WhisperConfig
from .rules import DecodeRules, apply_rules

NEG_INF = float(np.finfo(np.float32).min) / 2


@dataclasses.dataclass
class BeamResult:
    tokens: jnp.ndarray  # [B, S] best hypothesis (incl. prefix, eot-padded)
    scores: jnp.ndarray  # [B] length-penalised score of the best hypothesis
    all_tokens: jnp.ndarray  # [B, K, S] hypotheses, best-first
    all_scores: jnp.ndarray  # [B, K]
    # the long-form fallback ladder's control signals, mirroring
    # greedy.DecodeResult so sequential/chunked decode can swap strategies
    lengths: jnp.ndarray  # [B] sampled non-eot tokens of the best hypothesis
    sum_logprobs: jnp.ndarray  # [B] un-penalised total logprob (incl. eot)
    no_speech_probs: jnp.ndarray  # [B] P(<|nospeech|>) at the sot position


jax.tree_util.register_dataclass(
    BeamResult,
    data_fields=["tokens", "scores", "all_tokens", "all_scores",
                 "lengths", "sum_logprobs", "no_speech_probs"],
    meta_fields=[],
)


def _flat(x):  # [B, K, ...] -> [B*K, ...]
    return x.reshape((-1,) + x.shape[2:])


def _unflat(x, b, k):  # [B*K, ...] -> [B, K, ...]
    return x.reshape((b, k) + x.shape[1:])


def _gather_beams(x, beam_idx):
    """Reorder x [B, Kin, ...] by beam_idx [B, Kout] along the beam axis."""
    b, kout = beam_idx.shape
    idx = beam_idx.reshape((b, kout) + (1,) * (x.ndim - 2))
    return jnp.take_along_axis(x, idx, axis=1)


def beam_decode(
    params,
    enc_out: jnp.ndarray,  # [B, T_enc, d]
    prefix: jnp.ndarray,  # [B, P] int32
    config: WhisperConfig,
    rules: DecodeRules,
    policy: DtypePolicy = DtypePolicy(),
    *,
    num_beams: int = 5,
    max_len: Optional[int] = None,
    length_penalty: float = 1.0,
    sot_index: int = 0,
    quantize_cross_kv=0,  # 0/False off; True/8 int8; 4 int4; "fp8" e4m3;
    # "8x8" int8 storage + int8 x int8 MXU dots (accuracy-gated opt-in)
    scan_unroll: int = 0,  # decoder layer-scan unroll; 0 = auto
) -> BeamResult:
    b, p_len = prefix.shape
    k = num_beams
    max_len = max_len or config.max_target_positions
    if scan_unroll == 0:
        # beam programs are ~K x larger than greedy; at 32 decoder layers
        # the unroll-4 beam program crashes the TPU compiler helper
        # (PERF.md round 4, large-v2 grid) while unroll-1 compiles and
        # runs at 24.9 audio-s/s. Shallow (distilled) decoders still
        # unroll fully — that is where unrolling measured its win.
        scan_unroll = config.decoder_layers if config.decoder_layers <= 8 else 1
    eot = rules.eot
    ts_begin = rules.timestamp_begin

    suppress = jnp.asarray(rules.suppress_mask())
    begin_suppress = jnp.asarray(rules.begin_suppress_mask())

    # cross K/V is beam-invariant: store it ONCE per batch item [L,B,...]
    # and fold the K beams into the cross-attention query axis (decode_step
    # beams=k). Replicating it [L,B*K,...] multiplied the decode loop's
    # dominant HBM stream by K — measured 14x greedy:beam-5 at whisper-base
    # and a 5x-larger program that crashed the TPU compiler at large-v2
    # unroll-4 (PERF.md round 4).
    # quantization fused into the per-layer precompute scan (PERF.md r3:
    # whole-tensor quantization OOMs v5e at large-v2 beam-5 shapes)
    cross_kv = M.precompute_cross_kv(
        params, enc_out, config, policy,
        quantize=(quantize_cross_kv
                  if quantize_cross_kv in (4, "fp8") else 8)
        if quantize_cross_kv else 0,
    )
    cache = M.init_cache(config, b * k, max_len, dtype=policy.compute_dtype)
    prefix_rep = jnp.repeat(prefix, k, axis=0)
    int8_dots = quantize_cross_kv == "8x8"
    logits0, cache, sot_logits = M.prefill(
        params, cross_kv, cache, prefix_rep, config, policy,
        aux_index=sot_index, beams=k, int8_dots=int8_dots,
    )
    # beams are identical at prefill, so the no-speech probe (Whisper paper
    # §4.5: P(<|nospeech|>) at the sot position) reads one row per batch item
    no_speech_probs = jax.nn.softmax(sot_logits[::k], axis=-1)[:, rules.no_speech]

    tokens = jnp.full((b, k, max_len), eot, jnp.int32)
    tokens = jax.lax.dynamic_update_slice(
        tokens, _unflat(prefix_rep, b, k), (0, 0, 0)
    )

    state = dict(
        cache=cache,
        logits=logits0,  # [B*K, V]
        alive_seq=tokens,  # [B, K, S]
        alive_logp=jnp.tile(
            jnp.asarray([[0.0] + [NEG_INF] * (k - 1)], jnp.float32), (b, 1)
        ),  # beam 0 only at step 0 (all beams identical)
        alive_ts=jnp.zeros((b, k), jnp.int32),
        fin_seq=jnp.full((b, k, max_len), eot, jnp.int32),
        fin_scores=jnp.full((b, k), NEG_INF, jnp.float32),
        fin_exists=jnp.zeros((b, k), bool),
        done=jnp.zeros((b,), bool),
        cur=jnp.int32(p_len),
    )

    vocab = rules.vocab_size
    cand_rank = jnp.arange(2 * k)[None, :]  # [1, 2K]

    def cond(s):
        return jnp.logical_and(s["cur"] < max_len, ~jnp.all(s["done"]))

    def body(s):
        i = s["cur"]  # sequence length so far == position being sampled
        step = i - p_len
        flat_seq = _flat(s["alive_seq"])  # [B*K, S]
        last = jax.lax.dynamic_index_in_dim(flat_seq, i - 1, axis=1, keepdims=False)
        penult = jax.lax.dynamic_index_in_dim(
            flat_seq, jnp.maximum(i - 2, 0), axis=1, keepdims=False
        )
        # HF beam search log-softmaxes FIRST and applies the processors to the
        # normalised scores without renormalising afterwards — the per-beam
        # normalisation constant must not see the masking, or cross-beam
        # ranking diverges from the reference eval path.
        logprobs = apply_rules(
            jax.nn.log_softmax(s["logits"], axis=-1),
            step=step,
            last_token=last,
            penult_token=penult,
            last_timestamp=_flat(s["alive_ts"]),
            rules=rules,
            suppress=suppress,
            begin_suppress=begin_suppress,
        )  # [B*K, V]
        total = _unflat(logprobs, b, k) + s["alive_logp"][:, :, None]  # [B,K,V]

        # top 2K candidates over (K, V), sorted descending
        cand_logp, cand_idx = jax.lax.top_k(total.reshape(b, k * vocab), 2 * k)
        cand_beam = cand_idx // vocab  # [B, 2K]
        cand_tok = cand_idx % vocab
        is_eos = cand_tok == eot

        # --- hypothesis set update (HF BeamSearchScorer.process) ------------
        # only eos candidates ranked in the top K become hypotheses, and only
        # while the batch is not done; score divides by the FULL length i
        hyp_len = i.astype(jnp.float32)
        eos_ok = is_eos & (cand_rank < k) & ~s["done"][:, None]
        eos_scores = jnp.where(
            eos_ok, cand_logp / hyp_len**length_penalty, NEG_INF
        )  # [B, 2K]
        eos_seq = _gather_beams(s["alive_seq"], cand_beam)  # eot already pads
        merged_scores = jnp.concatenate([s["fin_scores"], eos_scores], axis=1)
        merged_exists = jnp.concatenate([s["fin_exists"], eos_ok], axis=1)
        merged_seq = jnp.concatenate([s["fin_seq"], eos_seq], axis=1)
        rank_scores = jnp.where(merged_exists, merged_scores, NEG_INF)
        _, top_fin = jax.lax.top_k(rank_scores, k)
        fin_scores = jnp.take_along_axis(rank_scores, top_fin, axis=1)
        fin_exists = jnp.take_along_axis(merged_exists, top_fin, axis=1)
        fin_seq = _gather_beams(merged_seq, top_fin)

        # done check (early_stopping=False): K hypotheses held and the best
        # candidate's attainable score can't beat the worst held hypothesis
        best_attainable = jnp.max(cand_logp, axis=1) / hyp_len**length_penalty
        worst_fin = jnp.min(jnp.where(fin_exists, fin_scores, NEG_INF), axis=1)
        all_full = jnp.all(fin_exists, axis=1)
        done = s["done"] | (all_full & (worst_fin >= best_attainable))

        # --- alive set: best K non-eos candidates (sorted order preserved) --
        alive_rank = jnp.where(is_eos, NEG_INF, cand_logp)
        _, top_alive = jax.lax.top_k(alive_rank, k)  # [B, K] into 2K cands
        new_beam = jnp.take_along_axis(cand_beam, top_alive, axis=1)  # [B,K]
        new_tok = jnp.take_along_axis(cand_tok, top_alive, axis=1)
        new_logp = jnp.take_along_axis(alive_rank, top_alive, axis=1)

        alive_seq = _gather_beams(s["alive_seq"], new_beam)
        alive_seq = jax.lax.dynamic_update_slice(
            alive_seq, new_tok[:, :, None], (0, 0, i)
        )
        alive_ts = jnp.take_along_axis(s["alive_ts"], new_beam, axis=1)
        alive_ts = jnp.where(new_tok >= ts_begin, new_tok, alive_ts)

        # cache leaves are [L, B*K, H, Dh, S]; reorder beams with a one-hot
        # MATMUL rather than take_along_axis — the 0/1 weights select exact
        # values (bit-identical), and on TPU the gather lowering measured
        # 13.7 ms vs 7.8 ms for the einsum per K/V tensor at large-v2
        # beam-5 shapes (bandwidth floor 1.6 ms; PERF.md round 5)
        oh = jax.nn.one_hot(new_beam, k, dtype=s["cache"].k.dtype)  # [B,K,J]

        def reorder_cache(x):
            xk = x.reshape((x.shape[0], b, k) + x.shape[2:])
            out = jnp.einsum("bkj,lbj...->lbk...", oh, xk,
                             preferred_element_type=x.dtype)
            return out.reshape(x.shape)

        cache = M.KVCache(
            k=reorder_cache(s["cache"].k), v=reorder_cache(s["cache"].v)
        )
        logits, cache = M.decode_step(
            params, cross_kv, cache, _flat(new_tok), i, config, policy,
            unroll=scan_unroll, beams=k, int8_dots=int8_dots,
        )
        return dict(
            cache=cache,
            logits=logits,
            alive_seq=alive_seq,
            alive_logp=new_logp,
            alive_ts=alive_ts,
            fin_seq=fin_seq,
            fin_scores=fin_scores,
            fin_exists=fin_exists,
            done=done,
            cur=i + 1,
        )

    s = jax.lax.while_loop(cond, body, state)

    # finalisation (HF BeamSearchScorer.finalize): batches that are not done
    # also enter their alive beams, scored at the final length
    final_len = s["cur"].astype(jnp.float32)
    alive_scores = jnp.where(
        s["done"][:, None], NEG_INF, s["alive_logp"] / final_len**length_penalty
    )
    merged_scores = jnp.concatenate([s["fin_scores"], alive_scores], axis=1)
    merged_exists = jnp.concatenate(
        [s["fin_exists"], ~s["done"][:, None] & jnp.ones((b, k), bool)], axis=1
    )
    merged_seq = jnp.concatenate([s["fin_seq"], s["alive_seq"]], axis=1)
    rank_scores = jnp.where(merged_exists, merged_scores, NEG_INF)
    _, order = jax.lax.top_k(rank_scores, k)
    fin_scores = jnp.take_along_axis(rank_scores, order, axis=1)
    fin_seq = _gather_beams(merged_seq, order)

    # alive beams hold only non-eot tokens, so the sampled count of a
    # hypothesis is its non-eot tail; the un-penalised total logprob inverts
    # the length penalty at hyp_len = p_len + sampled (the length HF divides
    # by when the hypothesis enters the set)
    best = fin_seq[:, 0]
    lengths = jnp.sum(best[:, p_len:] != eot, axis=-1).astype(jnp.int32)
    hyp_len = (p_len + lengths).astype(jnp.float32)
    sum_logprobs = fin_scores[:, 0] * hyp_len**length_penalty

    return BeamResult(
        tokens=best,
        scores=fin_scores[:, 0],
        all_tokens=fin_seq,
        all_scores=fin_scores,
        lengths=lengths,
        sum_logprobs=sum_logprobs,
        no_speech_probs=no_speech_probs,
    )
