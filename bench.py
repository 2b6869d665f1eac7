"""Benchmark: pseudo-label decode throughput on one TPU chip.

Measures the BASELINE.json headline metric — audio-seconds/s per chip on the
pseudo-labelling path (config 2 scaled to the measured throughput knee:
whisper-base batched greedy, batch=96,
30 s chunks): on-device Pallas log-mel -> encoder -> KV-cached greedy decode
with the full Whisper timestamp rule stack, decoding a fixed 192-token
budget per chunk (a realistic long-form labelling budget; random weights
never emit <|endoftext|>, so the budget bounds the loop).

vs_baseline compares against the reference's closest published number:
upstream distil-whisper pseudo-labelling at ~120 audio-s/s per 80GB GPU
(20 h labelled in ~10 min, training/README.md:136-139; see BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from taiwan_whisper_tpu.decode.greedy import greedy_decode
    from taiwan_whisper_tpu.decode.rules import DecodeRules
    from taiwan_whisper_tpu.models import whisper as M
    from taiwan_whisper_tpu.models.config import DtypePolicy, get_config
    from taiwan_whisper_tpu.models.params import init_params
    from taiwan_whisper_tpu.ops.mel_kernel import log_mel_pallas
    from taiwan_whisper_tpu.audio.mel import N_SAMPLES
    from taiwan_whisper_tpu.text.tokenizer import MULTILINGUAL, WhisperTokenizer

    batch = 96
    decode_budget = 192
    config = get_config("base")
    policy = DtypePolicy.bf16()
    params = init_params(config, seed=0)
    tok = WhisperTokenizer(MULTILINGUAL)
    rules = DecodeRules.from_special(MULTILINGUAL, timestamps=True)
    prefix = jnp.asarray([tok.sot_sequence("zh", "transcribe")] * batch, jnp.int32)
    max_len = prefix.shape[1] + decode_budget

    on_tpu = jax.devices()[0].platform != "cpu"

    @jax.jit
    def label_chunks(params, audio, prefix):
        if on_tpu:
            mel = log_mel_pallas(audio)
        else:
            from taiwan_whisper_tpu.audio.mel import log_mel

            mel = log_mel(audio)
        enc = M.encode(params, mel, config, policy)
        res = greedy_decode(
            params, enc, prefix, config, rules, policy, max_len=max_len,
            quantize_cross_kv=True,  # int8 cross-KV: the optimized labelling
            # config (+~20%; top-1 parity verified in tests)
        )
        return res.tokens

    rng = np.random.RandomState(0)
    audios = [
        jnp.asarray(rng.randn(batch, N_SAMPLES).astype(np.float32) * 0.1)
        for _ in range(4)
    ]

    # warmup / compile; np.asarray forces a device-to-host transfer — on the
    # tunneled TPU backend block_until_ready alone does not reliably await
    # remote execution, so every timed call must materialise its result
    np.asarray(label_chunks(params, audios[0], prefix))

    # per-call median: the tunneled chip's throughput drifts between runs
    # (PERF.md), so the statistic must be robust to stragglers within one
    iters = 8
    samples = []
    for i in range(iters):
        t0 = time.perf_counter()
        np.asarray(label_chunks(params, audios[i % len(audios)], prefix))
        samples.append(time.perf_counter() - t0)
    dt = float(np.median(samples))

    audio_seconds = batch * 30.0
    value = audio_seconds / dt
    baseline = 120.0  # audio-s/s per GPU, upstream labelling example
    print(json.dumps({
        "metric": "pseudo_label_decode_throughput",
        "value": round(value, 2),
        "unit": "audio_seconds_per_second_per_chip",
        "vs_baseline": round(value / baseline, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
