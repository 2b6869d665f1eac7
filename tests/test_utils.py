"""Ingest utilities, profiling, figures, optimizer schedules."""

import os

import numpy as np
import pytest

from taiwan_whisper_tpu.audio.ingest import (
    batch_convert,
    convert_to_flac_16k,
    duration_stats,
    ffmpeg_available,
)
from taiwan_whisper_tpu.audio.io import write_wav
from taiwan_whisper_tpu.utils.profiling import StepTimer, device_time


def test_convert_wav_to_flac(tmp_path):
    x = (np.random.RandomState(0).randn(16000) * 0.1).astype(np.float32)
    src = str(tmp_path / "a.wav")
    write_wav(src, x)
    dst = convert_to_flac_16k(src, str(tmp_path / "a.flac"))
    assert os.path.exists(dst)
    from taiwan_whisper_tpu.audio.io import load_audio_16k

    y = load_audio_16k(dst)
    assert len(y) == len(x)


def test_convert_unsupported_without_ffmpeg(tmp_path):
    if ffmpeg_available():
        pytest.skip("ffmpeg present")
    src = str(tmp_path / "a.webm")
    open(src, "wb").write(b"\x00")
    with pytest.raises(RuntimeError, match="ffmpeg"):
        convert_to_flac_16k(src, str(tmp_path / "a.flac"))


def test_batch_convert_and_duration(tmp_path):
    srcs = []
    for i in range(3):
        p = str(tmp_path / f"{i}.wav")
        write_wav(p, np.zeros(16000 * (i + 1), np.float32))
        srcs.append(p)
    out = tmp_path / "flac"
    results = batch_convert(srcs, str(out), num_workers=2)
    assert all(dst is not None for _, dst in results)
    stats = duration_stats([dst for _, dst in results])
    assert stats.n_files == 3
    assert stats.total_seconds == pytest.approx(6.0, abs=0.1)
    assert stats.max_seconds == pytest.approx(3.0, abs=0.1)


def test_step_timer():
    t = StepTimer(window=10)
    assert t.tick() is None
    assert t.tick() is not None
    assert t.steps_per_second > 0


def test_device_time_runs():
    import jax.numpy as jnp

    dt = device_time(lambda x: x * 2, jnp.ones((8, 8)), iters=2)
    assert dt >= 0


def test_schedules():
    from taiwan_whisper_tpu.train.state import OptimConfig, make_schedule

    s = make_schedule(OptimConfig(learning_rate=1e-3, warmup_steps=10,
                                  schedule="constant_with_warmup"))
    assert float(s(0)) == 0.0
    assert float(s(10)) == pytest.approx(1e-3)
    assert float(s(10000)) == pytest.approx(1e-3)
    lin = make_schedule(OptimConfig(learning_rate=1e-3, warmup_steps=10,
                                    total_steps=110, schedule="linear"))
    assert float(lin(10)) == pytest.approx(1e-3)
    assert float(lin(110)) == pytest.approx(0.0, abs=1e-9)


def test_figures(tmp_path):
    pytest.importorskip("matplotlib")
    from taiwan_whisper_tpu.utils.figures import params_vs_mer_scatter

    out = params_vs_mer_scatter(
        [
            {"name": "teacher", "params_m": 1550, "mer": 13.96, "group": "baseline"},
            {"name": "student-32-2", "params_m": 756, "mer": 11.44, "group": "K2D"},
        ],
        str(tmp_path / "fig.png"),
    )
    assert os.path.exists(out)
