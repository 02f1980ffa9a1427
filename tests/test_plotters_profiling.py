"""Plotter and profiling-utility tests."""

import os

import numpy as np

from diffusion_classifier_tpu.utils.config import ExperimentConfig
from diffusion_classifier_tpu.utils.plotters import (
    cifar_plotter,
    make_chexpert_plotter,
    make_ipmsa_plotter,
)
from diffusion_classifier_tpu.utils.profiling import StepTimer, timed


def _fake_eval(batch=2, size=8, channels=3):
    rng = np.random.default_rng(0)
    batches = [
        {
            "images": rng.uniform(-1, 1, (batch, size, size, channels)).astype(
                np.float32
            ),
            "prompt": np.array([1, 0]),
        }
    ]
    samples = [rng.uniform(-1, 1, (batch, size, size, channels)).astype(np.float32)]
    return batches, samples


def test_cifar_plotter_writes_png(tmp_path):
    batches, samples = _fake_eval()
    path = cifar_plotter(str(tmp_path), batches, samples, epoch=3, process_idx=0)
    assert os.path.exists(path) and path.endswith("sample_3_0.png")


def test_chexpert_plotter_plain_and_dwt(tmp_path):
    cfg = ExperimentConfig(wavelet_transform=False)
    batches, samples = _fake_eval(channels=3)
    path = make_chexpert_plotter(cfg)(str(tmp_path), batches, samples, 0, 0)
    assert os.path.exists(path) and "active" in path

    cfg_wt = ExperimentConfig(wavelet_transform=True)
    batches, samples = _fake_eval(channels=12)  # 4x3 wavelet channels
    path = make_chexpert_plotter(cfg_wt)(str(tmp_path), batches, samples, 1, 0)
    assert os.path.exists(path)


def test_ipmsa_plotter_overlay(tmp_path):
    cfg = ExperimentConfig(wavelet_transform=False)
    batches, samples = _fake_eval(channels=6)  # FLAIR+CT2F slabs
    path = make_ipmsa_plotter(cfg)(str(tmp_path), batches, samples, 0, 0)
    assert os.path.exists(path)


def test_step_timer_and_timed():
    import jax.numpy as jnp

    timer = StepTimer()
    for _ in range(3):
        with timer.measure():
            pass
    s = timer.summary()
    assert s["steps"] == 3 and s["p50_s"] >= 0

    result, seconds = timed(lambda: jnp.ones(4).sum())
    assert float(result) == 4.0 and seconds >= 0


def test_enable_compilation_cache(tmp_path):
    """The persistent-cache helper points JAX at the directory and compiled
    programs get persisted there (cross-process compile reuse: measured
    0.67 s cold -> 0.06 s warm on the TPU relay)."""
    import jax
    import jax.numpy as jnp

    from diffusion_classifier_tpu.utils.profiling import (
        enable_compilation_cache,
    )

    cache = str(tmp_path / "xla_cache")
    prior_secs = jax.config.jax_persistent_cache_min_compile_time_secs
    prior_bytes = jax.config.jax_persistent_cache_min_entry_size_bytes
    try:
        enable_compilation_cache(cache)
        # tiny CPU compiles fall under the default persistence thresholds
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        assert jax.config.jax_compilation_cache_dir == cache

        @jax.jit
        def f(x):
            return jnp.tanh(x) * 3.0 + x

        f(jnp.ones((8, 8))).block_until_ready()
        assert os.path.isdir(cache) and os.listdir(cache)
    finally:
        jax.config.update("jax_compilation_cache_dir", None)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", prior_secs
        )
        jax.config.update(
            "jax_persistent_cache_min_entry_size_bytes", prior_bytes
        )


def test_config_compilation_cache_knob(tmp_path):
    """Constructing an engine with compilation_cache_dir set applies it."""
    import jax
    from flax import linen as nn

    from diffusion_classifier_tpu.engine.classifier import Classifier
    from diffusion_classifier_tpu.utils.config import ExperimentConfig

    class _Flat(nn.Module):
        @nn.compact
        def __call__(self, x, *, train: bool = False):
            return x.reshape((x.shape[0], -1))

    cache = str(tmp_path / "cc")
    cfg = ExperimentConfig.from_dict(
        {"compilation_cache_dir": cache, "classes": 2}
    )
    try:
        Classifier(_Flat(), cfg)  # engine __init__ applies the knob
        assert jax.config.jax_compilation_cache_dir == cache
    finally:
        jax.config.update("jax_compilation_cache_dir", None)
