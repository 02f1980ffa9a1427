"""Config validation, metrics, tracking, and mesh tests."""

import json
import os

import numpy as np
import pytest

import jax

from diffusion_classifier_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    shard_batch,
)
from diffusion_classifier_tpu.utils.config import ExperimentConfig
from diffusion_classifier_tpu.utils.metrics import F1, Accuracy, Precision, Recall
from diffusion_classifier_tpu.utils.tracking import (
    CometTracker,
    JsonlTracker,
    make_tracker,
)


def test_config_rejects_unknown_keys():
    with pytest.raises(ValueError, match="Unknown config keys"):
        ExperimentConfig.from_dict({"pred_pram": "v"})


def test_config_validates_stages():
    with pytest.raises(AssertionError):
        ExperimentConfig.from_dict(
            {"n_stages": 2, "evaluation_per_stage": [4], "n_keep_per_stage": [2, 1]}
        )
    with pytest.raises(AssertionError):
        ExperimentConfig.from_dict(
            {"n_stages": 1, "evaluation_per_stage": [4], "n_keep_per_stage": [2]}
        )


def test_config_env_roundtrip(monkeypatch):
    cfg = ExperimentConfig(classes=4, batch_size=8)
    monkeypatch.setenv("TRAINING_CONFIG", cfg.to_json())
    loaded = ExperimentConfig.from_env("TRAINING_CONFIG")
    assert loaded == cfg


def test_config_reference_schema_loads(monkeypatch):
    """A JSON blob with the reference's key census loads unchanged."""
    blob = {
        "pred_param": "v",
        "schedule": "shifted_cosine",
        "noise_d": 64,
        "image_size": 128,
        "image_channels": 3,
        "cfg_w": 0.1,
        "encoder_type": "nn",
        "classes": 2,
        "ema_beta": 0.9999,
        "ema_warmup": 100,
        "ema_update_freq": 10,
        "mixed_precision": "bf16",
        "gradient_accumulation_steps": 1,
        "project_root": "/tmp",
        "experiment_dir": "exp",
        "resume": False,
        "use_comet": False,
        "num_epochs": 3,
        "save_image_epochs": 1,
        "evaluation_batches": 2,
        "sampling_steps": 64,
        "seed": 42,
        "data_path": "synthetic",
        "batch_size": 16,
        "num_workers": 2,
        "learning_rate": 1e-4,
        "lr_warmup_steps": 100,
        "fast_classification": False,
        "n_fast_classes": 2,
        "n_stages": 2,
        "evaluation_per_stage": [2, 6],
        "n_keep_per_stage": [2, 1],
        "checkpoint_folder": "checkpoints",
    }
    monkeypatch.setenv("TRAINING_CONFIG", json.dumps(blob))
    cfg = ExperimentConfig.from_env()
    assert cfg.n_stages == 2 and cfg.evaluation_per_stage == (2, 6)


def test_metrics_binary_counters():
    y_pred = np.array([1, 1, 0, 0, 1])
    y_true = np.array([1, 0, 0, 1, 1])
    batch = {"prompt": y_true}
    acc, prec, rec, f1 = Accuracy("acc"), Precision(), Recall(), F1()
    for m in (acc, prec, rec, f1):
        m.update((y_pred, batch))
    assert acc.compute()["acc"] == pytest.approx(3 / 5)
    assert prec.compute()["precision"] == pytest.approx(2 / 3)
    assert rec.compute()["recall"] == pytest.approx(2 / 3)
    assert f1.compute()["f1"] == pytest.approx(2 / 3)
    # reset + empty compute doesn't divide by zero
    for m in (acc, prec, rec, f1):
        m.reset()
        assert list(m.compute().values())[0] == 0.0


def test_metric_sync_with_custom_reducer():
    acc = Accuracy("acc")
    acc.update((np.array([1, 0]), {"prompt": np.array([1, 1])}))
    # emulate a 2-process sum
    acc.sync_across_processes(lambda c: {k: v * 2 for k, v in c.items()})
    assert acc.counters["total"] == 4
    assert acc.compute()["acc"] == pytest.approx(0.5)


def test_jsonl_tracker_roundtrip(tmp_path):
    tr = JsonlTracker(str(tmp_path))
    tr.log_metric("loss", 0.5, epoch=1)
    tr.log_other("device", "tpu")
    key = tr.get_key()
    events = [json.loads(l) for l in open(os.path.join(tmp_path, "track.jsonl"))]
    assert events[0]["event"] == "start" and events[0]["key"] == key
    assert any(e.get("name") == "loss" and e["value"] == 0.5 for e in events)


class _FakeExperiment:
    """Records the comet_ml.Experiment call surface the reference uses
    (`diffusion/diffusion_classifier.py:406-416`)."""

    def __init__(self, **kw):
        self.kw = kw
        self.calls = []

    def __getattr__(self, name):
        def record(*a, **k):
            self.calls.append((name, a, k))
            return "KEY" if name == "get_key" else None

        return record


class _FakeComet:
    def __init__(self):
        self.experiments = []

    def Experiment(self, **kw):
        exp = _FakeExperiment(kind="fresh", **kw)
        self.experiments.append(exp)
        return exp

    def ExistingExperiment(self, **kw):
        exp = _FakeExperiment(kind="resume", **kw)
        self.experiments.append(exp)
        return exp


def test_comet_tracker_fresh_and_resume(tmp_path):
    fake = _FakeComet()
    tr = make_tracker(
        True,
        str(tmp_path),
        comet_api_key="k",
        comet_project_name="proj",
        comet_workspace="ws",
        name="run-1",
        comet_module=fake,
    )
    assert isinstance(tr, CometTracker)
    (exp,) = fake.experiments
    assert exp.kw == {
        "kind": "fresh", "api_key": "k", "project_name": "proj",
        "workspace": "ws",
    }
    tr.log_metric("loss", 0.25, step=3)
    tr.log_image("samples", "/tmp/img.png")
    tr.log_asset("/tmp/train.py", "train.py")
    tr.log_other("Device", "tpu")
    assert tr.get_key() == "KEY"
    names = [c[0] for c in exp.calls]
    assert names[:1] == ["set_name"]  # fresh runs get the configured name
    assert {"log_metric", "log_image", "log_asset", "log_other"} <= set(names)

    # resume: re-attach via ExistingExperiment with the stored key, no rename
    fake2 = _FakeComet()
    tr2 = make_tracker(
        True,
        str(tmp_path),
        comet_api_key="k",
        resume_key="prev-key",
        name="run-1",
        comet_module=fake2,
    )
    (exp2,) = fake2.experiments
    assert exp2.kw["kind"] == "resume"
    assert exp2.kw["previous_experiment"] == "prev-key"
    assert "set_name" not in [c[0] for c in exp2.calls]
    assert isinstance(tr2, CometTracker)


def test_make_tracker_defaults_to_jsonl_without_api_key(tmp_path):
    tr = make_tracker(True, str(tmp_path))
    assert isinstance(tr, JsonlTracker)
    assert make_tracker(False, str(tmp_path)) is None
    assert make_tracker(True, str(tmp_path), is_main_process=False) is None


def test_make_tracker_falls_back_when_comet_unimportable(tmp_path):
    # api key configured but comet_ml not installed (this environment):
    # the zero-egress JSONL backend must be the silent fallback
    tr = make_tracker(True, str(tmp_path), comet_api_key="k")
    assert isinstance(tr, JsonlTracker)


def test_make_tracker_falls_back_on_comet_runtime_failure(tmp_path):
    """comet_ml importable but failing at construction (no network, bad
    resume key): training must not abort over telemetry — JSONL fallback
    with a warning (round-3 review finding)."""
    import warnings as _w

    class _ExplodingComet:
        def Experiment(self, **kw):
            raise RuntimeError("no network route to comet.ml")

        def ExistingExperiment(self, **kw):
            raise RuntimeError("invalid resume key")

    with _w.catch_warnings(record=True) as caught:
        _w.simplefilter("always")
        tr = make_tracker(
            True, str(tmp_path), comet_api_key="k",
            comet_module=_ExplodingComet(),
        )
    assert isinstance(tr, JsonlTracker)
    assert any("falling back to JSONL" in str(w.message) for w in caught)


def test_mesh_and_batch_sharding():
    mesh = make_mesh()
    assert mesh.shape["data"] == 8 and mesh.shape["model"] == 1
    batch = {"images": np.zeros((16, 4, 4, 3), np.float32)}
    dev = shard_batch(mesh, batch)
    sharding = dev["images"].sharding
    assert sharding.is_equivalent_to(batch_sharding(mesh, 4), 4)
    # each device holds 16/8 = 2 examples
    shard_shapes = {s.data.shape for s in dev["images"].addressable_shards}
    assert shard_shapes == {(2, 4, 4, 3)}


def test_mesh_2d_model_axis():
    mesh = make_mesh(data=4, model=2)
    assert mesh.shape == {"data": 4, "model": 2}
