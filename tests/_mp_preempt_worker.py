"""2-process preemption/resume worker for `tests/test_preemption.py`.

Runs the FULL DiffusionClassifier engine (not a raw step) on a real
2-process CPU cluster. Two phases, selected by argv:

- ``train``: train "forever" (huge num_epochs). The parent test delivers
  SIGTERM to both ranks mid-training; the runtime preemption sync manager
  (initialized by `parallel.mesh.init_distributed`) propagates the notice,
  every rank reaches the SAME synced step, and all ranks enter the
  COLLECTIVE checkpoint save together (`engine/diffusion_classifier.py`
  train_loop sync-point branch), then exit 128+SIGTERM.
- ``resume``: a FRESH 2-process cluster restores that checkpoint
  (``resume=True``), runs to completion, and exits 0.

argv: ``<project_root> <phase>``; cluster shape from the standard
``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID``
env vars. The reference has nothing comparable (SURVEY §5.3 — recovery is a
manual resume flag with no save-on-preemption), so this tests the rebuild's
claimed advantage end-to-end where it is hardest: across process boundaries.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_engine(root: str, num_epochs: int, resume: bool):
    from diffusion_classifier_tpu.data.synthetic import SyntheticDataLoader
    from diffusion_classifier_tpu.engine import DiffusionClassifier
    from diffusion_classifier_tpu.models import UNetCondition2D, UNetConfig
    from diffusion_classifier_tpu.utils.config import ExperimentConfig

    cfg = ExperimentConfig(
        pred_param="v", schedule="cosine", noise_d=8, image_size=8,
        image_channels=1, classes=2, cfg_w=0.0, ema_beta=0.99, ema_warmup=0,
        ema_update_freq=1, mixed_precision="no", num_epochs=num_epochs,
        save_image_epochs=10**9, evaluation_batches=1, sampling_steps=2,
        batch_size=16, learning_rate=1e-3, lr_warmup_steps=5,
        n_stages=1, evaluation_per_stage=(1,), n_keep_per_stage=(1,),
        project_root=root, experiment_dir="run", use_comet=False,
        resume=resume, progress=False,
    )
    backbone = UNetCondition2D(UNetConfig(
        sample_size=8, in_channels=1, out_channels=1,
        block_out_channels=(16, 32),
        down_block_types=("DownBlock2D", "CrossAttnDownBlock2D"),
        up_block_types=("CrossAttnUpBlock2D", "UpBlock2D"),
        layers_per_block=1, attention_head_dim=2, cross_attention_dim=16,
        encoder_hid_dim=16, encoder_hid_dim_type="text_proj",
        norm_num_groups=8,
    ))
    backbone.encoder_hid_dim = 16
    data = SyntheticDataLoader(
        num_train=64, num_val=32, batch_size=16, image_size=8, channels=1,
        classes=2, seed=0,
    )
    return DiffusionClassifier(backbone, cfg), data


def main():
    root, phase = sys.argv[1], sys.argv[2]
    import jax

    jax.config.update("jax_platform_name", "cpu")

    from diffusion_classifier_tpu.parallel.mesh import (
        init_distributed,
        preemption_sync_active,
    )

    init_distributed()
    assert jax.process_count() == 2, jax.process_count()
    assert preemption_sync_active(), "sync manager must be up for this test"

    if phase == "train":
        engine, data = build_engine(root, num_epochs=100000, resume=False)
        engine.train_loop(data.get_train_loader(), data.get_val_loader())
    else:
        assert phase == "resume", phase
        from diffusion_classifier_tpu.utils.checkpoint import latest_sidecar

        side = latest_sidecar(os.path.join(root, "run", "checkpoints"))
        assert side is not None, "no checkpoint to resume from"
        # one more epoch past the interrupted one, then finish cleanly
        engine, data = build_engine(
            root, num_epochs=int(side["epoch"]) + 1, resume=True
        )
        engine.train_loop(data.get_train_loader(), data.get_val_loader())
        if jax.process_index() == 0:
            print(f"RESUME_COMPLETE epochs={engine.config.num_epochs}")


if __name__ == "__main__":
    main()
