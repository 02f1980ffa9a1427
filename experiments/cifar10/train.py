"""CIFAR-10 diffusion-classifier training (reference
`/root/reference/experiments/cifar10/train.py` parity, corrected per SURVEY §2.6).

Driven by the ``TRAINING_CONFIG`` env-var JSON (same schema as the reference);
set ``data_path`` to a CIFAR-10 download or to ``"synthetic"`` for a smoke run.
"""

from common import build_data, build_engine, cifar_plotter

from diffusion_classifier_tpu.utils.config import ExperimentConfig
from diffusion_classifier_tpu.utils.metrics import Accuracy


def main():
    config = ExperimentConfig.from_env("TRAINING_CONFIG")
    data = build_data(config)
    engine = build_engine(config)
    engine.train_loop(
        train_dataloader=data.get_train_loader(),
        val_dataloader=data.get_test_loader(),
        metrics=[Accuracy("classification accuracy")],
        checkpoint_metric="classification accuracy",
        plot_function=cifar_plotter,
    )


if __name__ == "__main__":
    main()
