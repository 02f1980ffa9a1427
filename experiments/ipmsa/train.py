"""IPMSA MS future-activity training (reference
`/root/reference/experiments/ipmsa/train.py` parity)."""

from common import build_data, build_engine, make_ipmsa_plotter

from diffusion_classifier_tpu.utils.config import ExperimentConfig
from diffusion_classifier_tpu.utils.metrics import F1, Accuracy, Precision, Recall


def main():
    config = ExperimentConfig.from_env("TRAINING_CONFIG")
    data = build_data(config)
    engine = build_engine(config)
    engine.train_loop(
        train_dataloader=data.get_train_loader(),
        val_dataloader=data.get_val_loader()
        if hasattr(data, "get_val_loader")
        else data.get_test_loader(),
        metrics=[Accuracy("accuracy"), F1("f1"), Precision("precision"), Recall("recall")],
        checkpoint_metric="f1",
        plot_function=make_ipmsa_plotter(config),
    )


if __name__ == "__main__":
    main()
