"""IPMSA test-set inference (reference
`/root/reference/experiments/ipmsa/inference.py` parity)."""

from common import build_data, build_engine, make_ipmsa_plotter

from diffusion_classifier_tpu.utils.config import ExperimentConfig
from diffusion_classifier_tpu.utils.metrics import F1, Accuracy, Precision, Recall


def main():
    config = ExperimentConfig.from_env("INFERENCE_CONFIG")
    data = build_data(config)
    engine = build_engine(config)
    metrics = (
        [Accuracy("accuracy"), F1("f1"), Precision("precision"), Recall("recall")]
        if config.classification
        else None
    )
    result = engine.inference(
        val_dataloader=data.get_test_loader(),
        metrics=metrics,
        plot_function=make_ipmsa_plotter(config),
        classification=config.classification,
        checkpoint_folder=config.checkpoint_folder,
    )
    if config.classification:
        metric_output, _, _ = result
        print([{k: round(v, 4) for k, v in d.items()} for d in metric_output])


if __name__ == "__main__":
    main()
