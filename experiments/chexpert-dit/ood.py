"""MIMIC OOD evaluation of the CheXpert DiT model (reference
`/root/reference/experiments/chexpert-dit/ood.py` parity)."""

from common import build_engine

from diffusion_classifier_tpu.data.mimic import MimicOodDataLoader
from diffusion_classifier_tpu.utils.config import ExperimentConfig
from diffusion_classifier_tpu.utils.metrics import F1, Accuracy, Precision, Recall


def main():
    config = ExperimentConfig.from_env("INFERENCE_CONFIG")
    mimic = MimicOodDataLoader(
        wavelet_transform=config.wavelet_transform,
        data_path=config.data_path,
        batch_size=config.batch_size,
        num_workers=config.num_workers,
        seed=config.seed,
    )
    engine = build_engine(config)
    metric_output, _, _ = engine.inference(
        val_dataloader=mimic.get_data_loader(),
        metrics=[Accuracy("accuracy"), F1("f1"), Precision("precision"), Recall("recall")],
        plot_function=None,
        classification=config.classification,
        checkpoint_folder=config.checkpoint_folder,
    )
    print([{k: round(v, 4) for k, v in d.items()} for d in metric_output])


if __name__ == "__main__":
    main()
