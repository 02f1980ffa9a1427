"""MIMIC-CXR out-of-distribution evaluation of a CheXpert-trained model
(reference `/root/reference/experiments/chexpert-unet/ood.py` parity).

Loads the CheXpert checkpoint and classifies MIMIC images at 64px — the
resolution mismatch vs 256px training is the reference's intentional OOD
stress (SURVEY §4)."""

from common import REPO_ROOT, build_engine  # noqa: F401 (path setup)

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
