"""CheXpert test-set inference (reference
`/root/reference/experiments/chexpert-unet/inference.py` parity). Also dumps a
`mistakes-ddpm-chexpert.txt`-format list of misclassified image paths when
classification is enabled (reference `mistakes/*.txt` artifacts)."""

import os

from common import build_data, build_engine, make_chexpert_plotter

from diffusion_classifier_tpu.utils.config import ExperimentConfig
from diffusion_classifier_tpu.utils.metrics import F1, Accuracy, Precision, Recall

import numpy as np


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
        plot_function=make_chexpert_plotter(config),
        classification=config.classification,
        checkpoint_folder=config.checkpoint_folder,
    )
    if config.classification:
        metric_output, val_samples, batches = result
        print([{k: round(v, 4) for k, v in d.items()} for d in metric_output])
        # mistakes artifact (cross-model error analysis, reference mistakes/).
        # Single-process only: val_samples are HOST-LOCAL prediction rows
        # (`parallel/mesh.py::local_rows`) — under multi-process inference
        # they cover only this host's slice of the dataset order, so the
        # artifact would silently misalign with mistake_paths' full-dataset
        # indexing. drop_last batching also truncates the dataset tail, so
        # the artifact covers only the first len(preds) samples.
        import jax

        if (
            jax.process_count() == 1
            and hasattr(data, "test_dataset")
            and hasattr(data.test_dataset, "mistake_paths")
        ):
            preds = np.concatenate([np.asarray(s) for s in val_samples])
            mistakes = data.test_dataset.mistake_paths(preds)
            out = os.path.join(config.experiment_path, "mistakes-ddpm-chexpert.txt")
            with open(out, "w") as f:
                f.write("\n".join(mistakes) + "\n")
            print(f"{len(mistakes)} mistakes written to {out}")


if __name__ == "__main__":
    main()
