"""Sample-visualization plotters shared by the experiments.

Parity targets: `cifar_plotter` (reference `experiments/cifar10/train.py:40-68`),
`chexpert_plotter` with on-device IDWT reassembly
(`experiments/chexpert-unet/train.py:40-95`, pywt loop replaced by
`ops/wavelet.haar_idwt2`), and `ipmsa_plotter` FLAIR + lesion-overlay
rendering (`experiments/ipmsa/train.py:42-110`). All consume NHWC [-1, 1]
samples and return the last written image path.
"""

from __future__ import annotations

import os

import numpy as np

__all__ = ["cifar_plotter", "make_chexpert_plotter", "make_ipmsa_plotter"]


def _to_unit(img: np.ndarray) -> np.ndarray:
    return np.clip((img + 1.0) / 2.0, 0.0, 1.0)


def cifar_plotter(output_dir, batches, samples, epoch, process_idx):
    """Save the first generated sample as a PNG."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    sample = np.asarray(samples[0][0])
    image = _to_unit(sample)
    if image.shape[-1] == 1:
        image = np.repeat(image, 3, axis=-1)
    os.makedirs(output_dir, exist_ok=True)
    image_path = os.path.join(output_dir, f"sample_{epoch}_{process_idx}.png")
    plt.imsave(image_path, image)
    return image_path


def make_chexpert_plotter(config):
    """Per-batch dump with IDWT reassembly when wavelet_transform is on."""

    def plotter(output_dir, batches, samples, epoch, process_idx):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        import jax.numpy as jnp

        from ..ops.wavelet import haar_idwt2

        image_path = None
        for batch, sample in zip(batches, samples):
            prompts = np.asarray(batch["prompt"])
            for j in range(1):
                item = np.asarray(sample[j])
                if config.wavelet_transform:
                    item = np.asarray(haar_idwt2(jnp.asarray(item * 2.0)))
                img = _to_unit(item)
                activity = "active" if prompts[j] else "inactive"
                fig, axs = plt.subplots(1, 1, figsize=(5, 5))
                axs.imshow(
                    img if img.shape[-1] != 1 else img[..., 0], cmap="gray"
                )
                axs.axis("off")
                fig.suptitle(f"Patient status: {activity}", fontsize=16)
                plt.tight_layout()
                patient_path = os.path.join(output_dir, activity)
                os.makedirs(patient_path, exist_ok=True)
                image_path = os.path.join(
                    patient_path,
                    f"epoch_{epoch}_sample_{j}_process_{process_idx}.png",
                )
                plt.savefig(image_path, dpi=150)
                plt.close(fig)
        return image_path

    return plotter


def make_ipmsa_plotter(config):
    """Center-slice FLAIR + thresholded green CT2F lesion overlay
    (reference ipmsa/train.py:42-110 parity).

    Samples are [B, H, W, 2·slices] packing (FLAIR slab ‖ CT2F slab)
    channel-last; the center slice of each slab is rendered, with the lesion
    overlay alpha-gated at 0.15 exactly as the reference. With
    wavelet_transform the sample is IDWT'd on device first.
    """
    alpha_threshold = 0.15

    def plotter(output_dir, batches, samples, epoch, process_idx):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.colors as mcolors
        import matplotlib.pyplot as plt

        import jax.numpy as jnp

        from ..ops.wavelet import haar_idwt2

        green_cmap = mcolors.LinearSegmentedColormap.from_list(
            "green_cmap", ["white", "green"]
        )
        image_path = None
        for batch, sample in zip(batches, samples):
            prompts = np.asarray(batch["prompt"])
            n_plot = min(2, len(prompts))  # reference plots 2 per batch
            for j in range(n_plot):
                item = np.asarray(sample[j])
                if config.wavelet_transform:
                    item = np.asarray(haar_idwt2(jnp.asarray(item * 2.0)))
                slices = max(1, item.shape[-1] // 2)
                offset = slices // 2
                flair_pred = item[..., offset]
                ct2f_pred = _to_unit(item[..., min(offset + slices, item.shape[-1] - 1)])
                activity = "active" if prompts[j] else "inactive"
                fig, axs = plt.subplots(1, 1, figsize=(5, 5))
                alpha = (ct2f_pred > alpha_threshold).astype(np.float32)
                axs.imshow(flair_pred, cmap="gray")
                axs.imshow(ct2f_pred, cmap=green_cmap, alpha=alpha)
                axs.axis("off")
                fig.suptitle(f"Patient status: {activity}", fontsize=16)
                plt.tight_layout()
                patient_path = os.path.join(output_dir, activity)
                os.makedirs(patient_path, exist_ok=True)
                image_path = os.path.join(
                    patient_path,
                    f"epoch_{epoch}_sample_{j}_process_{process_idx}.png",
                )
                plt.savefig(image_path, dpi=150)
                plt.close(fig)
        return image_path

    return plotter
