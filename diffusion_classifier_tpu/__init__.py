"""diffusion_classifier_tpu — a TPU-native diffusion-model classification framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
faverogian/diffusion-classifier: train class-conditional continuous-time DDPMs
(logSNR cosine schedules, v/ε prediction, min-SNR weighting, CFG) and classify
images by per-class ELBO denoising error with staged candidate pruning — plus a
discriminative-classifier baseline, counterfactual explanation, and OOD
evaluation.

Design: pure-functional pytrees, one jitted step per workload, NHWC layout,
bf16 compute / fp32 schedule math, `jax.sharding.Mesh` data parallelism, and
the (class × eval) classification grid fused into single device megabatches.
"""

__version__ = "0.1.0"
