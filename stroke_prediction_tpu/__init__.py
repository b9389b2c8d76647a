"""stroke_prediction_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
ischemic-stroke infarct-growth prediction from multivariate 3D CT-perfusion.

Re-designed from scratch with the capabilities of the reference
`multimodallearning/stroke-prediction` (PyTorch 0.3): a 3D U-Net that
segments core/penumbra from CBV/TTD CTP volumes, a 3D convolutional
autoencoder (CAE) that learns a low-dimensional lesion shape space and
predicts follow-up lesions by linear interpolation in latent space, plus
step-learning / CTP-conditioned / phase-2 prediction variants and a
signed-distance-map interpolation baseline.

Architecture is TPU-idiomatic:
  * volumes are channels-last ``(B, D, H, W, C)`` pytrees,
  * models are flax modules jit-compiled over a ``jax.sharding.Mesh``,
  * augmentation runs on-device inside the jitted train step,
  * hot kernels have Pallas implementations behind the ``ops`` facade.
"""

__version__ = "0.1.0"
