"""CraniofacialSD-VAE-TPU: a TPU-native (JAX/XLA/Pallas) framework for
swap-disentangled variational autoencoders on 3D head/face meshes.

Re-designed from scratch for TPU hardware with the capabilities of the
reference PyTorch implementation (simofoti/CraniofacialSD-VAE):
craniofacial-syndrome diagnosis, latent-space disentanglement by anatomical
region, surgical planning / assessment, and mesh fitting.

Layout:
  geometry/  offline mesh preprocessing (PLY/OBJ IO, regions, QEM, spirals)
  ops/       TPU compute primitives (Pallas spiral conv, pooling, SpMM)
  models/    functional (pytree) model definitions
  data/      dataset, on-device swap augmentation, spectral augmentation
  training/  losses, jitted train step, checkpointing
  parallel/  device meshes, sharded train step (DP over ICI)
  analysis/  classifiers (LDA/QDA/SVM/MLP), evaluation, planning, fitting
  viz/       host-side rendering and plotting
"""

__version__ = "0.1.0"
