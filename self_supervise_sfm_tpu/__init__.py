"""self_supervise_sfm_tpu — a TPU-native self-supervised structure-from-motion framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
``ShngJZ/self-supervise-sfm`` (a self-supervised fine-tuning harness around
SAIL-Recon, a VGGT-style feed-forward SfM transformer).

Layer map (mirrors SURVEY.md §1, re-architected TPU-first):

- ``layers/``    transformer primitives (RoPE, attention, blocks, DINOv2 ViT)
- ``models/``    the alternating-attention aggregator trunk + SailRecon facade
- ``heads/``     camera / DPT depth / DPT point prediction heads
- ``ops/``       pure-jnp geometry, CDF loss, attention cores, Pallas kernels
- ``parallel/``  device mesh + sharding strategy
- ``data/``      IMC2021 HDF5 scene pipeline + synthetic fixtures
- ``train/``     self-supervised training loop, optimizer, checkpointing
- ``utils/``     PLY/KITTI export, torch-checkpoint converter, misc
"""

__version__ = "0.1.0"
