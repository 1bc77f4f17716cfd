"""vln_hamt_tpu — a TPU-native Vision-and-Language Navigation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of HAMT
(History Aware Multimodal Transformer, NeurIPS 2021; reference:
cshizhe/VLN-HAMT). Idiomatic TPU design: fixed shapes, one jitted
episode step, `lax.scan` over time, data-parallel `jax.sharding`
meshes, and a vectorized host-side graph simulator.

Subpackages
-----------
- ``configs``   typed configuration tree + per-task presets
- ``data``      nav graphs, angle features, instructions, feature DBs
- ``env``       batched graph simulator + task environments
- ``eval``      trajectory metrics (SR/SPL/nDTW/SDTW/CLS)
- ``models``    flax HAMT model family (text/history/cross-modal/heads)
- ``ops``       Pallas TPU kernels and device-side numeric ops
- ``parallel``  meshes, shardings, multi-host collectives
- ``agents``    rollout + IL/A2C training
- ``pretrain``  proxy-task pretraining (MLM/MRC/ITM/SAP/SAR/SpRel)
- ``vision``    ViT-B/16 backbone + panorama featurizer
"""

__version__ = "0.1.0"
