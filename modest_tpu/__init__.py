"""modest_tpu: a TPU-native (JAX/XLA/Pallas) rebuild of the MODEST label-free
3D mobile-object detection pipeline (CVPR 2022).

Capability reference: YurongYou/MODEST (mounted read-only at /root/reference).
This is a ground-up re-design for TPU: batched static-shape JAX programs with
Pallas kernels where the reference uses C++/CUDA, data-parallel over a
`jax.sharding.Mesh` instead of NCCL DDP.
"""

__version__ = "0.1.0"
