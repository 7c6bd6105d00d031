"""Pallas TPU kernels for the hottest point ops:

- `fps.py` — farthest point sampling, single-cloud + batched row-tiled
  lockstep variants (min-distance state pinned in VMEM)
- `three_nn.py` — fused 3-nearest-neighbor distance + top-3 (no HBM
  distance matrix)
- `grouped_gather_mlp.py` — fused neighbor gather (one-hot MXU matmul) +
  shared MLP + maxpool for the RCNN SA levels

Ball query stays XLA (`ops/grouping.py`): its matmul-identity distance +
2-D top_k form already runs near bandwidth-bound.  Every kernel has an
interpret-mode parity test against its XLA twin (tests/test_pallas_fps.py,
tests/test_fused_sa.py).
"""
