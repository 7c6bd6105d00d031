"""jmodt_tpu — a TPU-native (JAX / XLA / Pallas) framework for joint
camera-LiDAR 3D multi-object detection and online tracking on KITTI, with the
capabilities of JMODT (IROS 2021).  See SURVEY.md for the reference layer map
this package rebuilds TPU-first."""

__version__ = '0.1.0'
