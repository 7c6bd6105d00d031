"""Data pipelines: KITTI tracking dataset, converter, and synthetic data."""
