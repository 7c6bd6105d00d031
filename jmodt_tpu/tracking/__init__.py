"""Online multi-object tracking runtime."""

from jmodt_tpu.tracking.kalman import Kalman
from jmodt_tpu.tracking.track import Track
from jmodt_tpu.tracking.tracker import Tracker

__all__ = ['Kalman', 'Track', 'Tracker']
