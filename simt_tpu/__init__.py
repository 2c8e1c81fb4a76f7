"""simt_tpu — a TPU-native (JAX / XLA / Pallas / pjit) framework with the capabilities of
CityU-AIM-Group/SimT (CVPR 2022): domain-adaptive semantic segmentation under open-set
pseudo-label noise via a learnable simplex Noise Transition Matrix.

Built from scratch against the reference at /root/reference (see SURVEY.md for the
component inventory this implements).
"""

from . import config

__version__ = "0.1.0"
