from .interp import upsample_bilinear_align_corners, upsample_bilinear_half_pixel
from .losses import (
    cross_entropy_2d,
    entropy_loss,
    finite_or_zero,
    mse_sum,
    nll_from_probs_2d,
    placeholder_loss,
    volume_loss,
)
from .metrics import fast_hist, fast_hist_np, label_mapping, mean_iou, per_class_iu
from .schedules import poly_lr
