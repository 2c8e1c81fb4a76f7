from .eval_fused import multiscale_argmax_hist
