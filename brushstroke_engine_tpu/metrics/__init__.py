from brushstroke_engine_tpu.metrics.lpips import lpips_batched, LPIPSModel
from brushstroke_engine_tpu.metrics.color import (
    rgb2lab, compute_lab_metrics, srgb_to_linear,
)
