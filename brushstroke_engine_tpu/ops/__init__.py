from brushstroke_engine_tpu.ops.filters import setup_filter
from brushstroke_engine_tpu.ops.upfirdn import (
    upfirdn2d,
    filter2d,
    upsample2d,
    downsample2d,
)
from brushstroke_engine_tpu.ops.biasact import bias_act, activation_gain, ACTIVATIONS
from brushstroke_engine_tpu.ops.conv import conv2d_resample, modulated_conv2d
from brushstroke_engine_tpu.ops.noise import wrapped_const_noise
