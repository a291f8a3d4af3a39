from brushstroke_engine_tpu.models.layers import (
    fc_init, fc_apply, conv_layer_init, conv_layer_apply,
    normalize_2nd_moment,
)
from brushstroke_engine_tpu.models.mapping import MappingConfig, mapping_init, mapping_apply
from brushstroke_engine_tpu.models.synthesis import (
    SynthesisConfig, synthesis_init, synthesis_apply,
)
from brushstroke_engine_tpu.models.generator import (
    GeneratorConfig, generator_init, generator_apply, generator_trainable_mask,
)
from brushstroke_engine_tpu.models.discriminator import (
    DiscriminatorConfig, discriminator_init, discriminator_apply,
)
from brushstroke_engine_tpu.models.geo_encoder import (
    GeoEncoderConfig, geo_encoder_init, geo_encoder_encode, geo_encoder_apply,
)
