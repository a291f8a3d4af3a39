from brushstroke_engine_tpu.data.curves import (
    catmull_rom_spline, draw_stroke, random_spline_stroke,
)
from brushstroke_engine_tpu.data.curated_geometry import (
    curated_geometry_patch, curated_geometry_batch, CURATED_SHAPES,
    CURATED_RADII,
)
