from brushstroke_engine_tpu.engine.areas import Area, make_area, compute_overlaps
from brushstroke_engine_tpu.engine.brush import (
    GanBrushOptions, PaintEngineFactory, TriadGanPaintEngine,
    CanvasPaintEngine, MockPaintEngine,
)
from brushstroke_engine_tpu.engine.canvas import FeatureCanvas, PaintingHelper
from brushstroke_engine_tpu.engine.library import (
    BrushLibrary, WBrushLibrary, SeedBrushLibrary, RandomBrushLibrary,
)
from brushstroke_engine_tpu.engine.mapper import StyleUVSMapper
