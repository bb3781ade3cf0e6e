from legion_tpu.pipeline.schedule import Schedule, Mode
from legion_tpu.pipeline.feed import SeedFeed

__all__ = ["Schedule", "Mode", "SeedFeed"]
