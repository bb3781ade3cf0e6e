from legion_tpu.pipeline.schedule import Schedule, Mode

__all__ = ["Schedule", "Mode"]
