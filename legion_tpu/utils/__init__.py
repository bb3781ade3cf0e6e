from legion_tpu.utils.checkpoint import save_checkpoint, restore_checkpoint

__all__ = ["save_checkpoint", "restore_checkpoint"]
