from bbbp_tpu.utils.checkpoint import save_checkpoint, restore_checkpoint
