from idealnerf_tpu.ckpt.manager import (
    CheckpointManager, partial_restore, finetune_surgery,
)
