from .adapters import (
    init_lora,
    apply_lora,
    merge_lora,
    fold_weight_norm,
    partition_trainable,
    combine_params,
)
