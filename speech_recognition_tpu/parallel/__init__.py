from .expert import expert_parallel_moe, init_moe_params, moe_ffn
from .pipeline import gpipe, stack_params, stack_stage_fn
from .sequence import halo_exchange, time_sharded
from .mesh import (
    active_mesh,
    data_axis_size,
    fsdp_spec,
    get_active_mesh,
    get_device_mesh,
    get_num_devices,
    process_shard,
    set_active_mesh,
    shard_batch,
    shard_params,
)

__all__ = [
    "expert_parallel_moe",
    "init_moe_params",
    "moe_ffn",
    "gpipe",
    "halo_exchange",
    "time_sharded",
    "stack_params",
    "stack_stage_fn",
    "active_mesh",
    "data_axis_size",
    "fsdp_spec",
    "get_active_mesh",
    "get_device_mesh",
    "get_num_devices",
    "process_shard",
    "set_active_mesh",
    "shard_batch",
    "shard_params",
]
