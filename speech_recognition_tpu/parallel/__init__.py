from .mesh import get_device_mesh, get_num_devices, shard_batch, shard_params

__all__ = ["get_device_mesh", "get_num_devices", "shard_batch", "shard_params"]
