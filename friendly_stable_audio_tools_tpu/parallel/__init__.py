from .mesh import create_mesh, shard_batch, replicate, fsdp_shard_params
