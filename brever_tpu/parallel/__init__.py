from .mesh import get_mesh, make_data_parallel_step, shard_batch  # noqa: F401

__all__ = ['get_mesh', 'shard_batch', 'make_data_parallel_step']
