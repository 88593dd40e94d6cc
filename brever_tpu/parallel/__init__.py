from .mesh import get_mesh, make_data_parallel_step, shard_batch  # noqa: F401
from .tensor import (  # noqa: F401
    get_mesh_2d,
    infer_tp_specs,
    make_tp_step,
    make_tp_train_state,
    shard_batch_2d,
    shard_params,
)

__all__ = ['get_mesh', 'shard_batch', 'make_data_parallel_step',
           'get_mesh_2d', 'infer_tp_specs', 'shard_params',
           'shard_batch_2d', 'make_tp_train_state', 'make_tp_step']
