from .mesh import (DATA_AXIS, MODEL_AXIS, ShardingRules,  # noqa: F401
                   initialize_distributed, make_mesh, pad_to_multiple,
                   put_batch)
