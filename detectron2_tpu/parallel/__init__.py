from detectron2_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    replicate,
    replicated_sharding,
    shard_batch,
)
from detectron2_tpu.parallel.sharding import (
    apply_param_layout,
    infer_leaf_spec,
    shard_tree,
    tree_shardings,
)
from detectron2_tpu.parallel.train_state import TrainState, make_eval_step, make_train_step

__all__ = [k for k in globals().keys() if not k.startswith("_")]
