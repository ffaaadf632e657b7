from .mesh import make_mesh, replicated, shard_batch  # noqa: F401
from .sharding import (param_shardings, shard_params,  # noqa: F401
                       sharded_init)
from .train_step import (PlateauState, TrainStepFns, make_optimizer,  # noqa
                         make_train_fns, plateau_init, plateau_update)
from .seq_shard import (seq_sharded_features,  # noqa: F401
                        seq_sharded_level0)
