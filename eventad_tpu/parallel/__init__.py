from .mesh import make_mesh, shard_batch  # noqa: F401
from .train_step import (PlateauState, TrainStepFns, make_optimizer,  # noqa
                         make_train_fns, plateau_init, plateau_update)
