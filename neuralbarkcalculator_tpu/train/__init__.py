from .checkpoint import (ExperimentCheckpoints, restore_variables,  # noqa: F401
                         save_variables)
from .evaluate import evaluation_report, generate_output_folders  # noqa: F401
from .loop import Experiment, compute_mean_std, compute_pos_weight  # noqa: F401
from .optim import (EarlyStopping, ReduceLROnPlateau, adam,  # noqa: F401
                    make_training_deterministic)
from .step import TrainState, make_eval_step, make_train_step  # noqa: F401
