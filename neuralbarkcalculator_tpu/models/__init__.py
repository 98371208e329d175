from .convert import (load_torch_checkpoint,  # noqa: F401
                      torch_state_dict_to_variables)
from .segmentation import (MODEL_FACTORIES, SegmentationModel,  # noqa: F401
                           deeplabv3_resnet50, deeplabv3_resnet101,
                           fcn_resnet50, fcn_resnet101)
