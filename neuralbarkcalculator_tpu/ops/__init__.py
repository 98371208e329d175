from .ccl import (label_components, remove_small_holes,  # noqa: F401
                  remove_small_objects, remove_small_zones,
                  remove_small_zones_ragged)
from .losses import (jaccard_loss, lovasz_hinge_loss,  # noqa: F401
                     lovasz_softmax_loss, mixed_loss, stable_bce_loss,
                     weighted_cross_entropy)
from .metrics import (confusion_matrix, iou, iou_from_confusion,  # noqa: F401
                      miou, pixelwise_f1)
from .resize import (bicubic_upsample, bicubic_upsample_ragged,  # noqa: F401
                     embedded_bicubic_rows, spline_resize)
from .trim import trim_bounds, trim_bounds_batch  # noqa: F401
