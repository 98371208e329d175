from .augment import (augment_batch, norm_color_jitter,  # noqa: F401
                      pad_resize, pad_resize_pair, pad_to_biggest_image)
from .dataset import (BarkDataset, Record, decode_label,  # noqa: F401
                      load_image, load_image_u8, make_dataset,
                      save_image_u8)
from .sampling import (PrioritizedSampler, get_splits,  # noqa: F401
                       weighted_batch_iterator)
