from hupr_tpu.data.annot import generate_gt_annotations
from hupr_tpu.data.dataset import (
    HuPRDataset,
    BatchLoader,
    get_dataset,
    window_indices,
)
