from tinyfaces_tpu.ops.boxes import (  # noqa: F401
    jaccard_index,
    pairwise_iou,
    rect_dist,
)
from tinyfaces_tpu.ops.dense_overlap import compute_dense_overlap  # noqa: F401
from tinyfaces_tpu.ops.nms import nms  # noqa: F401
