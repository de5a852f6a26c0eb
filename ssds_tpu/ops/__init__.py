"""Detection math primitives (the reference's L3 layer, rebuilt batched/vectorized).

Reference surface covered (see SURVEY.md §2.4):
- ``lib/utils/box_utils.py``      -> :mod:`ssds_tpu.ops.boxes`
- ``lib/layers/functions/prior_box.py`` -> :mod:`ssds_tpu.ops.anchors`
- ``box_utils.match`` + hard-negative mining -> :mod:`ssds_tpu.ops.matching`
- ``lib/layers/modules/multibox_loss.py`` -> :mod:`ssds_tpu.ops.losses`
- ``box_utils.nms``               -> :mod:`ssds_tpu.ops.nms`
- ``lib/layers/functions/detection.py`` -> :mod:`ssds_tpu.ops.postprocess`
"""

from ssds_tpu.ops.boxes import (
    point_form,
    center_size,
    intersect,
    jaccard,
    encode,
    decode,
    log_sum_exp,
)
from ssds_tpu.ops.anchors import AnchorConfig, generate_anchors, num_anchors_per_cell
from ssds_tpu.ops.matching import match
from ssds_tpu.ops.losses import multibox_loss
from ssds_tpu.ops.nms import greedy_nms, sorted_nms
from ssds_tpu.ops.postprocess import detect, detect_decoded
from ssds_tpu.ops.yolo import yolo_loss
