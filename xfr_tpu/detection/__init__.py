from xfr_tpu.detection.detector import FasterRCNN, im_detect  # noqa: F401
from xfr_tpu.detection.network import FasterRCNNNetwork  # noqa: F401
