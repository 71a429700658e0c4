"""Model zoo. Importing this package registers all builders."""

from yolov7_d2_tpu.models import backbones, heads, meta_arch, necks  # noqa: F401
from yolov7_d2_tpu.models.build import build_model  # noqa: F401
