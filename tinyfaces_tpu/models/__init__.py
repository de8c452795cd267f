from tinyfaces_tpu.models.detection import TinyFacesDetector, init_model  # noqa: F401
from tinyfaces_tpu.models.resnet import ResNetBackbone  # noqa: F401
