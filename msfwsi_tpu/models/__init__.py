from . import resnet  # noqa: F401
from .backbone import MSFWSI, Predictor, Projector  # noqa: F401
from .hooknet import ContextUnet, HookNet, TargetUnet  # noqa: F401
from .resnet import ARCH_SPECS, ResNet, feature_dims, get_encoder  # noqa: F401
