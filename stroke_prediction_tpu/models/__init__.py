from stroke_prediction_tpu.models.unet3d import Unet3D, LargeUnet3D  # noqa: F401
from stroke_prediction_tpu.models.cae3d import (  # noqa: F401
    Enc3D, Enc3DStep, Enc3DCtp, Dec3D, Cae3D, Cae3DCtp,
)
